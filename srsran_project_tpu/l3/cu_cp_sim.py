"""CU-CP / AMF / DU-F1 control-plane simulators.

Procedure-level counterpart of the reference's lib/cu_cp (ue_manager,
rrc_ue procedures, ngap client, f1ap CU side, e1ap CU-CP side) per
SURVEY.md section 2.4: the full UE attach choreography —

  DU: InitialUlRrcMessageTransfer(RrcSetupRequest)
  CU-CP: RrcSetup  ->  UE: RrcSetupComplete(NAS)
  CU-CP -> AMF: InitialUeMessage
  AMF: InitialContextSetupRequest(K_gNB)  ->  CU-CP: SecurityModeCommand
  UE: SecurityModeComplete  (SRB1 PDCP integrity+ciphering activates,
      keys derived per TS 33.501 A.8 from K_gNB)
  AMF: PduSessionResourceSetupRequest
  CU-CP -> CU-UP: E1 BearerContextSetup (keys, NEA/NIA, TEIDs)
  CU-CP -> DU:   F1 UeContextSetup (DRB + F1-U UL TEID)
  CU-CP -> CU-UP: E1 BearerContextModification (F1-U DL TEID from DU)
  CU-CP -> UE:   RrcReconfiguration(DRB)  ->  Complete
  CU-CP -> AMF:  PduSessionResourceSetupResponse

plus UE release.  Transport links are byte callables carrying the typed-
JSON framing (messages.py) — the SCTP role.  RRC containers between CU-CP
and the UE ride F1AP RRC message transfers; after security activation they
are protected by real PDCP SRB entities (12-bit SN) using the l2 security
engines.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

from ..l2 import pdcp, security
from . import messages as m


def _hex(b: bytes) -> str:
    return b.hex()


class AmfSim:
    """Minimal core: NG setup, auth-free attach, one PDU session per UE."""

    def __init__(self, send_to_cucp: Callable[[bytes], None] | None = None):
        self.send = send_to_cucp or (lambda b: None)
        self.next_amf_ue_id = 100
        self.ues: dict[int, dict] = {}
        self.k_amf = bytes(range(32))  # fixed test key material
        self.sessions_done: list[int] = []

    def rx(self, data: bytes) -> None:
        msg = m.decode(data)
        if isinstance(msg, m.NgSetupRequest):
            self.send(m.encode(m.NgSetupResponse(amf_name="amf-sim")))
        elif isinstance(msg, m.InitialUeMessage):
            amf_id = self.next_amf_ue_id
            self.next_amf_ue_id += 1
            self.ues[msg.ran_ue_id] = {"amf_ue_id": amf_id}
            k_gnb = security.kdf(self.k_amf, 0x6E, msg.ran_ue_id.to_bytes(4, "big"))
            self.send(m.encode(m.InitialContextSetupRequest(
                ran_ue_id=msg.ran_ue_id, amf_ue_id=amf_id, security_key=_hex(k_gnb),
                allowed_nea=[2, 1, 3], allowed_nia=[2, 1, 3])))
        elif isinstance(msg, m.InitialContextSetupResponse):
            self.send(m.encode(m.PduSessionResourceSetupRequest(
                ran_ue_id=msg.ran_ue_id, amf_ue_id=msg.amf_ue_id,
                sessions=[{"session_id": 1, "qfi": 9,
                           "ngu_ul_teid": 0x2000 + msg.ran_ue_id, "upf_addr": "upf"}])))
        elif isinstance(msg, m.PduSessionResourceSetupResponse):
            self.sessions_done.append(msg.ran_ue_id)


@dataclasses.dataclass
class _CuUeCtx:
    cu_ue_id: int
    du_ue_id: int
    c_rnti: int
    state: str = "idle"
    amf_ue_id: int | None = None
    k_gnb: bytes | None = None
    nea: int = 2
    nia: int = 2
    srb1_pdcp: pdcp.PdcpEntity | None = None
    cu_up_ue_id: int | None = None
    pending_sessions: list = dataclasses.field(default_factory=list)
    drbs: list = dataclasses.field(default_factory=list)
    du_id: int = 0
    ho_target: tuple[int, int] | None = None  # (target du_id, target du_ue_id)
    ho_pci: int = 0


def make_srb_pdcp(k_gnb: bytes, nea: int, nia: int, is_cu_side: bool,
                  on_rx_sdu=None) -> pdcp.PdcpEntity:
    """SRB1 PDCP with K_RRCenc/K_RRCint derived per TS 33.501 A.8."""
    k_enc = security.derive_algo_key(k_gnb, security.ALGO_TYPE_NRRC_ENC, nea)
    k_int = security.derive_algo_key(k_gnb, security.ALGO_TYPE_NRRC_INT, nia)
    eng = security.SecurityEngine(nea, nia, k_enc, k_int, bearer=1)  # SRB1
    return pdcp.PdcpEntity(pdcp.PdcpConfig(sn_bits=12, is_srb=True), eng,
                           is_downlink_tx=is_cu_side, on_rx_sdu=on_rx_sdu)


class CuCpSim:
    """CU-CP: UE manager + RRC + NGAP/F1AP/E1AP procedure driver."""

    def __init__(self, send_to_amf, send_to_du, send_to_cuup):
        self.to_amf = send_to_amf
        self.du_links: dict[int, object] = {0: send_to_du}  # du_id -> send fn
        self.to_cuup = send_to_cuup
        self.next_cu_ue_id = 1
        self.ues: dict[int, _CuUeCtx] = {}  # by cu_ue_id
        self._by_du_id: dict[tuple[int, int], _CuUeCtx] = {}  # (du_id, du_ue_id)
        self.ng_ready = False
        self.f1_cells: list = []
        # paging sink: cb(ue_paging_id) -> the DU cell scheduler's paging
        # queue (l2sim.common_scheduling.PagingScheduler.page)
        self.paging_sink = None
        # mobility (the reference's cell_meas_manager + mobility_manager):
        # pci -> (du_id, next target du_ue_id allocator); A3 hysteresis dB
        self.neighbor_cells: dict[int, tuple[int, object]] = {}
        self.a3_offset_db = 3.0

    def add_du(self, du_id: int, send_fn) -> None:
        """Register an additional DU F1 connection (multi-DU / handover)."""
        self.du_links[du_id] = send_fn

    def start(self, gnb_id: int = 411, plmn: str = "00101", tac: int = 7):
        self.to_amf(m.encode(m.NgSetupRequest(gnb_id=gnb_id, plmn=plmn, tac=tac)))

    # -- RRC container helpers ------------------------------------------------
    def _send_rrc(self, ctx: _CuUeCtx, rrc_msg, srb_id: int = 1, protect: bool = True) -> None:
        container = m.encode(rrc_msg)
        if protect and ctx.srb1_pdcp is not None and srb_id == 1:
            container = ctx.srb1_pdcp.tx_sdu(container)
        self.du_links[ctx.du_id](m.encode(m.DlRrcMessageTransfer(
            gnb_du_ue_id=ctx.du_ue_id, gnb_cu_ue_id=ctx.cu_ue_id,
            srb_id=srb_id, rrc_container=_hex(container))))

    def _rx_rrc(self, ctx: _CuUeCtx, srb_id: int, container: bytes):
        if ctx.srb1_pdcp is not None and srb_id == 1:
            out = []
            ctx.srb1_pdcp.on_rx_sdu = out.append
            ctx.srb1_pdcp.rx_pdu(container)
            if not out:
                return None  # integrity failure / reorder buffer
            container = out[0]
        return m.decode(container)

    # -- message entry points ---------------------------------------------------
    def rx_from_amf(self, data: bytes) -> None:
        msg = m.decode(data)
        if isinstance(msg, m.NgSetupResponse):
            self.ng_ready = True
        elif isinstance(msg, m.InitialContextSetupRequest):
            ctx = self.ues[msg.ran_ue_id]
            ctx.amf_ue_id = msg.amf_ue_id
            ctx.k_gnb = bytes.fromhex(msg.security_key)
            ctx.nea, ctx.nia = msg.allowed_nea[0], msg.allowed_nia[0]
            ctx.state = "security"
            # SRB1 protection activates with the SMC (TS 38.331 5.3.4): the
            # SMC itself goes unprotected here (deviation: spec integrity-
            # protects it), everything after — starting with the UE's
            # SecurityModeComplete — is PDCP integrity+ciphered.  Activate
            # before sending: the UE's protected reply arrives synchronously.
            ctx.srb1_pdcp = make_srb_pdcp(ctx.k_gnb, ctx.nea, ctx.nia, is_cu_side=True)
            self._send_rrc(ctx, m.RrcSecurityModeCommand(ciphering_algo=ctx.nea,
                                                         integrity_algo=ctx.nia), protect=False)
        elif isinstance(msg, m.Paging):
            if self.paging_sink is not None:
                self.paging_sink(msg.ue_paging_id)
        elif isinstance(msg, m.PduSessionResourceSetupRequest):
            ctx = self.ues[msg.ran_ue_id]
            ctx.pending_sessions = msg.sessions
            ctx.state = "bearer_setup"
            self.to_cuup(m.encode(m.BearerContextSetupRequest(
                gnb_cu_cp_ue_id=ctx.cu_ue_id, security_key=_hex(ctx.k_gnb),
                nea=ctx.nea, nia=ctx.nia,
                sessions=[{"session_id": s["session_id"], "qfi": s["qfi"],
                           "drb_id": 1, "pdcp_sn_bits": 18,
                           "ngu_ul_teid": s["ngu_ul_teid"]} for s in msg.sessions])))

    def rx_from_du(self, data: bytes, du_id: int = 0) -> None:
        msg = m.decode(data)
        if isinstance(msg, m.F1SetupRequest):
            self.f1_cells = msg.cells
            self.du_links[du_id](m.encode(m.F1SetupResponse(gnb_cu_name="cucp-sim",
                                                  cells_to_activate=[c["pci"] for c in msg.cells])))
        elif isinstance(msg, m.InitialUlRrcMessageTransfer):
            req = m.decode(bytes.fromhex(msg.rrc_container))
            if isinstance(req, m.RrcReestablishmentRequest):
                self.handle_reestablishment(du_id, msg.gnb_du_ue_id, req)
                return
            assert isinstance(req, m.RrcSetupRequest)
            ctx = _CuUeCtx(cu_ue_id=self.next_cu_ue_id, du_ue_id=msg.gnb_du_ue_id,
                           c_rnti=msg.c_rnti, state="setup", du_id=du_id)
            self.next_cu_ue_id += 1
            self.ues[ctx.cu_ue_id] = ctx
            self._by_du_id[(du_id, ctx.du_ue_id)] = ctx
            self._send_rrc(ctx, m.RrcSetup(rnti=msg.c_rnti,
                                           srb1_config={"rlc": "am", "lcid": 1}), srb_id=0)
        elif isinstance(msg, m.UlRrcMessageTransfer):
            ctx = self._by_du_id[(du_id, msg.gnb_du_ue_id)]
            rrc = self._rx_rrc(ctx, msg.srb_id, bytes.fromhex(msg.rrc_container))
            if rrc is None:
                return
            self._handle_ue_rrc(ctx, rrc)
        elif isinstance(msg, m.UeContextSetupResponse):
            ctx = self._by_du_id[(du_id, msg.gnb_du_ue_id)]
            if ctx.ho_target is not None:
                self._continue_handover(ctx, msg)
                return
            # learn DU F1-U DL TEIDs -> E1 bearer modification, then RRC reconfig
            self.to_cuup(m.encode(m.BearerContextModificationRequest(
                gnb_cu_up_ue_id=ctx.cu_up_ue_id,
                drb_f1u_dl_teids=msg.drbs_setup)))
            self._send_rrc(ctx, m.RrcReconfiguration(
                drb_configs=[{"drb_id": d["drb_id"], "qfi": s["qfi"],
                              "pdcp_sn_bits": 18, "rlc_mode": "am", "lcid": 4}
                             for d, s in zip(msg.drbs_setup, ctx.pending_sessions)]))
        elif isinstance(msg, m.UeContextReleaseComplete):
            ctx = self._by_du_id.pop((du_id, msg.gnb_du_ue_id), None)
            if ctx is not None and ctx.du_id == du_id and ctx.du_ue_id == msg.gnb_du_ue_id:
                self.ues.pop(ctx.cu_ue_id, None)

    def rx_from_cuup(self, data: bytes) -> None:
        msg = m.decode(data)
        if isinstance(msg, m.BearerContextSetupResponse):
            ctx = self.ues[msg.gnb_cu_cp_ue_id]
            ctx.cu_up_ue_id = msg.gnb_cu_up_ue_id
            ctx.drbs = msg.drbs
            self.du_links[ctx.du_id](m.encode(m.UeContextSetupRequest(
                gnb_cu_ue_id=ctx.cu_ue_id, gnb_du_ue_id=ctx.du_ue_id,
                srbs_to_setup=[{"srb_id": 2}],
                drbs_to_setup=[{"drb_id": d["drb_id"], "lcid": 4, "rlc_mode": "am",
                                "f1u_ul_teid": d["f1u_ul_teid"]} for d in msg.drbs])))

    def _handle_ue_rrc(self, ctx: _CuUeCtx, rrc) -> None:
        if isinstance(rrc, m.RrcSetupComplete):
            ctx.state = "registered"
            self.to_amf(m.encode(m.InitialUeMessage(
                ran_ue_id=ctx.cu_ue_id, nas_pdu=rrc.nas_pdu,
                establishment_cause="mo_data")))
        elif isinstance(rrc, m.RrcSecurityModeComplete):
            ctx.state = "secure"
            self.to_amf(m.encode(m.InitialContextSetupResponse(
                ran_ue_id=ctx.cu_ue_id, amf_ue_id=ctx.amf_ue_id)))
        elif isinstance(rrc, m.RrcReestablishmentComplete):
            ctx.state = "connected"
        elif isinstance(rrc, m.RrcMeasurementReport):
            self._handle_measurement_report(ctx, rrc)
        elif isinstance(rrc, m.RrcReconfigurationComplete):
            if ctx.ho_target is not None:
                self._finish_handover(ctx)
                return
            ctx.state = "connected"
            self.to_amf(m.encode(m.PduSessionResourceSetupResponse(
                ran_ue_id=ctx.cu_ue_id,
                sessions_setup=[{"session_id": s["session_id"],
                                 "ngu_dl_teid": 0x100 + ctx.cu_ue_id}
                                for s in ctx.pending_sessions])))

    def release_ue(self, cu_ue_id: int) -> None:
        ctx = self.ues[cu_ue_id]
        self._send_rrc(ctx, m.RrcRelease())
        self.du_links[ctx.du_id](m.encode(m.UeContextReleaseCommand(
            gnb_cu_ue_id=ctx.cu_ue_id, gnb_du_ue_id=ctx.du_ue_id)))


class DuF1Sim:
    """DU-side F1AP agent (lib/f1ap DU + du_manager role): bridges RRC
    containers to the UE and materializes UE contexts/bearers in the DU."""

    def __init__(self, send_to_cucp, gnb_du_id: int = 1):
        self.to_cucp = send_to_cucp
        self.gnb_du_id = gnb_du_id
        self.rrc_to_ue: dict[int, Callable[[int, bytes], None]] = {}  # du_ue_id -> cb(srb, container)
        self.on_ue_context_setup = None  # cb(UeContextSetupRequest) -> drbs_setup list
        self.on_ue_release = None
        self.f1_ready = False
        self.next_du_ue_id = 1

    def setup(self, cells: list) -> None:
        self.to_cucp(m.encode(m.F1SetupRequest(gnb_du_id=self.gnb_du_id, cells=cells)))

    def allocate_ue(self, deliver_dl: Callable[[int, bytes], None]) -> int:
        """Create the DU UE context (du_manager ue_creation role)."""
        du_ue_id = self.next_du_ue_id
        self.next_du_ue_id += 1
        self.rrc_to_ue[du_ue_id] = deliver_dl
        return du_ue_id

    def initial_ul_rrc(self, du_ue_id: int, c_rnti: int, rrc_container: bytes) -> None:
        self.to_cucp(m.encode(m.InitialUlRrcMessageTransfer(
            gnb_du_ue_id=du_ue_id, c_rnti=c_rnti, rrc_container=_hex(rrc_container))))

    def ul_rrc(self, du_ue_id: int, srb_id: int, container: bytes) -> None:
        self.to_cucp(m.encode(m.UlRrcMessageTransfer(
            gnb_du_ue_id=du_ue_id, gnb_cu_ue_id=0, srb_id=srb_id,
            rrc_container=_hex(container))))

    def rx(self, data: bytes) -> None:
        msg = m.decode(data)
        if isinstance(msg, m.F1SetupResponse):
            self.f1_ready = True
        elif isinstance(msg, m.DlRrcMessageTransfer):
            self.rrc_to_ue[msg.gnb_du_ue_id](msg.srb_id, bytes.fromhex(msg.rrc_container))
        elif isinstance(msg, m.UeContextSetupRequest):
            drbs_setup = self.on_ue_context_setup(msg) if self.on_ue_context_setup else \
                [{"drb_id": d["drb_id"], "f1u_dl_teid": 0x3000 + msg.gnb_du_ue_id}
                 for d in msg.drbs_to_setup]
            self.to_cucp(m.encode(m.UeContextSetupResponse(
                gnb_du_ue_id=msg.gnb_du_ue_id, drbs_setup=drbs_setup)))
        elif isinstance(msg, m.UeContextReleaseCommand):
            if self.on_ue_release:
                self.on_ue_release(msg.gnb_du_ue_id)
            self.rrc_to_ue.pop(msg.gnb_du_ue_id, None)
            self.to_cucp(m.encode(m.UeContextReleaseComplete(gnb_du_ue_id=msg.gnb_du_ue_id)))


class CuUpE1Agent:
    """CU-UP-side E1AP agent around cu_up_sim.CuUpSim bearer plumbing."""

    def __init__(self, send_to_cucp, make_cu_up):
        """make_cu_up(ue_id, keys, nea, nia) -> object with setup_bearer()."""
        self.to_cucp = send_to_cucp
        self.make_cu_up = make_cu_up
        self.next_ue_id = 1
        self.cu_ups: dict[int, object] = {}
        self.next_f1u_teid = 0x4000

    def rx(self, data: bytes) -> None:
        msg = m.decode(data)
        if isinstance(msg, m.E1SetupRequest):
            self.to_cucp(m.encode(m.E1SetupResponse(gnb_cu_cp_name="cucp-sim")))
        elif isinstance(msg, m.BearerContextSetupRequest):
            ue_id = self.next_ue_id
            self.next_ue_id += 1
            k_gnb = bytes.fromhex(msg.security_key)
            k_enc = security.derive_algo_key(k_gnb, security.ALGO_TYPE_NUP_ENC, msg.nea)
            k_int = security.derive_algo_key(k_gnb, security.ALGO_TYPE_NUP_INT, msg.nia)
            cu_up = self.make_cu_up(ue_id, (k_enc, k_int), msg.nea, msg.nia)
            self.cu_ups[ue_id] = cu_up
            drbs = []
            for s in msg.sessions:
                f1u_ul = self.next_f1u_teid
                self.next_f1u_teid += 1
                cu_up.pending_setup = (s, f1u_ul)  # finished when DL TEID arrives
                drbs.append({"drb_id": s["drb_id"], "f1u_ul_teid": f1u_ul,
                             "ngu_dl_teid": 0x100 + ue_id})
            self.to_cucp(m.encode(m.BearerContextSetupResponse(
                gnb_cu_cp_ue_id=msg.gnb_cu_cp_ue_id, gnb_cu_up_ue_id=ue_id, drbs=drbs)))
        elif isinstance(msg, m.BearerContextModificationRequest):
            cu_up = self.cu_ups[msg.gnb_cu_up_ue_id]
            if getattr(cu_up, "on_f1u_dl_teids", None):
                cu_up.on_f1u_dl_teids(msg.drb_f1u_dl_teids)
            self.to_cucp(m.encode(m.BearerContextModificationResponse(
                gnb_cu_up_ue_id=msg.gnb_cu_up_ue_id)))


# ---------------------------------------------------------------------------
# Mobility (the reference's cu_cp mobility manager + reestablishment routines)
# ---------------------------------------------------------------------------

def _cucp_start_handover(self: CuCpSim, cu_ue_id: int, target_du_id: int,
                         target_du_ue_id: int, target_pci: int = 2) -> None:
    """Inter-DU handover: UE context on the target, path switch, sync reconfig."""
    ctx = self.ues[cu_ue_id]
    ctx.ho_target = (target_du_id, target_du_ue_id)
    ctx.ho_pci = target_pci
    # bind the target (du, du_ue_id) now: the target's UeContextSetupResponse
    # and the UE's post-sync UL RRC both route by it
    self._by_du_id[(target_du_id, target_du_ue_id)] = ctx
    self.du_links[target_du_id](m.encode(m.UeContextSetupRequest(
        gnb_cu_ue_id=ctx.cu_ue_id, gnb_du_ue_id=target_du_ue_id,
        srbs_to_setup=[{"srb_id": 1}],
        drbs_to_setup=[{"drb_id": d["drb_id"], "lcid": 4, "rlc_mode": "am",
                        "f1u_ul_teid": d["f1u_ul_teid"]} for d in ctx.drbs])))


def _cucp_continue_handover(self: CuCpSim, ctx: _CuUeCtx, msg) -> None:
    """Target DU admitted the UE: switch the F1-U DL path at the CU-UP, then
    send reconfigurationWithSync via the source DU."""
    if ctx.cu_up_ue_id is not None:
        self.to_cuup(m.encode(m.BearerContextModificationRequest(
            gnb_cu_up_ue_id=ctx.cu_up_ue_id, drb_f1u_dl_teids=msg.drbs_setup)))
    # mark the state before sending: the UE's ReconfigurationComplete (and
    # with it _finish_handover) can arrive synchronously from _send_rrc
    ctx.state = "handover"
    self._send_rrc(ctx, m.RrcReconfiguration(
        drb_configs=[{"drb_id": d["drb_id"], "qfi": s.get("qfi", 9),
                      "pdcp_sn_bits": 18, "rlc_mode": "am", "lcid": 4}
                     for d, s in zip(msg.drbs_setup, ctx.pending_sessions or [{}] * len(msg.drbs_setup))],
        meas_config={"reconfiguration_with_sync": {"target_pci": ctx.ho_pci}}))


def _cucp_finish_handover(self: CuCpSim, ctx: _CuUeCtx) -> None:
    """ReconfigurationComplete arrived via the target: release the source."""
    src_du, src_due = ctx.du_id, ctx.du_ue_id
    t_du, t_due = ctx.ho_target
    ctx.du_id, ctx.du_ue_id = t_du, t_due
    ctx.ho_target = None
    ctx.state = "connected"
    self._by_du_id.pop((src_du, src_due), None)
    self.du_links[src_du](m.encode(m.UeContextReleaseCommand(
        gnb_cu_ue_id=ctx.cu_ue_id, gnb_du_ue_id=src_due)))


def _cucp_handle_reestablishment(self: CuCpSim, du_id: int, du_ue_id: int,
                                 req: m.RrcReestablishmentRequest) -> bool:
    """Re-anchor an existing UE context after radio link failure (TS 38.331
    5.3.7): rebind to the new DU UE context, restart SRB1 PDCP with the
    same keys (sim deviation: spec derives new keys via NCC), confirm with
    RrcReestablishment."""
    ctx = next((c for c in self.ues.values() if c.c_rnti == req.rnti), None)
    if ctx is None:
        return False
    self._by_du_id.pop((ctx.du_id, ctx.du_ue_id), None)
    ctx.du_id, ctx.du_ue_id = du_id, du_ue_id
    self._by_du_id[(du_id, du_ue_id)] = ctx
    ctx.srb1_pdcp = make_srb_pdcp(ctx.k_gnb, ctx.nea, ctx.nia, is_cu_side=True)
    ctx.state = "reestablishing"
    self._send_rrc(ctx, m.RrcReestablishment(), protect=False)
    return True


CuCpSim.start_handover = _cucp_start_handover
CuCpSim._continue_handover = _cucp_continue_handover
CuCpSim._finish_handover = _cucp_finish_handover
CuCpSim.handle_reestablishment = _cucp_handle_reestablishment


def _cucp_add_neighbor(self: CuCpSim, pci: int, du_id: int, allocate_target_ue) -> None:
    """Register a neighbor cell for measurement-driven mobility.

    allocate_target_ue() -> target gnb_du_ue_id on that DU (the du_manager
    ue-creation hook; in the sims this is DuF1Sim.allocate_ue bound to the
    UE's DL delivery callback)."""
    self.neighbor_cells[pci] = (du_id, allocate_target_ue)


def _cucp_handle_measurement_report(self: CuCpSim, ctx: _CuUeCtx, rep) -> None:
    """A3-style decision (cell_meas_manager role): hand over when a known
    neighbor beats the serving cell by the hysteresis offset."""
    if ctx.ho_target is not None or not rep.results:
        return
    serving = rep.results[0]
    best = max(rep.results[1:], key=lambda r: r["rsrp_dbm"], default=None)
    if best is None or best["rsrp_dbm"] < serving["rsrp_dbm"] + self.a3_offset_db:
        return
    target = self.neighbor_cells.get(best["pci"])
    if target is None or target[0] == ctx.du_id:
        return
    du_id, allocate = target
    self.start_handover(ctx.cu_ue_id, du_id, allocate(), target_pci=best["pci"])


CuCpSim.add_neighbor = _cucp_add_neighbor
CuCpSim._handle_measurement_report = _cucp_handle_measurement_report
