"""Mobility procedures: inter-DU handover and RRC reestablishment.

Counterpart of the reference's cu_cp mobility manager + reestablishment
procedures (SURVEY.md section 2.4 "CU-CP": mobility manager row) and the
e2e handover.py test (section 4 tier 4).
"""

from srsran_project_tpu.l2 import security
from srsran_project_tpu.l3 import messages as m
from srsran_project_tpu.l3.cu_cp_sim import AmfSim, CuCpSim, CuUpE1Agent, DuF1Sim, make_srb_pdcp

from test_l3_attach import FakeCuUp, UeRrcAgent


class HoUeAgent(UeRrcAgent):
    """UE that executes reconfigurationWithSync by switching DUs before
    replying (the RACH-to-target step, abstracted)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.ho_switch = None  # (target DuF1Sim, target du_ue_id)
        self.sync_pcis = []

    def deliver_dl(self, srb_id: int, container: bytes):
        if self.srb1_pdcp is not None and srb_id == 1:
            out = []
            self.srb1_pdcp.on_rx_sdu = out.append
            self.srb1_pdcp.rx_pdu(container)
            if not out:
                return
            container = out[0]
        rrc = m.decode(container)
        if isinstance(rrc, m.RrcReconfiguration) and rrc.meas_config \
                and "reconfiguration_with_sync" in rrc.meas_config:
            self.sync_pcis.append(rrc.meas_config["reconfiguration_with_sync"]["target_pci"])
            if self.ho_switch is not None:
                self.du, self.du_ue_id = self.ho_switch  # "RACH on target"
                self.ho_switch = None
            self.state = "connected"
            self._send(m.RrcReconfigurationComplete())
            return
        if isinstance(rrc, m.RrcReestablishment):
            # restart SRB1 PDCP with the same keys (mirrors the CU side)
            self.srb1_pdcp = make_srb_pdcp(self.k_gnb_provider(), self.last_nea,
                                           self.last_nia, is_cu_side=False)
            self.state = "reestablished"
            self._send(m.RrcReestablishmentComplete())
            return
        if isinstance(rrc, m.RrcSecurityModeCommand):
            self.last_nea, self.last_nia = rrc.ciphering_algo, rrc.integrity_algo
        # fall through to the base handlers (re-encode the plain container)
        super_container = container
        self._dispatch_base(srb_id, super_container)

    def _dispatch_base(self, srb_id, container):
        # replicate base handling without re-running PDCP
        rrc = m.decode(container)
        if isinstance(rrc, m.RrcSetup):
            self.state = "setup"
            self._send(m.RrcSetupComplete(selected_plmn="00101", nas_pdu="deadbeef"))
        elif isinstance(rrc, m.RrcSecurityModeCommand):
            self.srb1_pdcp = make_srb_pdcp(self.k_gnb_provider(), rrc.ciphering_algo,
                                           rrc.integrity_algo, is_cu_side=False)
            self.state = "secure"
            self._send(m.RrcSecurityModeComplete())
        elif isinstance(rrc, m.RrcReconfiguration):
            self.drb_configs = rrc.drb_configs
            self.state = "connected"
            self._send(m.RrcReconfigurationComplete())
        elif isinstance(rrc, m.RrcRelease):
            self.released = True
            self.state = "idle"


def build_two_du_network():
    amf = AmfSim()
    links = {}
    cucp = CuCpSim(send_to_amf=lambda b: amf.rx(b),
                   send_to_du=lambda b: links["du0"].rx(b),
                   send_to_cuup=lambda b: links["e1"].rx(b))
    amf.send = cucp.rx_from_amf
    du0 = DuF1Sim(send_to_cucp=lambda b: cucp.rx_from_du(b, du_id=0), gnb_du_id=1)
    du1 = DuF1Sim(send_to_cucp=lambda b: cucp.rx_from_du(b, du_id=1), gnb_du_id=2)
    cucp.add_du(1, lambda b: du1.rx(b))
    cu_ups = []

    def make_cu_up(ue_id, keys, nea, nia):
        c = FakeCuUp(ue_id, keys, nea, nia)
        cu_ups.append(c)
        return c

    e1 = CuUpE1Agent(send_to_cucp=cucp.rx_from_cuup, make_cu_up=make_cu_up)
    links["du0"], links["e1"] = du0, e1
    return amf, cucp, du0, du1, e1, cu_ups


def _attach(amf, cucp, du0):
    cucp.start()
    du0.setup(cells=[{"pci": 1, "nr_cgi": "00101-1", "dl_arfcn": 632628, "bandwidth_rb": 273}])
    ue = HoUeAgent(du0, c_rnti=0x4601,
                   k_gnb_provider=lambda: security.kdf(amf.k_amf, 0x6E, (1).to_bytes(4, "big")))
    ue.connect()
    assert ue.state == "connected" and cucp.ues[1].state == "connected"
    return ue


def test_inter_du_handover():
    amf, cucp, du0, du1, e1, cu_ups = build_two_du_network()
    ue = _attach(amf, cucp, du0)
    released_on_source = []
    du0.on_ue_release = released_on_source.append
    src_du_ue_id = ue.du_ue_id

    # prepare the target context and execute the handover
    t_id = du1.allocate_ue(ue.deliver_dl)
    ue.ho_switch = (du1, t_id)
    cucp.start_handover(cu_ue_id=1, target_du_id=1, target_du_ue_id=t_id, target_pci=2)

    ctx = cucp.ues[1]
    assert ctx.state == "connected" and ctx.du_id == 1 and ctx.du_ue_id == t_id
    assert ue.sync_pcis == [2]  # UE saw reconfigurationWithSync to PCI 2
    assert released_on_source == [src_du_ue_id]  # source context released
    # CU-UP path-switched to the target DU's F1-U DL TEID
    assert cu_ups[0].dl_teids[0]["f1u_dl_teid"] == 0x3000 + t_id
    # post-HO RRC still flows (release reaches the UE through the target DU)
    cucp.release_ue(1)
    assert ue.released


def test_rrc_reestablishment_after_rlf():
    amf, cucp, du0, du1, e1, cu_ups = build_two_du_network()
    ue = _attach(amf, cucp, du0)
    ue.last_nea, ue.last_nia = 2, 2
    # radio link failure: UE shows up on DU1 with a reestablishment request
    new_id = du1.allocate_ue(ue.deliver_dl)
    ue.du, ue.du_ue_id = du1, new_id
    ue.srb1_pdcp = None  # RLF suspends SRB1; re-established with the procedure
    du1.initial_ul_rrc(new_id, 0x4601,
                       m.encode(m.RrcReestablishmentRequest(rnti=0x4601, cause="rlf")))
    ctx = cucp.ues[1]
    assert ue.state == "connected" or ctx.state == "connected"
    assert ctx.du_id == 1 and ctx.du_ue_id == new_id
    # protected RRC works after reestablishment (fresh PDCP both sides)
    cucp.release_ue(1)
    assert ue.released


def test_reestablishment_unknown_rnti_rejected():
    amf, cucp, du0, du1, e1, cu_ups = build_two_du_network()
    _attach(amf, cucp, du0)
    ok = cucp.handle_reestablishment(1, 99, m.RrcReestablishmentRequest(rnti=0xDEAD))
    assert not ok


def test_measurement_report_triggers_a3_handover():
    """UE measurement report (neighbor > serving + 3 dB) drives the HO."""
    amf, cucp, du0, du1, e1, cu_ups = build_two_du_network()
    ue = _attach(amf, cucp, du0)
    released = []
    du0.on_ue_release = released.append

    cucp.add_neighbor(pci=2, du_id=1,
                      allocate_target_ue=lambda: du1.allocate_ue(ue.deliver_dl))
    # weak neighbor: no HO
    ue.ho_switch = None
    ue._send(m.RrcMeasurementReport(results=[{"pci": 1, "rsrp_dbm": -80.0},
                                             {"pci": 2, "rsrp_dbm": -82.0}]))
    assert cucp.ues[1].du_id == 0 and not released

    # strong neighbor: A3 fires, UE executes the sync reconfig to DU1
    ue.ho_switch = "pending"  # set by the allocator call below

    def alloc():
        t_id = du1.allocate_ue(ue.deliver_dl)
        ue.ho_switch = (du1, t_id)
        return t_id

    cucp.neighbor_cells[2] = (1, alloc)
    ue._send(m.RrcMeasurementReport(results=[{"pci": 1, "rsrp_dbm": -85.0},
                                             {"pci": 2, "rsrp_dbm": -78.0}]))
    ctx = cucp.ues[1]
    assert ctx.state == "connected" and ctx.du_id == 1
    assert ue.sync_pcis[-1] == 2 and released
