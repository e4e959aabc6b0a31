"""Control-plane attach choreography: AMF <-> CU-CP <-> (DU, CU-UP) <-> UE.

Runs the reference's UE attach procedure chain (SURVEY.md section 2.4
CU-CP/F1AP/E1AP/NGAP rows) over the typed-JSON transports: F1/NG setup,
RRC setup, security mode (real TS 33.501 key derivation + PDCP SRB1
protection), PDU session + bearer context establishment across E1/F1,
RRC reconfiguration, and release.
"""

from srsran_project_tpu.l2 import pdcp, security
from srsran_project_tpu.l3 import messages as m
from srsran_project_tpu.l3.cu_cp_sim import AmfSim, CuCpSim, CuUpE1Agent, DuF1Sim, make_srb_pdcp


class UeRrcAgent:
    """UE-side RRC responder; receives DL containers via the DU bridge."""

    def __init__(self, du: DuF1Sim, c_rnti: int, k_gnb_provider):
        self.du = du
        self.c_rnti = c_rnti
        self.k_gnb_provider = k_gnb_provider  # NAS-side key agreement stand-in
        self.du_ue_id = None
        self.srb1_pdcp = None
        self.state = "idle"
        self.drb_configs = []
        self.released = False

    def connect(self):
        self.du_ue_id = self.du.allocate_ue(self.deliver_dl)
        self.state = "connecting"
        self.du.initial_ul_rrc(self.du_ue_id, self.c_rnti,
                               m.encode(m.RrcSetupRequest(ue_identity=0x123456)))

    def _send(self, rrc_msg, srb_id=1):
        container = m.encode(rrc_msg)
        if self.srb1_pdcp is not None and srb_id == 1:
            container = self.srb1_pdcp.tx_sdu(container)
        self.du.ul_rrc(self.du_ue_id, srb_id, container)

    def deliver_dl(self, srb_id: int, container: bytes):
        if self.srb1_pdcp is not None and srb_id == 1:
            out = []
            self.srb1_pdcp.on_rx_sdu = out.append
            self.srb1_pdcp.rx_pdu(container)
            if not out:
                return  # integrity failure: discard silently
            container = out[0]
        rrc = m.decode(container)
        if isinstance(rrc, m.RrcSetup):
            self.state = "setup"
            self._send(m.RrcSetupComplete(selected_plmn="00101", nas_pdu="deadbeef"))
        elif isinstance(rrc, m.RrcSecurityModeCommand):
            # activate SRB1 protection first; the SecurityModeComplete itself
            # is already protected with the new keys (TS 38.331 5.3.4)
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


class FakeCuUp:
    """Bearer plumbing stub recording what E1 wired up."""

    def __init__(self, ue_id, keys, nea, nia):
        self.ue_id, self.keys, self.nea, self.nia = ue_id, keys, nea, nia
        self.pending_setup = None
        self.dl_teids = None

    def on_f1u_dl_teids(self, teids):
        self.dl_teids = teids


def build_network():
    amf = AmfSim()
    links = {}
    cucp = CuCpSim(send_to_amf=lambda b: amf.rx(b),
                   send_to_du=lambda b: links["du"].rx(b),
                   send_to_cuup=lambda b: links["e1"].rx(b))
    amf.send = cucp.rx_from_amf
    du = DuF1Sim(send_to_cucp=cucp.rx_from_du)
    cu_ups = []

    def make_cu_up(ue_id, keys, nea, nia):
        c = FakeCuUp(ue_id, keys, nea, nia)
        cu_ups.append(c)
        return c

    e1 = CuUpE1Agent(send_to_cucp=cucp.rx_from_cuup, make_cu_up=make_cu_up)
    links["du"], links["e1"] = du, e1
    return amf, cucp, du, e1, cu_ups


def test_full_attach_and_release():
    amf, cucp, du, e1, cu_ups = build_network()
    cucp.start()
    assert cucp.ng_ready
    du.setup(cells=[{"pci": 1, "nr_cgi": "00101-1", "dl_arfcn": 632628, "bandwidth_rb": 273}])
    assert du.f1_ready and cucp.f1_cells[0]["pci"] == 1

    # UE attach; the UE learns K_gNB via the NAS stand-in (same derivation
    # the AMF used: KDF(k_amf, 0x6E, ran_ue_id))
    ue = UeRrcAgent(du, c_rnti=0x4601,
                    k_gnb_provider=lambda: security.kdf(amf.k_amf, 0x6E, (1).to_bytes(4, "big")))
    ue.connect()

    assert ue.state == "connected"
    ctx = cucp.ues[1]
    assert ctx.state == "connected"
    assert amf.sessions_done == [1]
    # E1 wired the CU-UP with UP keys derived from the same K_gNB
    assert cu_ups and cu_ups[0].nea == 2
    k_gnb = security.kdf(amf.k_amf, 0x6E, (1).to_bytes(4, "big"))
    assert cu_ups[0].keys[0] == security.derive_algo_key(k_gnb, security.ALGO_TYPE_NUP_ENC, 2)
    # DU learned the F1-U UL TEID; CU-UP learned the DL TEID
    assert cu_ups[0].dl_teids[0]["f1u_dl_teid"] == 0x3000 + ue.du_ue_id
    assert ue.drb_configs[0]["drb_id"] == 1 and ue.drb_configs[0]["qfi"] == 9

    # release
    released = []
    du.on_ue_release = released.append
    cucp.release_ue(1)
    assert ue.released and released == [ue.du_ue_id]
    assert 1 not in cucp.ues


def test_srb1_protection_is_real():
    """Post-SMC RRC containers are PDCP-protected: tampering is discarded."""
    amf, cucp, du, e1, cu_ups = build_network()
    cucp.start()
    du.setup(cells=[{"pci": 1, "nr_cgi": "x", "dl_arfcn": 1, "bandwidth_rb": 52}])
    ue = UeRrcAgent(du, c_rnti=0x17,
                    k_gnb_provider=lambda: security.kdf(amf.k_amf, 0x6E, (1).to_bytes(4, "big")))
    ue.connect()
    assert ue.state == "connected"
    ctx = cucp.ues[1]
    # a forged DL container (wrong keys) must not reach the UE's RRC
    forged_engine = security.SecurityEngine(2, 2, bytes(16), bytes(16), bearer=1)
    forged = pdcp.PdcpEntity(pdcp.PdcpConfig(sn_bits=12, is_srb=True), forged_engine,
                             is_downlink_tx=True)
    # skip COUNTs already used by the CU so the SN is fresh
    forged.tx_next = ctx.srb1_pdcp.tx_next
    state_before = ue.state
    ue.deliver_dl(1, forged.tx_sdu(m.encode(m.RrcRelease())))
    assert ue.state == state_before and not ue.released
    assert ue.srb1_pdcp.rx_integrity_failures == 1
