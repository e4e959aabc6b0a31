"""CU-UP <-> DU-high <-> UE split integration at the MAC-TB level.

Mirrors the reference's gnb wiring (SURVEY.md section 3.1: CU-UP and
DU connected by in-process F1-U connectors) without the PHY: DL IP packets
enter via NG-U GTP-U, traverse SDAP -> PDCP (ciphered+integrity) -> F1-U
NR-U -> RLC AM -> MAC TBs sized by the scheduler simulator, and are
terminated by a UE-side stack; UL runs the reverse path back out to GTP-U.
"""

import numpy as np

from srsran_project_tpu.l2 import (cu_up_sim, du_high_sim, gtpu, mac_pdu, nru,
                                   pdcp, rlc, sdap, security)
from srsran_project_tpu.l2sim.scheduler import SchedulerConfig


class UeSim:
    """UE-side stack: MAC decode -> RLC AM -> PDCP -> SDAP."""

    def __init__(self, rnti):
        self.rnti = rnti
        self.delivered = []  # DL IP packets
        self.ul_queue = []
        self.sdap = sdap.SdapEntity(sdap.SdapConfig(),
                                    on_rx_sdu=lambda qfi, s: self.delivered.append((qfi, s)))
        eng = security.SecurityEngine(2, 2, bytes(range(16)), bytes(range(16, 32)), bearer=1)
        self.pdcp = pdcp.PdcpEntity(pdcp.PdcpConfig(sn_bits=18), eng, is_downlink_tx=False,
                                    on_rx_sdu=lambda s: self.sdap.rx_pdu(s, downlink=True))
        self.rlc = rlc.RlcAmEntity(on_rx_sdu=self.pdcp.rx_pdu)
        self.sdap.map_flow(9, 1)

    def send_ul(self, ip_packet: bytes):
        _, sdap_pdu = self.sdap.tx_sdu(9, ip_packet, downlink=False)
        self.rlc.tx_sdu(self.pdcp.tx_sdu(sdap_pdu))

    def handle_dl_tb(self, tb_bits: np.ndarray):
        data = du_high_sim.bits_to_bytes(tb_bits)
        for sp in mac_pdu.decode_mac_pdu(data):
            if 1 <= sp.lcid <= mac_pdu.MAX_LCID:
                self.rlc.rx_pdu(sp.payload)

    def build_ul_tb(self, tbs_bits: int) -> np.ndarray:
        tb_size = tbs_bits // 8
        subs = [mac_pdu.MacSubPdu(int(mac_pdu.UlLcid.SHORT_BSR),
                                  mac_pdu.ce_short_bsr(0, mac_pdu.bsr_index_from_bytes(4000)))]
        budget = tb_size - 2  # BSR CE = 1 subheader + 1 payload byte
        while budget > 5:
            p = self.rlc.pull_pdu(budget - 3)
            if p is None:
                break
            subs.append(mac_pdu.MacSubPdu(lcid=4, payload=p))
            budget -= len(p) + (2 if len(p) < 256 else 3)
        return du_high_sim.bytes_to_bits(mac_pdu.encode_mac_pdu(subs, tb_size=tb_size, uplink=True), tbs_bits)


def test_du_cu_split_bidirectional():
    rng = np.random.default_rng(0)
    core_rx = []  # UL packets exiting at the core

    du = du_high_sim.DuHighSim(SchedulerConfig(nof_rb=52, max_ues_per_slot=1))
    cu = cu_up_sim.CuUpSim(ue_id=1, ngu_tx=core_rx.append)
    ue = UeSim(rnti=0x4601)

    # DU UE context: DL RLC SDUs come from F1-U; completed UL RLC SDUs go back
    du_ue = du.add_ue(0x4601, mcs=10, on_rx_sdu=lambda pdcp_pdu: cu.rx_f1u_ul(1, pdcp_pdu))
    dl_rlc = du_ue.bearers[4].entity

    def f1u_dl(frame: bytes):
        d = nru.decode_dl_user_data(frame)
        dl_rlc.tx_sdu(d.payload)

    cu.setup_bearer(drb_id=1, qfi=9, teid_dl=0x100, teid_ul=0x200, f1u_tx=f1u_dl)

    # core pushes DL packets; UE queues UL packets
    dl_packets = [bytes([i]) * int(rng.integers(40, 1200)) for i in range(12)]
    ul_packets = [bytes([0x80 | i]) * int(rng.integers(40, 900)) for i in range(8)]
    for p in dl_packets:
        cu.rx_ngu(gtpu.encode_gpdu(teid=0x100, payload=p, qfi=9))
    for p in ul_packets:
        ue.send_ul(p)

    # slot loop: fixed 8192-bit grants each way (the scheduler's tbs role)
    tbs = 8192
    for slot in range(200):
        ue.handle_dl_tb(du.build_dl_tb(0x4601, tbs))
        du.handle_ul_tb(0x4601, ue.build_ul_tb(tbs))
        du.exchange_am_status(0x4601, 4, ue.rlc)
        cu.tick(slot)
        ue.pdcp.tick(slot)
        if len(ue.delivered) == len(dl_packets) and len(core_rx) == len(ul_packets):
            break

    assert [s for _, s in ue.delivered] == dl_packets
    assert all(q == 9 for q, _ in ue.delivered)
    ul_out = [gtpu.decode(x) for x in core_rx]
    assert [p.payload for p in ul_out] == ul_packets
    assert all(p.teid == 0x200 and p.qfi == 9 and not p.pdu_session_dl for p in ul_out)
    assert du_ue.bsr_bytes > 0  # BSR CE was parsed


def test_du_cu_split_lossy_link():
    """Same chain with 20% TB loss each way: AM + PDCP restore everything."""
    rng = np.random.default_rng(1)
    core_rx = []
    du = du_high_sim.DuHighSim(SchedulerConfig(nof_rb=52, max_ues_per_slot=1))
    cu = cu_up_sim.CuUpSim(ue_id=1, ngu_tx=core_rx.append)
    ue = UeSim(rnti=0x17)
    du_ue = du.add_ue(0x17, on_rx_sdu=lambda pp: cu.rx_f1u_ul(1, pp))
    dl_rlc = du_ue.bearers[4].entity
    cu.setup_bearer(drb_id=1, qfi=9, teid_dl=1, teid_ul=2,
                    f1u_tx=lambda fr: dl_rlc.tx_sdu(nru.decode_dl_user_data(fr).payload))

    dl_packets = [bytes([i]) * 800 for i in range(10)]
    ul_packets = [bytes([0x40 | i]) * 500 for i in range(10)]
    for p in dl_packets:
        cu.rx_ngu(gtpu.encode_gpdu(teid=1, payload=p, qfi=9))
    for p in ul_packets:
        ue.send_ul(p)

    for slot in range(400):
        dl_tb = du.build_dl_tb(0x17, 4096)
        if rng.random() > 0.2:
            ue.handle_dl_tb(dl_tb)
        ul_tb = ue.build_ul_tb(4096)
        if rng.random() > 0.2:
            du.handle_ul_tb(0x17, ul_tb)
        du.exchange_am_status(0x17, 4, ue.rlc)
        cu.tick(slot)
        ue.pdcp.tick(slot)
        if len(ue.delivered) == len(dl_packets) and len(core_rx) == len(ul_packets):
            break

    assert [s for _, s in ue.delivered] == dl_packets  # PDCP in-order
    assert [gtpu.decode(x).payload for x in core_rx] == ul_packets
