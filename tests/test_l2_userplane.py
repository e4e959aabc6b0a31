"""PDCP / SDAP / GTP-U / NR-U tests + full user-plane chain integration."""

import random

import pytest

from srsran_project_tpu.l2 import gtpu, mac_pdu, nru, pdcp, rlc, sdap, security


def make_engine(bearer=3, nea=2, nia=2):
    return security.SecurityEngine(nea, nia, bytes(range(16)), bytes(range(16, 32)), bearer=bearer)


# ---------------------------------------------------------------------------
# PDCP
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sn_bits,nea,nia", [(12, 1, 1), (18, 2, 2), (18, 3, 3), (12, 0, 2)])
def test_pdcp_roundtrip_ordered(sn_bits, nea, nia):
    got = []
    cfg = pdcp.PdcpConfig(sn_bits=sn_bits)
    tx = pdcp.PdcpEntity(cfg, make_engine(nea=nea, nia=nia), is_downlink_tx=True)
    rx = pdcp.PdcpEntity(cfg, make_engine(nea=nea, nia=nia), is_downlink_tx=False, on_rx_sdu=got.append)
    sdus = [bytes([i]) * (i + 1) for i in range(50)]
    for s in sdus:
        rx.rx_pdu(tx.tx_sdu(s))
    assert got == sdus
    assert rx.rx_integrity_failures == 0


def test_pdcp_reordering_window():
    got = []
    cfg = pdcp.PdcpConfig(sn_bits=12, t_reordering_slots=10)
    tx = pdcp.PdcpEntity(cfg, None, is_downlink_tx=True)
    rx = pdcp.PdcpEntity(cfg, None, is_downlink_tx=False, on_rx_sdu=got.append)
    pdus = [tx.tx_sdu(bytes([i])) for i in range(6)]
    # deliver 0,2,1 -> in-order delivery kicks in
    rx.rx_pdu(pdus[0])
    rx.rx_pdu(pdus[2])
    assert got == [bytes([0])]
    rx.rx_pdu(pdus[1])
    assert got == [bytes([0]), bytes([1]), bytes([2])]
    # lose 3, deliver 4,5; t-Reordering expiry flushes past the gap
    rx.rx_pdu(pdus[4])
    rx.rx_pdu(pdus[5])
    assert got == [bytes([0]), bytes([1]), bytes([2])]
    rx.tick(100)
    assert got == [bytes([i]) for i in [0, 1, 2, 4, 5]]


def test_pdcp_integrity_failure_drops():
    got = []
    cfg = pdcp.PdcpConfig(sn_bits=18)
    tx = pdcp.PdcpEntity(cfg, make_engine(), is_downlink_tx=True)
    rx = pdcp.PdcpEntity(cfg, make_engine(), is_downlink_tx=False, on_rx_sdu=got.append)
    p = bytearray(tx.tx_sdu(b"payload"))
    p[-1] ^= 0xFF  # corrupt ciphertext/MAC
    rx.rx_pdu(bytes(p))
    assert got == [] and rx.rx_integrity_failures == 1


def test_pdcp_hfn_rollover():
    """COUNT inference across the 12-bit SN wrap."""
    got = []
    cfg = pdcp.PdcpConfig(sn_bits=12, integrity=True)
    tx = pdcp.PdcpEntity(cfg, make_engine(), is_downlink_tx=True)
    rx = pdcp.PdcpEntity(cfg, make_engine(), is_downlink_tx=False, on_rx_sdu=got.append)
    n = 4096 + 100  # cross one HFN boundary
    for i in range(n):
        rx.rx_pdu(tx.tx_sdu(i.to_bytes(3, "big")))
    assert len(got) == n and got[-1] == (n - 1).to_bytes(3, "big")
    assert rx.rx_integrity_failures == 0  # keys keyed by COUNT stayed aligned


def test_pdcp_status_report():
    cfg = pdcp.PdcpConfig(sn_bits=12)
    tx = pdcp.PdcpEntity(cfg, None, is_downlink_tx=True)
    rx = pdcp.PdcpEntity(cfg, None, is_downlink_tx=False)
    pdus = [tx.tx_sdu(bytes([i])) for i in range(8)]
    for i in (0, 1, 3, 4, 7):
        rx.rx_pdu(pdus[i])
    fmc, missing = pdcp.decode_status_report(rx.build_status_report())
    assert fmc == 2 and missing == [2, 5, 6]


# ---------------------------------------------------------------------------
# SDAP / GTP-U / NR-U codecs
# ---------------------------------------------------------------------------


def test_sdap_mapping_and_headers():
    e = sdap.SdapEntity(sdap.SdapConfig())
    e.map_flow(qfi=9, drb=2)
    drb, pdu = e.tx_sdu(9, b"ip-packet", downlink=True)
    assert drb == 2 and pdu[0] & 0x3F == 9
    qfi, sdu = e.rx_pdu(pdu, downlink=True)
    assert qfi == 9 and sdu == b"ip-packet"
    # unmapped flow goes to the default DRB
    drb2, _ = e.tx_sdu(5, b"x")
    assert drb2 == 1


def test_gtpu_gpdu_roundtrip():
    raw = gtpu.encode_gpdu(teid=0x1234, payload=b"inner-ip", qfi=9)
    pdu = gtpu.decode(raw)
    assert pdu.msg_type == gtpu.MSG_GPDU and pdu.teid == 0x1234
    assert pdu.payload == b"inner-ip" and pdu.qfi == 9 and pdu.pdu_session_dl
    # without extension header
    raw2 = gtpu.encode_gpdu(teid=7, payload=b"z")
    pdu2 = gtpu.decode(raw2)
    assert pdu2.payload == b"z" and pdu2.qfi is None


def test_gtpu_demux_and_echo():
    seen = []
    responses = []
    d = gtpu.GtpuDemux()
    d.echo_responder = responses.append
    d.add_tunnel(42, seen.append)
    d.rx(gtpu.encode_gpdu(teid=42, payload=b"a"))
    d.rx(gtpu.encode_gpdu(teid=99, payload=b"b"))
    d.rx(gtpu.encode_echo_request(seq=5))
    assert len(seen) == 1 and seen[0].payload == b"a"
    assert d.unknown_teid_count == 1
    echo = gtpu.decode(responses[0])
    assert echo.msg_type == gtpu.MSG_ECHO_RESPONSE and echo.seq == 5


def test_nru_frames_roundtrip():
    d = nru.NruDlUserData(nru_sn=0x123456, payload=b"pdcp-pdu", report_polling=True)
    out = nru.decode_dl_user_data(nru.encode_dl_user_data(d))
    assert out == d
    s = nru.NruDlStatus(desired_buffer_size=1 << 20, highest_delivered_pdcp_sn=77,
                        highest_transmitted_pdcp_sn=99, lost_sn_ranges=((5, 9), (20, 21)))
    assert nru.decode_dl_status(nru.encode_dl_status(s)) == s


# ---------------------------------------------------------------------------
# Full user-plane chain: GTP-U -> SDAP -> PDCP -> RLC AM -> MAC -> (lossy
# link) -> MAC -> RLC -> PDCP -> SDAP, the reference's CU-UP + DU data path
# ---------------------------------------------------------------------------


def test_userplane_chain_end_to_end_lossy():
    rng = random.Random(3)
    delivered = []

    # --- receiving (UE-ish) side
    ue_sdap = sdap.SdapEntity(sdap.SdapConfig(), on_rx_sdu=lambda qfi, s: delivered.append((qfi, s)))
    ue_pdcp = pdcp.PdcpEntity(pdcp.PdcpConfig(sn_bits=18), make_engine(), is_downlink_tx=False,
                              on_rx_sdu=lambda s: ue_sdap.rx_pdu(s, downlink=True))
    ue_rlc = rlc.RlcAmEntity(sn_bits=12, on_rx_sdu=ue_pdcp.rx_pdu)

    # --- transmitting (gNB) side
    gnb_rlc = rlc.RlcAmEntity(sn_bits=12)
    gnb_pdcp = pdcp.PdcpEntity(pdcp.PdcpConfig(sn_bits=18), make_engine(), is_downlink_tx=True)
    gnb_sdap = sdap.SdapEntity(sdap.SdapConfig())
    gnb_sdap.map_flow(qfi=9, drb=1)

    # core network pushes IP packets through the GTP-U tunnel
    packets = [bytes([i % 256]) * rng.randrange(20, 1400) for i in range(20)]
    demux = gtpu.GtpuDemux()

    def tunnel_rx(gpdu):
        _, sdap_pdu = gnb_sdap.tx_sdu(gpdu.qfi, gpdu.payload, downlink=True)
        gnb_rlc.tx_sdu(gnb_pdcp.tx_sdu(sdap_pdu))

    demux.add_tunnel(0x1000, tunnel_rx)
    for p in packets:
        demux.rx(gtpu.encode_gpdu(teid=0x1000, payload=p, qfi=9))

    # MAC TBs over a lossy link with AM status exchange
    for _ in range(40):
        subpdus = []
        budget = 1500
        while budget > 10:
            p = gnb_rlc.pull_pdu(budget - 3)
            if p is None:
                break
            subpdus.append(mac_pdu.MacSubPdu(lcid=4, payload=p))
            budget -= len(p) + 3
        if subpdus:
            tb = mac_pdu.encode_mac_pdu(subpdus, tb_size=1500)
            if rng.random() > 0.15:  # 15% TB loss
                for sp in mac_pdu.decode_mac_pdu(tb):
                    if sp.lcid == 4:
                        ue_rlc.rx_pdu(sp.payload)
        gnb_rlc.rx_status(rlc.decode_status_pdu(ue_rlc.build_status(), 12))
        ue_pdcp.tick(_)
        if len(delivered) == len(packets):
            break

    assert [s for _, s in delivered] == packets  # PDCP restores order
    assert all(qfi == 9 for qfi, _ in delivered)
