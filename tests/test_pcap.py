"""pcap writer tests: libpcap container + MAC-NR context framing roundtrip."""

import struct

from srsran_project_tpu.support import pcap


def test_pcap_container_roundtrip(tmp_path):
    p = str(tmp_path / "t.pcap")
    with pcap.PcapWriter(p, dlt=pcap.DLT_USER_0) as w:
        w.write_packet(b"hello", ts=1000.5)
        w.write_packet(b"\x00" * 32, ts=1001.0)
    dlt, pkts = pcap.read_pcap(p)
    assert dlt == pcap.DLT_USER_0
    assert len(pkts) == 2
    assert pkts[0][1] == b"hello"
    assert abs(pkts[0][0] - 1000.5) < 1e-3
    assert len(pkts[1][1]) == 32


def test_global_header_fields(tmp_path):
    p = str(tmp_path / "h.pcap")
    with pcap.PcapWriter(p, dlt=149) as w:
        w.write_packet(b"x")
    raw = open(p, "rb").read()
    magic, vmaj, vmin, _, _, snaplen, dlt = struct.unpack_from("<IHHiIII", raw)
    assert (magic, vmaj, vmin, snaplen, dlt) == (0xA1B2C3D4, 2, 4, 65535, 149)


def test_mac_nr_framing_roundtrip(tmp_path):
    p = str(tmp_path / "mac.pcap")
    pdu = bytes(range(16))
    with pcap.MacNrPcapWriter(p) as w:
        w.write_pdu(pdu, rnti=0x4601, direction=pcap.DIRECTION_DOWNLINK,
                    harq_id=3, sfn=100, slot=7, ueid=1)
    dlt, pkts = pcap.read_pcap(p)
    assert dlt == pcap.DLT_USER_2
    ctx, got = pcap.parse_mac_nr_context(pkts[0][1])
    assert got == pdu
    assert ctx["rnti"] == 0x4601
    assert ctx["direction"] == pcap.DIRECTION_DOWNLINK
    assert ctx["harq_id"] == 3
    assert (ctx["sfn"], ctx["slot"]) == (100, 7)
    assert ctx["radio_type"] == pcap.TDD_RADIO
    assert ctx["rnti_type"] == pcap.C_RNTI


def test_mac_nr_minimal_context(tmp_path):
    p = str(tmp_path / "min.pcap")
    with pcap.MacNrPcapWriter(p, radio_type=pcap.FDD_RADIO) as w:
        w.write_pdu(b"\xab", rnti=17, direction=pcap.DIRECTION_UPLINK)
    _, pkts = pcap.read_pcap(p)
    ctx, got = pcap.parse_mac_nr_context(pkts[0][1])
    assert got == b"\xab" and ctx["rnti"] == 17
    assert "harq_id" not in ctx and "sfn" not in ctx


def test_write_after_close_raises(tmp_path):
    p = str(tmp_path / "c.pcap")
    w = pcap.PcapWriter(p)
    w.close()
    try:
        w.write_packet(b"x")
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_protocol_pcap_hooks(tmp_path):
    """Per-protocol dlt_pcap capture on the L3 message layer + GTP-U
    (reference: lib/pcap/dlt_pcap_impl.cpp DLTs 152-156)."""
    from srsran_project_tpu.l2 import gtpu
    from srsran_project_tpu.l3 import messages as m

    ngap_p = str(tmp_path / "ngap.pcap")
    f1ap_p = str(tmp_path / "f1ap.pcap")
    gtpu_p = str(tmp_path / "gtpu.pcap")
    wn = pcap.ngap_pcap(ngap_p)
    wf = pcap.f1ap_pcap(f1ap_p)
    wg = pcap.gtpu_pcap(gtpu_p)
    m.attach_pcap(m.PROTO_NGAP, wn)
    m.attach_pcap(m.PROTO_F1AP, wf, capture_rx=True)
    gtpu.attach_pcap(wg)
    try:
        frame_ng = m.encode(m.NgSetupRequest(gnb_id=1, plmn="00101", tac=7))
        frame_f1 = m.encode(m.F1SetupRequest(gnb_du_id=2, cells=[]))
        m.decode(frame_f1)  # rx capture doubles the F1AP frame
        m.decode(frame_ng)  # NGAP rx NOT captured (capture_rx default off)
        g = gtpu.encode_gpdu(teid=0x10, payload=b"ip-packet", qfi=1)
        gtpu.decode(g)
    finally:
        m.detach_pcap(m.PROTO_NGAP)
        m.detach_pcap(m.PROTO_F1AP)
        gtpu.detach_pcap()
        wn.close(); wf.close(); wg.close()

    dlt, pkts = pcap.read_pcap(ngap_p)
    assert dlt == pcap.PCAP_NGAP_DLT and len(pkts) == 1
    assert pkts[0][1] == frame_ng
    dlt, pkts = pcap.read_pcap(f1ap_p)
    assert dlt == pcap.PCAP_F1AP_DLT and len(pkts) == 2
    assert pkts[0][1] == frame_f1 == pkts[1][1]
    dlt, pkts = pcap.read_pcap(gtpu_p)
    assert dlt == pcap.PCAP_GTPU_DLT and len(pkts) == 1
    assert pkts[0][1] == g
