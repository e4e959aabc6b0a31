"""CSI report sizing and packing."""

import numpy as np

from srsran_project_tpu.ran import csi


def test_bitwidths():
    cfg = csi.CsiReportConfig(nof_csi_rs_ports=4, nof_csi_rs_resources=2)
    assert csi.cri_bitwidth(cfg) == 1
    assert csi.ri_bitwidth(cfg) == 2
    assert csi.part1_bitwidth(cfg) == 1 + 2 + 4
    assert csi.pmi_bitwidth(cfg, 1) == 5
    assert csi.pmi_bitwidth(cfg, 4) == 4
    cfg2 = csi.CsiReportConfig(nof_csi_rs_ports=2, ri_restriction=0b11)
    assert csi.pmi_bitwidth(cfg2, 1) == 2
    assert csi.pmi_bitwidth(cfg2, 2) == 1


def test_pack_unpack_roundtrip():
    cfg = csi.CsiReportConfig(nof_csi_rs_ports=4, nof_csi_rs_resources=2)
    bits = csi.pack_part1(cfg, cri=1, ri=3, cqi=11)
    assert bits.shape == (csi.part1_bitwidth(cfg),)
    assert csi.unpack_part1(cfg, bits) == (1, 3, 11)
    p2 = csi.pack_part2(cfg, rank=2, i11=0b101, i13=1, i2=0)
    got = csi.unpack_part2(cfg, 2, p2)
    assert (got["i11"], got["i13"], got["i2"]) == (0b101, 1, 0)


def test_ri_restriction_mapping():
    # Non-contiguous restriction: field values {0,1} map to ranks {2,4}.
    cfg = csi.CsiReportConfig(nof_csi_rs_ports=4, ri_restriction=0b1010)
    assert cfg.allowed_ranks == (2, 4)
    assert csi.ri_bitwidth(cfg) == 1
    bits = csi.pack_part1(cfg, cri=0, ri=4, cqi=3)
    assert csi.unpack_part1(cfg, bits) == (0, 4, 3)


def test_part1_feeds_uci_codec():
    from srsran_project_tpu.ops import uci

    cfg = csi.CsiReportConfig(nof_csi_rs_ports=4)
    bits = csi.pack_part1(cfg, cri=0, ri=2, cqi=7)
    coded = np.asarray(uci.encode_uci(bits, 64))
    llr = np.where(coded == 0, 8.0, -8.0).astype(np.float32)
    got, ok = uci.decode_uci(llr, len(bits))
    np.testing.assert_array_equal(np.asarray(got), bits)
    assert csi.unpack_part1(cfg, np.asarray(got)) == (0, 2, 7)


def test_part2_size_from_part1():
    cfg = csi.CsiReportConfig(nof_csi_rs_ports=4)
    p1 = csi.pack_part1(cfg, cri=0, ri=1, cqi=5)
    assert csi.part2_size_from_part1(cfg, p1) == csi.pmi_bitwidth(cfg, 1)
    p1 = csi.pack_part1(cfg, cri=0, ri=4, cqi=5)
    assert csi.part2_size_from_part1(cfg, p1) == csi.pmi_bitwidth(cfg, 4)
