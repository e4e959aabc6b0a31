"""CSI report conformance: sizing, part-2 correspondence, and PUSCH/PUCCH
unpacking against the reference csi_report helpers (lib/ran/csi_report/)
across codebooks x quantities x RI restrictions."""

import numpy as np
import pytest

from srsran_project_tpu.ran import csi
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest

_QUANT = {0: "cri_ri_pmi_cqi", 1: "cri_ri_cqi", 2: "cri_ri_li_pmi_cqi"}


def _cfg(case) -> csi.CsiReportConfig:
    return csi.CsiReportConfig(
        nof_csi_rs_ports=case["nof_ports"],
        nof_csi_rs_resources=case["nof_resources"],
        ri_restriction=case["ri_mask"],
        quantities=_QUANT[case["quantities"]],
    )


def test_csi_report_sizes_golden():
    cases = load_suite("csi_report")
    assert len(cases) >= 150
    for case in cases:
        cfg = _cfg(case)
        assert csi.part1_bitwidth(cfg) == case["part1_size"], case
        lo, hi = csi.part2_min_max(cfg)
        assert (lo, hi) == (case["part2_min"], case["part2_max"]), case
        assert csi.pucch_bitwidth(cfg) == case["pucch_size"], case
        corr = csi.part2_correspondence(cfg)
        if case["corr_offset"] < 0:
            assert corr is None, case
        else:
            off, width, sizes = corr
            assert off == case["corr_offset"] and width == case["corr_width"], case
            ref_map = tuple(int(v) for v in case["corr_map"].split(","))
            assert sizes == ref_map, case


def test_csi_report_unpack_pusch_golden():
    for case in load_suite("csi_report"):
        cfg = _cfg(case)
        p1 = read_vector(suite_path("csi_report", f"p1_{case['idx']}.dat"), "u8")
        p2 = read_vector(suite_path("csi_report", f"p2_{case['idx']}.dat"), "u8")
        assert csi.part2_size_from_part1(cfg, p1) == case["part2_size"], case
        cri, ri, cqi = csi.unpack_part1(cfg, p1)
        assert (cri, ri, cqi) == (case["cri"], case["ri"], case["cqi1"]), case
        fields = csi.unpack_part2(cfg, ri, p2)
        # Reference skips part-2 unpacking entirely for an empty payload
        # (csi_report_on_pusch_helpers.cpp "Skip CSI Part 2 unpacking").
        if cfg.has_li and len(p2):
            assert fields.get("li") == case["li"], case
        if case["pmi2p"] >= 0:
            assert fields.get("pmi") == case["pmi2p"], case
        if case["i11"] >= 0:
            assert fields.get("i11") == case["i11"], case
            assert fields.get("i13", -1) == case["i13"], case
            assert fields.get("i2") == case["i2"], case
        # Round-trip: repacking the unpacked fields reproduces the payload.
        np.testing.assert_array_equal(
            csi.pack_part1(cfg, cri, ri, cqi), p1, err_msg=str(case))
        np.testing.assert_array_equal(
            csi.pack_part2(cfg, ri, **fields), p2, err_msg=str(case))


def test_csi_report_unpack_pucch_golden():
    for case in load_suite("csi_report"):
        cfg = _cfg(case)
        pu = read_vector(suite_path("csi_report", f"pu_{case['idx']}.dat"), "u8")
        cri, ri, li, pmi, cqi = csi.unpack_pucch(cfg, pu)
        assert (cri, ri, cqi) == (case["u_cri"], case["u_ri"], case["u_cqi1"]), case
        if cfg.has_li and cfg.nof_csi_rs_ports > 1:
            assert li == case["u_li"], case
        if case["u_pmi2p"] >= 0:
            assert pmi.get("pmi") == case["u_pmi2p"], case
        if case["u_i11"] >= 0:
            assert pmi.get("i11") == case["u_i11"], case
            assert pmi.get("i13", -1) == case["u_i13"], case
            assert pmi.get("i2") == case["u_i2"], case
