"""Conformance of the lib/ran derived-parameter counterparts (TBS, MCS,
beta offsets, UL-SCH/DL-SCH info) against reference goldens — exact
integer equality."""

import pytest

from srsran_project_tpu.ran import sch_info, tbs as tbs_mod
from srsran_project_tpu.ran.ulsch_info import BETA_CSI, BETA_HARQ_ACK

from conftest import load_suite

pytestmark = pytest.mark.vectortest


def test_tbs_golden():
    cases = load_suite("ran_tbs")
    assert len(cases) > 10000
    for case in cases:
        got = tbs_mod.calculate_tbs(
            nof_prb=case["n_prb"],
            nof_symbols=case["nof_symb"],
            nof_dmrs_re_per_prb=case["dmrs_prb"],
            code_rate=case["rate1024"] / 1024.0,
            qm=case["qm"],
            nof_layers=case["layers"],
            overhead=case["oh"],
        )
        assert got == case["tbs"], case


def test_mcs_golden():
    cases = load_suite("ran_mcs")
    for case in cases:
        qm, rate = tbs_mod.mcs_to_qm_rate(
            case["mcs"], case["table"], transform_precoding=case["tp"] == 1, tp_pi2bpsk=False
        )
        assert qm == case["qm"], case
        assert abs(rate * 1024 - case["r1024"]) < 1e-3, case


def test_beta_offsets_golden():
    cases = load_suite("ran_beta")
    for case in cases:
        table = BETA_HARQ_ACK if case["kind"] == "harq_ack" else BETA_CSI
        assert abs(table[case["index"]] - case["value"]) < 1e-6, case


def test_ulsch_info_golden():
    cases = load_suite("ulsch_info")
    for case in cases:
        cfg = sch_info.UlschConfig(
            tbs=case["tbs"],
            qm=case["qm"],
            target_code_rate=case["rate1024"] / 1024.0,
            nof_harq_ack_bits=case["ack"],
            nof_csi_part1_bits=case["csi1"],
            nof_csi_part2_bits=case["csi2"],
            alpha_scaling=case["alpha"],
            beta_offset_harq_ack=case["beta_ack"],
            beta_offset_csi_part1=case["beta_csi1"],
            beta_offset_csi_part2=case["beta_csi2"],
            nof_rb=case["nof_rb"],
            start_symbol_index=case["start_sym"],
            nof_symbols=case["nof_symbols"],
            dmrs_type=case["dmrs_type"],
            dmrs_symbol_mask=case["dmrs_mask"],
            nof_cdm_groups_without_data=case["cdm_groups"],
            nof_layers=case["layers"],
            contains_dc=case["contains_dc"] == 1,
        )
        info = sch_info.get_ulsch_information(cfg)
        assert info.nof_ul_sch_bits == case["g_ulsch"], case
        assert info.nof_harq_ack_bits == case["g_ack"], case
        assert info.nof_harq_ack_rvd == case["g_ack_rvd"], case
        assert info.nof_csi_part1_bits == case["g_csi1"], case
        assert info.nof_csi_part2_bits == case["g_csi2"], case
        assert info.nof_harq_ack_re == case["q_ack"], case
        assert info.nof_csi_part1_re == case["q_csi1"], case
        assert info.nof_csi_part2_re == case["q_csi2"], case
        assert info.nof_dc_overlap_bits == case["dc_overlap_bits"], case
        if "sch_nof_cb" in case:
            assert info.sch is not None
            assert info.sch.nof_cb == case["sch_nof_cb"], case
            assert info.sch.nof_bits_per_cb == case["sch_bits_per_cb"], case
            assert info.sch.nof_filler_bits_per_cb == case["sch_filler_per_cb"], case


def test_dlsch_info_golden():
    cases = load_suite("dlsch_info")
    for case in cases:
        cfg = sch_info.DlschConfig(
            tbs=case["tbs"],
            qm=case["qm"],
            target_code_rate=case["rate1024"] / 1024.0,
            nof_rb=case["nof_rb"],
            start_symbol_index=case["start_sym"],
            nof_symbols=case["nof_symbols"],
            dmrs_type=1,
            dmrs_symbol_mask=case["dmrs_mask"],
            nof_cdm_groups_without_data=case["cdm_groups"],
            nof_layers=case["layers"],
        )
        sch, g = sch_info.get_dlsch_information(cfg)
        assert g == case["g_dlsch"], case
        assert sch.nof_cb == case["sch_nof_cb"], case
        assert sch.nof_bits_per_cb == case["sch_bits_per_cb"], case
        assert sch.nof_filler_bits_per_cb == case["sch_filler_per_cb"], case
