"""PUCCH Format 0/1 conformance: grids synthesized per TS 38.211 and
decoded by the reference pucch_processor (tools/refgen/gen_pucch.cpp);
our detectors must reproduce the reference's UCI messages — payload bits,
SR flag, and detection/DTX decisions — on the same grids."""

import numpy as np
import pytest

from srsran_project_tpu.phy import pucch
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest


def _load_grid(suite, case, ports, subc):
    g = read_vector(suite_path(suite, f"grid{case['idx']}.dat"), "cf32")
    return g.reshape(ports, 14, subc)


def test_pucch_format0_golden():
    cases = load_suite("pucch_format0")
    assert len(cases) == 6
    for case in cases:
        subc = case["bwp_rb"] * 12
        grid = _load_grid("pucch_format0", case, case["ports"], subc)
        cfg = pucch.PucchFormat0Config(
            prb=case["prb"], start_symbol=case["start_sym"],
            nof_symbols=case["nof_syms"],
            initial_cyclic_shift=case["m0"], n_id=case["n_id"],
            slot_in_frame=case["slot_idx"],
            nof_harq_bits=case["nof_harq"],
            sr_opportunity=bool(case["sr_opportunity"]),
            second_hop_prb=(case["second_hop_prb"]
                            if case.get("second_hop_prb", -1) >= 0 else None),
            nof_grid_sc=subc)
        best, metric, _ = pucch.format0_detect(grid, cfg)
        valid = bool(metric >= pucch.F0_DTX_THRESHOLD)
        assert valid == bool(case["ref_valid"]), case
        if not valid:
            continue
        cands = pucch._f0_candidates(cfg)
        idx = int(best)
        sr = False
        if cfg.sr_opportunity and cfg.nof_harq_bits and idx >= len(cands) // 2:
            sr = True
            idx -= len(cands) // 2
        harq = idx if cfg.nof_harq_bits else 0
        if cfg.nof_harq_bits == 0:
            # SR-only: a valid detection IS the positive SR.
            sr = True
        assert harq == case["ref_harq"], case
        assert int(sr) == case["ref_sr"], case


def test_pucch_format1_golden():
    cases = load_suite("pucch_format1")
    assert len(cases) == 6
    for case in cases:
        subc = case["bwp_rb"] * 12
        grid = _load_grid("pucch_format1", case, case["ports"], subc)
        for iu in range(case["nof_ues"]):
            p = f"ue{iu}_"
            cfg = pucch.PucchFormat1Config(
                prb=case["prb"], start_symbol=case["start_sym"],
                nof_symbols=case["nof_syms"],
                initial_cyclic_shift=case[p + "m0"],
                occ_index=case[p + "occi"], n_id=case["n_id"],
                slot_in_frame=case["slot_idx"],
                nof_harq_bits=case[p + "nof_harq"],
                second_hop_prb=(case["second_hop_prb"]
                                if case.get("second_hop_prb", -1) >= 0 else None),
                nof_grid_sc=subc)
            bits, _, rho = pucch.format1_detect(grid, cfg)
            assert bool(rho >= pucch.F1_DTX_THRESHOLD) == bool(case[p + "ref_valid"]), case
            if case[p + "ref_valid"]:
                harq = sum(int(b) << i for i, b in enumerate(np.asarray(bits)))
                assert harq == case[p + "ref_harq"], (case, iu)


def test_pucch_format2_golden():
    from srsran_project_tpu.phy import pucch_f2

    cases = load_suite("pucch_format2")
    assert len(cases) == 7
    for case in cases:
        subc = case["bwp_rb"] * 12
        grid = _load_grid("pucch_format2", case, case["ports"], subc)
        payload = read_vector(suite_path("pucch_format2", f"payload{case['idx']}.dat"), "u8")
        ref_bits = read_vector(suite_path("pucch_format2", f"ref_bits{case['idx']}.dat"), "u8")
        nof_uci = case["nof_harq"] + case["nof_sr"] + case["nof_csi1"]
        cfg = pucch_f2.PucchFormat2Config(
            rb_start=case["prb"], rb_count=case["nof_prb"],
            start_symbol=case["start_sym"], nof_symbols=case["nof_syms"],
            nof_uci_bits=nof_uci, rnti=case["rnti"], n_id=case["n_id"],
            n_id0=case["n_id0"], slot_in_frame=case["slot_idx"],
            nof_rx_ports=case["ports"], nof_grid_sc=subc,
            second_hop_rb_start=(case["second_hop_prb"]
                                 if case.get("second_hop_prb", -1) >= 0 else None))
        bits, ok, snr_db = pucch_f2.process(grid, cfg)
        assert bool(ok) == bool(case["ref_valid"]), case
        got = np.asarray(bits)[:nof_uci]
        assert np.array_equal(got, ref_bits), (case, got, ref_bits)
        assert np.array_equal(got, payload), case


def test_pucch_format34_golden():
    from srsran_project_tpu.phy import pucch_f34

    cases = load_suite("pucch_format34")
    assert len(cases) == 10
    for case in cases:
        subc = case["bwp_rb"] * 12
        grid = _load_grid("pucch_format34", case, case["ports"], subc)
        payload = read_vector(suite_path("pucch_format34", f"payload{case['idx']}.dat"), "u8")
        ref_bits = read_vector(suite_path("pucch_format34", f"ref_bits{case['idx']}.dat"), "u8")
        nof_uci = case["nof_harq"] + case["nof_sr"] + case["nof_csi1"]
        cfg = pucch_f34.PucchFormat34Config(
            prb_start=case["prb"], nof_prb=case["nof_prb"],
            start_symbol=case["start_sym"], nof_symbols=case["nof_syms"],
            nof_uci_bits=nof_uci, rnti=case["rnti"], n_id=case["n_id"],
            occ_length=case["occ_length"], occ_index=case["occ_index"],
            slot_in_frame=case["slot_idx"], nof_rx_ports=case["ports"],
            nof_grid_sc=subc,
            second_hop_prb=(case["second_hop_prb"]
                            if case.get("second_hop_prb", -1) >= 0 else None),
            additional_dmrs=bool(case.get("additional_dmrs", 0)),
            pi2_bpsk=bool(case.get("pi2_bpsk", 0)))
        bits, ok, snr_db = pucch_f34.process(grid, cfg)
        assert bool(ok) == bool(case["ref_valid"]), case
        got = np.asarray(bits)[:nof_uci]
        assert np.array_equal(got, ref_bits), (case, got, ref_bits)
        assert np.array_equal(got, payload), case
