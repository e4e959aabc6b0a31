"""PUCCH format 0/1 generate -> channel -> detect loopbacks."""

import numpy as np
import pytest

from srsran_project_tpu.phy import pucch


def _grid(nports=1, nsym=14, nsc=624):
    return np.zeros((nports, nsym, nsc), dtype=np.complex64)


@pytest.mark.parametrize("nof_bits,value", [(1, 0), (1, 1), (2, 0), (2, 1), (2, 2), (2, 3)])
def test_format0_detect(nof_bits, value):
    cfg = pucch.PucchFormat0Config(
        prb=3, start_symbol=12, nof_symbols=2, initial_cyclic_shift=4,
        n_id=17, slot_in_frame=5, nof_harq_bits=nof_bits,
    )
    sig = pucch.format0_generate(cfg, value)
    grid = _grid()
    grid[0, 12:14, 3 * 12 : 4 * 12] = sig * 0.7 * np.exp(1j * 0.3)
    rng = np.random.default_rng(value)
    grid += (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)).astype(
        np.complex64
    ) * 0.02
    best, metric, powers = pucch.format0_detect(grid, cfg)
    assert int(best) == value
    assert float(metric) > 0.5


@pytest.mark.parametrize("nof_bits,bits", [(1, [0]), (1, [1]), (2, [0, 1]), (2, [1, 1])])
def test_format1_detect(nof_bits, bits):
    cfg = pucch.PucchFormat1Config(
        prb=5, start_symbol=0, nof_symbols=14, initial_cyclic_shift=3,
        occ_index=2, n_id=42, slot_in_frame=7, nof_harq_bits=nof_bits,
    )
    sig = pucch.format1_generate(cfg, np.asarray(bits, np.uint8))
    grid = _grid(nports=2)
    ch = np.array([0.9 * np.exp(1j * 1.1), 0.5 * np.exp(-1j * 0.4)], np.complex64)
    for p in range(2):
        grid[p, 0:14, 5 * 12 : 6 * 12] = ch[p] * sig
    rng = np.random.default_rng(sum(bits) + nof_bits)
    grid += (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)).astype(
        np.complex64
    ) * 0.05
    got, llrs, metric = pucch.format1_detect(grid, cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(bits, np.uint8))


def test_format1_occ_separation():
    # Two UEs on the same PRB with different OCC indices must both detect.
    bits_a, bits_b = [1], [0]
    cfg_a = pucch.PucchFormat1Config(
        prb=0, start_symbol=0, nof_symbols=14, initial_cyclic_shift=0,
        occ_index=0, n_id=1, nof_harq_bits=1,
    )
    cfg_b = pucch.PucchFormat1Config(
        prb=0, start_symbol=0, nof_symbols=14, initial_cyclic_shift=0,
        occ_index=3, n_id=1, nof_harq_bits=1,
    )
    grid = _grid()
    grid[0, 0:14, 0:12] = pucch.format1_generate(cfg_a, np.asarray(bits_a, np.uint8)) + \
        pucch.format1_generate(cfg_b, np.asarray(bits_b, np.uint8))
    got_a, _, _ = pucch.format1_detect(grid, cfg_a)
    got_b, _, _ = pucch.format1_detect(grid, cfg_b)
    assert int(np.asarray(got_a)[0]) == 1
    assert int(np.asarray(got_b)[0]) == 0


@pytest.mark.parametrize("value,sr", [(0, False), (1, False), (0, True), (1, True)])
def test_format0_harq_with_sr(value, sr):
    # SR opportunity doubles the m_cs candidate set; detector recovers both
    # the HARQ value and the SR flag.
    cfg = pucch.PucchFormat0Config(
        prb=3, start_symbol=12, nof_symbols=2, initial_cyclic_shift=4,
        n_id=17, slot_in_frame=5, nof_harq_bits=1, sr_opportunity=True,
        nof_grid_sc=624)
    sig = pucch.format0_generate(cfg, value, sr=sr)
    grid = np.zeros((1, 14, 624), np.complex64)
    grid[0, 12:14, 3 * 12: 4 * 12] = sig * 0.8
    rng = np.random.default_rng(value + 2 * sr)
    grid += (rng.standard_normal(grid.shape)
             + 1j * rng.standard_normal(grid.shape)).astype(np.complex64) * 0.02
    best, metric, powers = pucch.format0_detect(grid, cfg)
    n_base = 2
    assert int(best) % n_base == value
    assert bool(int(best) >= n_base) == sr
    assert float(metric) > 0.5


def test_group_sequence_hopping_params():
    """TS 38.211 §6.3.2.2.1 group/sequence hopping (the open-source
    reference terminates on these modes, pucch_helper.h:61-64 — spec-model
    properties only)."""
    from srsran_project_tpu.ops.sequences import group_hopping_params

    for n_id in (0, 29, 30, 123, 1007):
        u0, v0 = group_hopping_params(n_id, 0, 0, "neither")
        assert u0 == n_id % 30 and v0 == 0
        seen_u = set()
        for slot in range(10):
            for sym in range(14):
                u, v = group_hopping_params(n_id, slot, sym, "enable")
                assert 0 <= u < 30 and v == 0
                seen_u.add(u)
                u2, v2 = group_hopping_params(n_id, slot, sym, "disable")
                assert u2 == n_id % 30 and v2 in (0, 1)
        # Group hopping must actually hop across symbols.
        assert len(seen_u) > 3, (n_id, seen_u)
    # Deterministic.
    assert group_hopping_params(123, 3, 5, "enable") == group_hopping_params(123, 3, 5, "enable")


def test_format1_batch_matches_single_detectors():
    """The batched (all-ICS x all-OCC) F1 detector reproduces every
    per-candidate single detection in one program."""
    import json
    import os

    golden = os.path.join(os.path.dirname(__file__), "golden", "pucch_format1")
    if not os.path.exists(os.path.join(golden, "manifest.json")):
        pytest.skip("pucch_format1 goldens not generated")
    from srsran_project_tpu.support.file_vector import read_vector

    cases = json.load(open(os.path.join(golden, "manifest.json")))
    case = next(c for c in cases if c["nof_ues"] == 2)
    subc = case["bwp_rb"] * 12
    grid = read_vector(os.path.join(golden, f"grid{case['idx']}.dat"),
                       "cf32").reshape(case["ports"], 14, subc)
    common = dict(prb=case["prb"], start_symbol=case["start_sym"],
                  nof_symbols=case["nof_syms"], n_id=case["n_id"],
                  slot_in_frame=case["slot_idx"], nof_grid_sc=subc)
    batch = {k: np.asarray(v) for k, v in pucch.format1_detect_batch(
        grid, pucch.PucchFormat1Config(initial_cyclic_shift=0, occ_index=0,
                                       **common)).items()}
    for iu in range(case["nof_ues"]):
        p = f"ue{iu}_"
        m0, occ, nb = case[p + "m0"], case[p + "occi"], case[p + "nof_harq"]
        cfg = pucch.PucchFormat1Config(initial_cyclic_shift=m0, occ_index=occ,
                                       nof_harq_bits=nb, **common)
        bits, _, rho = pucch.format1_detect(grid, cfg)
        c = batch["corr"][m0, occ]
        if nb == 1:
            assert int((c.real + c.imag) < 0) == int(np.asarray(bits)[0])
        else:
            assert np.array_equal(batch["bits2"][m0, occ], np.asarray(bits))
        assert abs(float(batch["rho"][m0, occ]) - float(rho)) < 0.05
        # And the golden's reference verdict agrees.
        harq = sum(int(b) << i for i, b in enumerate(
            np.asarray(batch["bits2"][m0, occ][:nb])))
        assert harq == case[p + "ref_harq"]


@pytest.mark.parametrize("nof_symbols", [4, 5, 7, 9, 11, 13, 14])
def test_format1_batch_odd_symbol_counts(nof_symbols):
    """Regression (round-3 advice): the batched F1 detector must handle odd
    nof_symbols, where the DM-RS part has one more symbol than the data part
    and the OCC bank must truncate to the data-symbol count."""
    cfg = pucch.PucchFormat1Config(
        prb=2, start_symbol=14 - nof_symbols, nof_symbols=nof_symbols,
        initial_cyclic_shift=6, occ_index=1, n_id=9, slot_in_frame=3,
        nof_harq_bits=2,
    )
    bits = np.asarray([1, 0], np.uint8)
    sig = pucch.format1_generate(cfg, bits)
    grid = _grid()
    grid[0, cfg.start_symbol : cfg.start_symbol + nof_symbols,
         2 * 12 : 3 * 12] = sig * 0.8 * np.exp(1j * 0.5)
    rng = np.random.default_rng(nof_symbols)
    grid += (rng.standard_normal(grid.shape)
             + 1j * rng.standard_normal(grid.shape)).astype(np.complex64) * 0.01
    out = {k: np.asarray(v) for k, v in pucch.format1_detect_batch(grid, cfg).items()}
    single_bits, _, single_rho = pucch.format1_detect(grid, cfg)
    assert np.array_equal(out["bits2"][6, 1], np.asarray(single_bits))
    assert np.array_equal(out["bits2"][6, 1], bits)
    assert float(out["rho"][6, 1]) > 0.8
    assert abs(float(out["rho"][6, 1]) - float(single_rho)) < 0.05
