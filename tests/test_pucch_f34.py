"""PUCCH format 3/4 loopbacks."""

import numpy as np
import pytest

from srsran_project_tpu.phy import pucch_f34


def _run(cfg, bits, h=0.9 * np.exp(1j * 0.4), noise=0.02, seed=0):
    rng = np.random.default_rng(seed)
    grid = pucch_f34.generate(cfg, bits)[None] * h
    grid = grid + (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)).astype(
        np.complex64
    ) * noise
    return pucch_f34.process(grid.astype(np.complex64), cfg)


@pytest.mark.parametrize("nof_bits,nof_prb,nsym", [(4, 1, 4), (16, 2, 10), (40, 4, 14)])
def test_format3_loopback(nof_bits, nof_prb, nsym):
    cfg = pucch_f34.PucchFormat34Config(
        prb_start=10, nof_prb=nof_prb, start_symbol=0, nof_symbols=nsym,
        nof_uci_bits=nof_bits, rnti=0x777, n_id=11, slot_in_frame=2,
    )
    rng = np.random.default_rng(nof_bits)
    bits = rng.integers(0, 2, size=(nof_bits,), dtype=np.uint8)
    got, ok, snr = _run(cfg, bits, seed=nof_bits)
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(got), bits)
    assert float(snr) > 5


@pytest.mark.parametrize("occ_len,occ_idx", [(2, 0), (2, 1), (4, 2)])
def test_format4_occ(occ_len, occ_idx):
    cfg = pucch_f34.PucchFormat34Config(
        prb_start=3, nof_prb=1, start_symbol=0, nof_symbols=14,
        nof_uci_bits=5, rnti=0x321, n_id=4, occ_length=occ_len, occ_index=occ_idx,
    )
    rng = np.random.default_rng(occ_len * 10 + occ_idx)
    bits = rng.integers(0, 2, size=(5,), dtype=np.uint8)
    got, ok, snr = _run(cfg, bits, seed=occ_idx)
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(got), bits)


def test_format4_user_separation():
    # Two UEs sharing the PRB with different OCC indices.
    mk = lambda idx: pucch_f34.PucchFormat34Config(
        prb_start=0, nof_prb=1, start_symbol=0, nof_symbols=14,
        nof_uci_bits=4, rnti=0x100 + idx, n_id=9, occ_length=2, occ_index=idx,
    )
    a, b = mk(0), mk(1)
    rng = np.random.default_rng(7)
    bits_a = rng.integers(0, 2, size=(4,), dtype=np.uint8)
    bits_b = rng.integers(0, 2, size=(4,), dtype=np.uint8)
    grid = (pucch_f34.generate(a, bits_a) + pucch_f34.generate(b, bits_b))[None]
    # Shared DM-RS sequence: both configs use the same n_id; estimation sees
    # the superposed channel, but the data OCC separates the payloads.
    got_a, ok_a, _ = pucch_f34.process(grid.astype(np.complex64), a)
    got_b, ok_b, _ = pucch_f34.process(grid.astype(np.complex64), b)
    np.testing.assert_array_equal(np.asarray(got_a), bits_a)
    np.testing.assert_array_equal(np.asarray(got_b), bits_b)
