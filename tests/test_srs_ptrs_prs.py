"""SRS estimator, PT-RS and PRS generators."""

import numpy as np
import pytest

from srsran_project_tpu.phy import ptrs_prs, srs


def test_srs_estimate_flat_channel():
    cfg = srs.SrsConfig(rb_start=4, rb_count=16, start_symbol=12, nof_symbols=2,
                        comb=2, sequence_id=7, nof_rx_ports=2)
    tx = srs.generate(cfg)
    h_true = np.array([0.9 * np.exp(1j * 0.8), 0.4 * np.exp(-1j * 1.2)], np.complex64)
    grid = np.stack([h * tx for h in h_true])
    rng = np.random.default_rng(0)
    grid = grid + 0.01 * (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)).astype(np.complex64)
    out = srs.estimate(grid.astype(np.complex64), cfg)
    h = np.asarray(out["h"])
    assert h.shape == (2, cfg.seq_length)
    for p in range(2):
        np.testing.assert_allclose(h[p].mean(), h_true[p], atol=0.05)
    assert (np.asarray(out["noise_var"]) < 0.01).all()
    assert abs(float(np.asarray(out["phase_slope"])[0])) < 0.05  # no delay


def test_srs_detects_delay_slope():
    cfg = srs.SrsConfig(rb_start=0, rb_count=24, start_symbol=13, nof_symbols=1, comb=2)
    tx = srs.generate(cfg)
    # Apply a linear phase ramp across subcarriers (a delay).
    k = np.arange(tx.shape[-1])
    ramp = np.exp(-2j * np.pi * 0.01 * k).astype(np.complex64)
    grid = (tx * ramp)[None]
    out = srs.estimate(grid, cfg)
    slope = float(np.asarray(out["phase_slope"])[0])
    # Expected: -2*pi*0.01*comb per comb step.
    assert abs(slope - (-2 * np.pi * 0.01 * 2)) < 0.02


def test_ptrs_layout():
    cfg = ptrs_prs.PtrsConfig(rb_start=0, rb_count=8, symbols=(1, 3, 5), k_ptrs=2)
    grid = np.asarray(ptrs_prs.generate_ptrs(cfg))
    assert grid.shape == (14, 624)
    nz = np.abs(grid[1]) > 0
    assert nz.sum() == 4  # 8 PRB / K=2
    assert np.abs(grid[2]).max() == 0
    # Pilot magnitude is unit/sqrt2 QPSK.
    np.testing.assert_allclose(np.abs(grid[1][nz]), 1.0, atol=1e-5)


@pytest.mark.parametrize("comb", [2, 4, 6, 12])
def test_prs_comb_pattern(comb):
    cfg = ptrs_prs.PrsConfig(rb_start=0, rb_count=12, start_symbol=2, nof_symbols=comb if comb <= 4 else 6,
                             comb_size=comb, n_id_prs=99)
    grid = np.asarray(ptrs_prs.generate_prs(cfg))
    per_sym = 12 * 12 // comb
    for i in range(cfg.nof_symbols):
        nz = np.abs(grid[cfg.start_symbol + i]) > 0
        assert nz.sum() == per_sym
    # Across enough symbols, staggered offsets cover distinct residues.
    if comb in (2, 4):
        union = np.zeros(624, bool)
        for i in range(cfg.nof_symbols):
            union |= np.abs(grid[cfg.start_symbol + i]) > 0
        assert union[: 12 * 12].all()
