"""Port channel estimator: LS accuracy, OCC despreading, noise variance,
TA and CFO estimates."""

import numpy as np
import pytest

from srsran_project_tpu.ops import estimator


def _run(h_true, nvar, nsym=2, npairs=36, seed=0, wf_pattern=None):
    rng = np.random.default_rng(seed)
    npil = 2 * npairs
    ref = np.exp(1j * rng.uniform(0, 2 * np.pi, (nsym, npil))).astype(np.complex64)
    wf = np.ones(npil, np.float32) if wf_pattern is None else wf_pattern
    # Channel constant across each pilot pair.
    h_at_pilots = np.repeat(h_true, 2)[None].astype(np.complex64)
    y = h_at_pilots * ref * wf
    y = y + (rng.standard_normal(y.shape) + 1j * rng.standard_normal(y.shape)).astype(
        np.complex64
    ) * np.sqrt(nvar / 2)
    pair_pos = tuple(float(4 * i + 1.0) for i in range(npairs))
    return estimator.estimate_channel(
        y[None], ref[None], wf, pair_pos, nof_sc=4 * npairs, smooth=False,
        compute_ta=True, compute_cfo=True,
    )


def test_ls_flat_channel():
    h_true = np.full(36, 0.8 * np.exp(1j * 0.5), np.complex64)
    h, nv, m = _run(h_true, nvar=1e-4)
    np.testing.assert_allclose(np.asarray(h)[0], np.full(144, h_true[0]), atol=2e-2)
    assert float(np.asarray(nv)[0]) < 1e-3
    assert float(np.asarray(m["snr"])[0]) > 100


def test_noise_variance_estimate():
    h_true = np.full(48, 1.0, np.complex64)
    _, nv, _ = _run(h_true, nvar=0.1, npairs=48, seed=1)
    assert 0.05 < float(np.asarray(nv)[0]) < 0.2


def test_occ_despreading():
    # Port with wf = (+1, -1): the estimator must recover h through the OCC.
    h_true = np.full(36, 1.0 + 0.3j, np.complex64)
    wf = np.tile([1.0, -1.0], 36).astype(np.float32)
    h, _, _ = _run(h_true, nvar=1e-5, wf_pattern=wf, seed=2)
    np.testing.assert_allclose(np.asarray(h)[0], np.full(144, h_true[0]), atol=1e-2)


def test_ta_estimate_detects_delay():
    # Linear phase across pilot pairs = a delay; TA peak bin must match.
    npairs = 64
    n = np.arange(npairs)
    delay_cycles = 0.01  # cycles per pair step
    h_true = np.exp(-2j * np.pi * delay_cycles * n).astype(np.complex64)
    _, _, m = _run(h_true, nvar=1e-6, npairs=npairs, seed=3)
    ta = float(np.asarray(m["ta_peak_bin_4096"])[0])
    # Expected bin: delay_cycles * 4096.
    assert abs(ta - delay_cycles * 4096) <= 2


def test_cfo_estimate_sign():
    rng = np.random.default_rng(4)
    npil = 64
    ref = np.exp(1j * rng.uniform(0, 2 * np.pi, (2, npil))).astype(np.complex64)
    phase = 0.3  # radians between the two DM-RS symbols
    y = np.stack([ref[0], ref[1] * np.exp(1j * phase)])[None]
    pair_pos = tuple(float(4 * i + 1.0) for i in range(npil // 2))
    _, _, m = estimator.estimate_channel(
        y, ref[None], np.ones(npil, np.float32), pair_pos, nof_sc=npil * 2, smooth=False,
        compute_ta=True, compute_cfo=True,
    )
    cfo = float(np.asarray(m["cfo_phase_per_dmrs_symbol"])[0])
    assert abs(cfo - phase) < 0.02
