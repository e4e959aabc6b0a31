"""PUCCH F0/F1 detector statistics: false-alarm and missed-detection rates
at the calibrated DTX thresholds (the reference validates its PUCCH
detectors with per-format FA/MD statistics the same way; see
pucch.F0_DTX_THRESHOLD calibration note)."""

import numpy as np
import pytest

from srsran_project_tpu.phy import pucch


def _cfgs():
    cfg0 = pucch.PucchFormat0Config(
        prb=0, n_id=17, initial_cyclic_shift=3, nof_harq_bits=1,
        start_symbol=12, nof_symbols=2, slot_in_frame=1)
    cfg1 = pucch.PucchFormat1Config(
        prb=1, n_id=17, initial_cyclic_shift=0, occ_index=0,
        nof_harq_bits=1, start_symbol=4, nof_symbols=10, slot_in_frame=1)
    return cfg0, cfg1


def test_pucch_dtx_false_alarm():
    """Noise-only input: FA rate <= 1% for both formats (observed 0 at the
    calibrated thresholds over 1500 draws)."""
    import jax

    cfg0, cfg1 = _cfgs()
    rng = np.random.default_rng(7)
    n = 1500
    noise = (rng.standard_normal((n, 1, 14, 48))
             + 1j * rng.standard_normal((n, 1, 14, 48))).astype(np.complex64)
    noise *= np.sqrt(0.5)
    m0 = np.asarray(jax.vmap(lambda g: pucch.format0_detect(g, cfg0)[1])(noise))
    m1 = np.asarray(jax.vmap(lambda g: pucch.format1_detect(g, cfg1)[2])(noise))
    assert np.mean(m0 > pucch.F0_DTX_THRESHOLD) <= 0.01
    assert np.mean(m1 > pucch.F1_DTX_THRESHOLD) <= 0.01


def test_pucch_missed_detection_and_value():
    """3 dB single-port operating point through a random-phase channel:
    >= 99% detected AND decoded correctly for both formats."""
    import jax

    cfg0, cfg1 = _cfgs()
    rng = np.random.default_rng(8)
    n = 500
    nv = 10 ** (-3.0 / 10)
    grids = np.zeros((n, 1, 14, 48), np.complex64)
    g0 = np.asarray(pucch.format0_generate(cfg0, 1))
    ph0 = np.exp(1j * rng.uniform(0, 2 * np.pi, (n, 1))).astype(np.complex64)
    for i, s in enumerate(range(cfg0.start_symbol, cfg0.start_symbol + cfg0.nof_symbols)):
        grids[:, 0, s, 0:12] = g0[i][None, :] * ph0
    g1 = np.asarray(pucch.format1_generate(cfg1, np.asarray([1], np.uint8)))
    ph1 = np.exp(1j * rng.uniform(0, 2 * np.pi, (n, 1))).astype(np.complex64)
    for i, s in enumerate(range(cfg1.start_symbol, cfg1.start_symbol + cfg1.nof_symbols)):
        grids[:, 0, s, 12:24] = g1[i][None, :] * ph1
    grids += (rng.standard_normal(grids.shape)
              + 1j * rng.standard_normal(grids.shape)).astype(np.complex64) * np.sqrt(nv / 2)

    v0, m0 = map(np.asarray, jax.vmap(lambda g: pucch.format0_detect(g, cfg0)[:2])(grids))
    b1, _, m1 = jax.vmap(lambda g: pucch.format1_detect(g, cfg1))(grids)
    ok0 = (v0 == 1) & (m0 > pucch.F0_DTX_THRESHOLD)
    ok1 = (np.asarray(b1)[:, 0] == 1) & (np.asarray(m1) > pucch.F1_DTX_THRESHOLD)
    assert np.mean(ok0) >= 0.99, float(np.mean(ok0))
    assert np.mean(ok1) >= 0.99, float(np.mean(ok1))
