"""Amplitude control and PRACH OFDM demodulation."""

import numpy as np

from srsran_project_tpu.ops import lower_phy
from srsran_project_tpu.phy import prach


def test_amplitude_control_clipping():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)).astype(np.complex64)
    y, m = lower_phy.amplitude_control(x, gain_db=0.0, ceiling_db=0.0)
    y = np.asarray(y)
    assert np.abs(y).max() <= 1.0 + 1e-5
    assert float(m["clipping_prob"]) > 0  # unit-variance Gaussian clips at 1
    # Without clipping, signal passes through with gain.
    y2, m2 = lower_phy.amplitude_control(x, gain_db=-20.0, enable_clipping=False)
    np.testing.assert_allclose(np.asarray(y2), x * 0.1, atol=1e-5)
    assert float(m2["clipping_prob"]) == 0


def test_prach_demodulate_recovers_preamble():
    # Build time-domain PRACH: IDFT of the freq preamble placed at k_offset.
    cfg = prach.PrachConfig(l_ra=839, zero_correlation_zone=1, detect_threshold=30.0)
    fd = prach.generate_preamble(cfg, 5)
    dft, cp, koff = 2048, 264, 100
    spec = np.zeros(dft, np.complex64)
    spec[(koff + np.arange(839)) % dft] = fd
    body = np.fft.ifft(spec) * np.sqrt(dft)
    time_sig = np.concatenate([body[-cp:], body]).astype(np.complex64)
    got = np.asarray(
        lower_phy.prach_demodulate(time_sig, l_ra=839, dft_size=dft, nof_symbols=1,
                                   cp_samples=cp, k_offset=koff)
    )
    np.testing.assert_allclose(got, fd, atol=1e-3)
    # End-to-end: demodulated preamble detects.
    out = prach.detect(got[None], cfg)
    assert np.asarray(out["detected"])[5]


def test_prach_demodulate_symbol_averaging():
    rng = np.random.default_rng(1)
    dft, cp = 1024, 100
    spec = (rng.standard_normal(dft) + 1j * rng.standard_normal(dft)).astype(np.complex64)
    body = np.fft.ifft(spec) * np.sqrt(dft)
    sig = np.concatenate([body[-cp:], body, body]).astype(np.complex64)  # 2 repeats
    got = np.asarray(
        lower_phy.prach_demodulate(sig, l_ra=139, dft_size=dft, nof_symbols=2,
                                   cp_samples=cp, k_offset=7)
    )
    np.testing.assert_allclose(got, spec[(7 + np.arange(139)) % dft], atol=1e-3)
