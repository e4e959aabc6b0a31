"""PRACH generation -> detection loopback."""

import numpy as np
import pytest

from srsran_project_tpu.phy import prach


def _detect_cfg(**kw):
    base = dict(l_ra=839, root_sequence_index=5, zero_correlation_zone=1,
                nof_rx_ports=1, dft_size=1024, detect_threshold=30.0)
    base.update(kw)
    return prach.PrachConfig(**base)


@pytest.mark.parametrize("preamble", [0, 7, 33, 63])
def test_detect_single_preamble(preamble):
    cfg = _detect_cfg()
    rng = np.random.default_rng(preamble)
    tx = prach.generate_preamble(cfg, preamble)
    h = 0.8 * np.exp(1j * 0.9)
    rx = (h * tx + 0.05 * (rng.standard_normal(839) + 1j * rng.standard_normal(839))).astype(
        np.complex64
    )[None, :]
    out = prach.detect(rx, cfg)
    det = np.asarray(out["detected"])
    assert det[preamble], np.asarray(out["metric"])[preamble]
    others = np.delete(np.arange(64), preamble)
    assert not det[others].any()


def test_no_false_alarm_on_noise():
    cfg = _detect_cfg()
    rng = np.random.default_rng(9)
    rx = (0.1 * (rng.standard_normal((1, 839)) + 1j * rng.standard_normal((1, 839)))).astype(
        np.complex64
    )
    out = prach.detect(rx, cfg)
    assert not np.asarray(out["detected"]).any()


def test_detect_with_delay_reports_ta():
    cfg = _detect_cfg()
    pre = 2
    tx = prach.generate_preamble(cfg, pre)
    # Integer-sample delay in the 1024-point delay domain = linear phase in FD.
    delay = 5
    k = np.arange(839)
    rx = (tx * np.exp(-2j * np.pi * delay * k / 1024)).astype(np.complex64)[None, :]
    out = prach.detect(rx, cfg)
    det = np.asarray(out["detected"])
    assert det[pre]
    ta = np.asarray(out["ta_samples"])[pre]
    assert abs(ta - delay) <= 1


def test_two_simultaneous_preambles():
    cfg = _detect_cfg()
    a, b = 4, 40
    rx = (prach.generate_preamble(cfg, a) + prach.generate_preamble(cfg, b))[None, :]
    out = prach.detect(rx.astype(np.complex64), cfg)
    det = np.asarray(out["detected"])
    assert det[a] and det[b]


def test_short_preamble_format():
    cfg = _detect_cfg(l_ra=139, zero_correlation_zone=12, dft_size=256, detect_threshold=15.0)
    pre = 10
    tx = prach.generate_preamble(cfg, pre)
    rx = tx[None, :].astype(np.complex64)
    out = prach.detect(rx, cfg)
    assert np.asarray(out["detected"])[pre]
