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


def test_cfar_threshold_false_alarm_rate():
    """Noise-only occasions: empirical Pfa matches the analytic CFAR bound."""
    import jax
    import jax.numpy as jnp

    cfg = prach.PrachConfig(l_ra=139, zero_correlation_zone=11, dft_size=256,
                            target_pfa=0.05)
    thr = prach.threshold_for(cfg)
    assert thr > 2.0  # far above the naive default
    key = jax.random.PRNGKey(0)
    trials, alarms = 400, 0
    for i in range(trials):
        key, k1, k2 = jax.random.split(key, 3)
        noise = (jax.random.normal(k1, (1, cfg.l_ra)) +
                 1j * jax.random.normal(k2, (1, cfg.l_ra))).astype(jnp.complex64)
        res = prach.detect(noise, cfg)
        alarms += int(np.asarray(res["detected"]).any())
    # 400 Bernoulli(<=0.05) trials: >=45 alarms is ~impossible (>5 sigma)
    assert alarms <= 45, f"false alarm rate {alarms/trials:.3f} >> target 0.05"


def test_cfar_threshold_still_detects_signal():
    import jax.numpy as jnp

    cfg = prach.PrachConfig(l_ra=839, zero_correlation_zone=1, dft_size=1024)
    pre = prach.generate_preamble(cfg, preamble_index=17)
    rng = np.random.default_rng(5)
    noise = (rng.normal(size=(1, 839)) + 1j * rng.normal(size=(1, 839))) * 0.5
    rx = jnp.asarray((pre[None, :] + noise).astype(np.complex64))
    res = prach.detect(rx, cfg)
    det = np.asarray(res["detected"])
    assert det[17] and det.sum() == 1

def test_gamma_sf_multi_port_thresholds_ordered():
    # more rx ports average noise -> lower per-port-normalized threshold
    t1 = prach.threshold_for(prach.PrachConfig(nof_rx_ports=1))
    t2 = prach.threshold_for(prach.PrachConfig(nof_rx_ports=2))
    t4 = prach.threshold_for(prach.PrachConfig(nof_rx_ports=4))
    assert t1 > t2 > t4 > 1.0


def test_prach_detect_ref_pfa_pd():
    """False-alarm / detection statistics of the reference-parity detector
    at a table operating point (format 0, zcz 1, 1 port)."""
    import numpy as np

    from srsran_project_tpu.phy import prach

    rng = np.random.default_rng(42)
    # zcz=0: single shift per root, full-CP window (threshold 0.147 in the
    # validated table).  At zcz=1 the reference's own threshold (1.0) sits
    # barely under the fractional-delay correlation peaks, so detection
    # probability there is intrinsically poor — reproduced by detect_ref.
    fmt, root, zcz = "0", 1, 0
    L = 839
    false_alarms = 0
    trials = 40
    for _ in range(trials):
        rx = (rng.standard_normal((1, 1, L)) + 1j * rng.standard_normal((1, 1, L)))
        false_alarms += len(prach.detect_ref(rx, fmt, root, zcz))
    assert false_alarms <= 1, f"{false_alarms} false alarms in {trials} noise occasions"

    detected = 0
    amp = np.sqrt(L)
    sigma = amp * 10 ** (-6 / 20) / np.sqrt(2)
    k = np.arange(L)
    ks = np.where(k < 420, k, k - 839)
    for t in range(trials):
        pi = int(rng.integers(0, 64))
        delay = float(rng.uniform(1.0, 80.0))
        y = prach.generate_preamble_ref(fmt, root, pi, zcz)
        y = y * np.exp(-2j * np.pi * ks * delay / 1024)
        rx = y[None, None, :] + sigma * (
            rng.standard_normal((1, 1, L)) + 1j * rng.standard_normal((1, 1, L))
        )
        res = prach.detect_ref(rx, fmt, root, zcz)
        detected += any(r["preamble_index"] == pi for r in res)
    assert detected >= trials - 2, f"only {detected}/{trials} detected at 6 dB"
