"""ZF/MMSE equalizer: recovery, bias, and noise-variance sanity."""

import numpy as np
import pytest

from srsran_project_tpu.ops.equalizer import equalize


def _random_channel(rng, nre, p, l):
    return (rng.standard_normal((nre, p, l)) + 1j * rng.standard_normal((nre, p, l))).astype(
        np.complex64
    ) / np.sqrt(2)


@pytest.mark.parametrize("ports,layers", [(1, 1), (2, 1), (2, 2), (4, 2), (4, 4)])
@pytest.mark.parametrize("method", ["zf", "mmse"])
def test_noiseless_recovery(ports, layers, method):
    rng = np.random.default_rng(ports * 10 + layers)
    nre = 64
    h = _random_channel(rng, nre, ports, layers)
    x = (rng.standard_normal((nre, layers)) + 1j * rng.standard_normal((nre, layers))).astype(
        np.complex64
    ) / np.sqrt(2)
    y = np.einsum("rpl,rl->rp", h, x)
    nv = np.full((nre,), 1e-6, dtype=np.float32)
    x_hat, eq_nv = equalize(y, h, nv, method=method)
    np.testing.assert_allclose(np.asarray(x_hat), x, atol=2e-2)
    assert np.all(np.asarray(eq_nv) >= 0)


def test_mmse_unbiased_under_noise():
    # With random unit-power symbols, the unbiased MMSE output satisfies
    # E[x_hat_l * conj(x_l)] = E|x_l|^2; measure the regression coefficient.
    rng = np.random.default_rng(0)
    ports, layers, trials = 4, 4, 8000
    h = _random_channel(rng, 1, ports, layers)
    hh = np.repeat(h, trials, axis=0)
    x = ((rng.standard_normal((trials, layers)) + 1j * rng.standard_normal((trials, layers)))
         / np.sqrt(2)).astype(np.complex64)
    nvar = 0.5
    y = np.einsum("rpl,rl->rp", hh, x)
    noise = ((rng.standard_normal(y.shape) + 1j * rng.standard_normal(y.shape))
             * np.sqrt(nvar / 2)).astype(np.complex64)
    x_hat, _ = equalize(y + noise, hh, np.full((trials,), nvar, np.float32))
    x_hat = np.asarray(x_hat)
    coef = (x_hat * np.conj(x)).mean(axis=0) / (np.abs(x) ** 2).mean(axis=0)
    np.testing.assert_allclose(coef, np.ones(layers), atol=0.08)


def test_eq_noise_var_scales_with_snr():
    rng = np.random.default_rng(1)
    h = _random_channel(rng, 32, 2, 2)
    x = (rng.standard_normal((32, 2)) + 1j * rng.standard_normal((32, 2))).astype(np.complex64)
    y = np.einsum("rpl,rl->rp", h, x)
    _, nv_low = equalize(y, h, np.full((32,), 0.01, np.float32))
    _, nv_high = equalize(y, h, np.full((32,), 1.0, np.float32))
    assert np.median(np.asarray(nv_high)) > np.median(np.asarray(nv_low))
