"""Pallas 4x4 MMSE weights kernel (ops/equalizer_pallas.py): parity with
the XLA formulation and with a float64 oracle.  On the real TPU the
kernel replaces ~60 XLA elementwise passes (+0.65 ms/slot in-chain) AND
is the accuracy reference: the XLA path's 4x4 MXU matmuls needed
HIGHEST-precision pinning after a f64 cross-check showed O(1) weight
error at default (bf16-pass) precision."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srsran_project_tpu.ops.equalizer import equalize_weights
from srsran_project_tpu.ops.equalizer_pallas import (BLOCK_N,
                                                     equalize_weights_pallas)


def _rand_h(nsc, seed=0):
    rng = np.random.default_rng(seed)
    return ((rng.standard_normal((nsc, 4, 4))
             + 1j * rng.standard_normal((nsc, 4, 4))) * 0.5
            ).astype(np.complex64)


def _oracle64(h, nv):
    h64 = h.astype(np.complex128)
    w = np.empty_like(h64)
    ev = np.empty(h.shape[:1] + (4,), np.float64)
    for i in range(h.shape[0]):
        H = h64[i]
        G = H.conj().T @ H
        C = G + nv * np.eye(4)
        Ci = np.linalg.inv(C)
        mu = np.clip(np.real(np.einsum("ij,ji->i", Ci, G)), 1e-9, 1 - 1e-9)
        w[i] = (Ci @ H.conj().T) / mu[:, None]
        ev[i] = (1.0 - mu) / mu
    return w, ev


@pytest.mark.parametrize("nsc", [BLOCK_N, 700, 3276])
def test_pallas_weights_match_xla(nsc):
    h = _rand_h(nsc)
    nv = jnp.float32(0.013)
    w0, e0 = equalize_weights(jnp.asarray(h), nv)
    w1, e1 = equalize_weights_pallas(jnp.asarray(h), nv, interpret=True)
    scale = float(jnp.abs(w0).max())
    assert float(jnp.abs(w0 - w1).max()) < 1e-3 * max(scale, 1.0)
    assert float(jnp.abs(e0 - e1).max()) < 1e-3


def test_pallas_weights_match_f64_oracle():
    nsc = 700
    h = _rand_h(nsc, seed=3)
    nv = 0.013
    w_ref, ev_ref = _oracle64(h, nv)
    w1, e1 = equalize_weights_pallas(jnp.asarray(h), jnp.float32(nv),
                                     interpret=True)
    assert np.abs(np.asarray(w1) - w_ref).max() < 1e-2
    assert np.abs(np.asarray(e1) - ev_ref).max() < 1e-2


def test_xla_weights_match_f64_oracle():
    """Regression for the precision pin: at default MXU precision the
    gram/apply matmuls cost O(1) absolute weight error on TPU (CPU always
    full precision; the pin makes TPU match)."""
    nsc = 700
    h = _rand_h(nsc, seed=4)
    nv = 0.013
    w_ref, _ = _oracle64(h, nv)
    w0, _ = equalize_weights(jnp.asarray(h), jnp.float32(nv))
    assert np.abs(np.asarray(w0) - w_ref).max() < 1e-2


def test_pallas_weights_under_vmap():
    h = np.stack([_rand_h(BLOCK_N, seed=s) for s in range(3)])
    nv = jnp.float32(0.02)
    f = jax.vmap(lambda hh: equalize_weights_pallas(hh, nv, interpret=True))
    w, e = f(jnp.asarray(h))
    w0, e0 = jax.vmap(lambda hh: equalize_weights(hh, nv))(jnp.asarray(h))
    assert float(jnp.abs(w - w0).max()) < 1e-3 * float(jnp.abs(w0).max())
