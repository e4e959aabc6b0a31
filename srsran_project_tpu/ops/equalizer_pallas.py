"""Pallas TPU kernel for the 4x4 MMSE equalizer weights.

The XLA formulation of `equalize_weights` (gram -> blocked 2x2 Schur
inverse -> unbias) lowers to ~60 small fused elementwise passes over the
subcarrier axis and was measured at +0.65 ms/slot inside the fused
x32-batch decode — the single largest front-end stage (ROOFLINE.md
round-4 profile).  This kernel computes the whole weight chain in ONE
VMEM pass per subcarrier tile: the 32 channel-component lane vectors are
loaded once, the gram/inverse/unbias algebra runs on registers/VMEM, and
only the 32 weight planes + 4 noise lanes go back to HBM.

Layout: complex arrays travel as f32 (re, im) planes with the subcarrier
axis on the 128-wide lane dimension — (2*P*L, nsc) in, (2*L*P + L) rows
out.  Same math as ops/equalizer._inv_small / equalize_weights (MMSE,
tx_scaling = 1): parity-tested against them in interpret mode on CPU and
exercised by the golden PUSCH chain when enabled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = P = 4
BLOCK_N = 512  # subcarriers per tile (4 x 128 lanes)


# ---- complex helpers on (re, im) lane-vector pairs ------------------------

def _cmul(a, b):
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def _cconj(a):
    return (a[0], -a[1])


def _cadd(a, b):
    return (a[0] + b[0], a[1] + b[1])


def _csub(a, b):
    return (a[0] - b[0], a[1] - b[1])


def _cneg(a):
    return (-a[0], -a[1])


def _crecip(a):
    d = a[0] * a[0] + a[1] * a[1]
    r = 1.0 / jnp.maximum(d, 1e-30)
    return (a[0] * r, -a[1] * r)


def _inv2c(c00, c01, c10, c11):
    det = _csub(_cmul(c00, c11), _cmul(c01, c10))
    r = _crecip(det)
    return (_cmul(c11, r), _cneg(_cmul(c01, r)),
            _cneg(_cmul(c10, r)), _cmul(c00, r))


def _mm2c(a, b):
    return (_cadd(_cmul(a[0], b[0]), _cmul(a[1], b[2])),
            _cadd(_cmul(a[0], b[1]), _cmul(a[1], b[3])),
            _cadd(_cmul(a[2], b[0]), _cmul(a[3], b[2])),
            _cadd(_cmul(a[2], b[1]), _cmul(a[3], b[3])))


def _weights_kernel(h_ref, nv_ref, w_ref, ev_ref):
    """One subcarrier tile: h planes (2*P*L, bn) -> w planes + eq_nvar.

    Row layout of h_ref: row (2*(p*L + l) + {0: re, 1: im}) = h[p, l].
    Row layout of w_ref: row (2*(l*P + p) + {0,1}) = w[l, p];
    ev_ref rows l = eq_nvar[l].
    """
    nv = nv_ref[0]
    h = [[(h_ref[2 * (p * L + l), :], h_ref[2 * (p * L + l) + 1, :])
          for l in range(L)] for p in range(P)]

    # Gram g[l][m] = sum_p conj(h[p][l]) h[p][m]; C = g + nv I.
    g = [[None] * L for _ in range(L)]
    for l in range(L):
        for m in range(L):
            acc = (jnp.zeros_like(nv) + 0.0, jnp.zeros_like(nv) + 0.0)
            for p in range(P):
                acc = _cadd(acc, _cmul(_cconj(h[p][l]), h[p][m]))
            g[l][m] = acc
    c = [[(g[l][m][0] + (nv if l == m else 0.0), g[l][m][1])
          for m in range(L)] for l in range(L)]

    # Blocked 2x2 Schur inverse (ops/equalizer._inv_small semantics).
    A = (c[0][0], c[0][1], c[1][0], c[1][1])
    Bm = (c[0][2], c[0][3], c[1][2], c[1][3])
    Bh = (c[2][0], c[2][1], c[3][0], c[3][1])
    D = (c[2][2], c[2][3], c[3][2], c[3][3])
    Ai = _inv2c(*A)
    S = tuple(_csub(d, t) for d, t in zip(D, _mm2c(_mm2c(Bh, Ai), Bm)))
    Si = _inv2c(*S)
    AiB = _mm2c(Ai, Bm)
    BhAi = _mm2c(Bh, Ai)
    TL = tuple(_cadd(a, t) for a, t in zip(Ai, _mm2c(_mm2c(AiB, Si), BhAi)))
    TR = tuple(_cneg(t) for t in _mm2c(AiB, Si))
    BL = tuple(_cneg(t) for t in _mm2c(Si, BhAi))
    ci = [[TL[0], TL[1], TR[0], TR[1]],
          [TL[2], TL[3], TR[2], TR[3]],
          [BL[0], BL[1], Si[0], Si[1]],
          [BL[2], BL[3], Si[2], Si[3]]]

    # mu_l = Re(sum_m ci[l][m] g[m][l]), clipped; w = (ci @ H^H) / mu.
    for l in range(L):
        mu = 0.0
        for m in range(L):
            mu = mu + (ci[l][m][0] * g[m][l][0] - ci[l][m][1] * g[m][l][1])
        mu = jnp.clip(mu, 1e-9, 1.0 - 1e-9)
        inv_mu = 1.0 / mu
        for p in range(P):
            acc = (jnp.zeros_like(nv) + 0.0, jnp.zeros_like(nv) + 0.0)
            for m in range(L):
                acc = _cadd(acc, _cmul(ci[l][m], _cconj(h[p][m])))
            w_ref[2 * (l * P + p), :] = acc[0] * inv_mu
            w_ref[2 * (l * P + p) + 1, :] = acc[1] * inv_mu
        ev_ref[l, :] = (1.0 - mu) * inv_mu


@functools.partial(jax.jit, static_argnames=("interpret",))
def equalize_weights_pallas(h: jax.Array, noise_var: jax.Array,
                            interpret: bool = False):
    """MMSE weights for (nsc, P=4, L=4) complex64 channels, one VMEM pass.

    Returns (w (nsc, L, P) complex64, eq_nvar (nsc, L) f32) — identical
    semantics to ops.equalizer.equalize_weights(h, nv, method="mmse").
    """
    nsc = h.shape[0]
    assert h.shape[-2:] == (P, L), h.shape
    pad = (-nsc) % BLOCK_N
    nsc_p = nsc + pad
    # (nsc, P, L) -> planes (2*P*L, nsc_p): rows interleave re/im.
    hf = jnp.moveaxis(h, 0, -1)  # (P, L, nsc)
    planes = jnp.stack([jnp.real(hf), jnp.imag(hf)], axis=2)  # (P, L, 2, nsc)
    planes = planes.reshape(2 * P * L, nsc).astype(jnp.float32)
    if pad:
        # Identity-ish padding avoids 0/0 in the padded inverse lanes.
        eye = np.tile(np.eye(P, L, dtype=np.float32).reshape(P * L, 1),
                      (1, pad))
        pad_planes = jnp.zeros((2 * P * L, pad), jnp.float32)
        pad_planes = pad_planes.at[0::2].set(jnp.asarray(eye))
        planes = jnp.concatenate([planes, pad_planes], axis=-1)
    nv_row = jnp.broadcast_to(
        jnp.maximum(jnp.asarray(noise_var, jnp.float32), 1e-12), (1, nsc_p))

    grid = (nsc_p // BLOCK_N,)
    w_planes, ev = pl.pallas_call(
        _weights_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * P * L, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2 * L * P, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2 * L * P, nsc_p), jnp.float32),
            jax.ShapeDtypeStruct((L, nsc_p), jnp.float32),
        ],
        interpret=interpret,
    )(planes, nv_row)

    wr = w_planes[0::2, :nsc].reshape(L, P, nsc)
    wi = w_planes[1::2, :nsc].reshape(L, P, nsc)
    w = jnp.moveaxis(jax.lax.complex(wr, wi), -1, 0)  # (nsc, L, P)
    return w, jnp.moveaxis(ev[:, :nsc], -1, 0)  # (nsc, L)
