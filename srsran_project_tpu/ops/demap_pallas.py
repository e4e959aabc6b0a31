"""Pallas TPU kernel: MMSE apply + max-log demap + quantize + descramble,
emitting the LDPC decoder's de-interleave BIT-PLANES directly.

The XLA chain bills ~0.18 ms/slot across three stages at the flagship
shape (weights apply 0.04 + demap/quantize/descramble 0.08 + the fused
decoder's bit-plane extraction 0.06); this kernel does all of it in ONE
VMEM pass per (data symbol, lane tile): the equalized symbol never
touches HBM, the closed-form per-axis max-log LLRs (the same exact
expression as ops/modulation/demapper._axis_llrs_closed) evaluate on
registers, and the int8 output lands in the (qm, G/qm) plane layout
`sch._fused_decode` consumes — the downstream plane extraction
disappears too.

Lane layout: every VECTOR LANE is one (subcarrier, layer) pair — the
inputs are pre-expanded in XLA (y repeated L times per subcarrier, the
weight/noise planes transposed to (sc, l)-major), so the kernel has no
per-layer interleave at all (Mosaic rejects the (bn, L) -> (bn*L)
shape cast an interleaving kernel would need).  Lane j of data symbol s
is stream position (s*nsc + j//L)*L + (j%L) = exactly the de-interleave
plane index of TS 38.212's bit stream.

Scope: the flagship fast path — full-row data symbols, per-subcarrier
weights, square QAM (and QPSK), scalar noise.  Everything else keeps the
XLA chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modulation.demapper import LLR_MAX
from .modulation.mapper import Modulation, bits_per_symbol, pam_levels

BLOCK_N = 2048  # lanes per tile over the (sc, l) axis


@functools.partial(
    jax.jit, static_argnames=("mod", "nof_layers", "nof_ports", "range_limit", "interpret"))
def demap_planes_pallas(
    y: jax.Array,
    w: jax.Array,
    eq_nvar: jax.Array,
    sign_planes: jax.Array,
    mod: Modulation,
    nof_layers: int,
    nof_ports: int,
    range_limit: float = 20.0,
    interpret: bool = False,
):
    """Fused equalize-apply + demap + quantize + descramble.

    y:           (P, nsym_d, nsc) complex64 — data-symbol grid.
    w:           (nsc, L, P) complex64 — per-subcarrier MMSE weights
                 (equalize_weights / equalize_weights_pallas output).
    eq_nvar:     (nsc, L) f32 — post-equalization noise variances.
    sign_planes: (qm, nsym_d*nsc*L) f32 — descrambling signs (1 - 2c) in
                 PLANE layout: plane b, position j = (sym*nsc + sc)*L + l
                 (from the traced-c_init Gold sequence: one
                 reshape(G//qm, qm).T of the f32 sign stream).
    Returns (llr_planes (qm, nsym_d*nsc*L) int8 — descrambled, positive =
    bit 0, exactly `llr_i8.reshape(-1, qm).T` of the XLA chain — and
    err2 (nsym_d, nsc*L) f32: the per-lane squared distance to the
    nearest constellation point, for the decision-directed EVM / post-
    equalization SINR without materializing the equalized symbols).
    """
    L, P = nof_layers, nof_ports
    qm = bits_per_symbol(mod)
    m = qm // 2
    levels, labels = pam_levels(mod)
    nof_ports_y, nsym_d, nsc = y.shape
    assert nof_ports_y == P and w.shape == (nsc, L, P)
    width = nsc * L
    pad = (-width) % BLOCK_N
    wp = width + pad

    # ---- XLA-side lane expansion (cheap: broadcasts + small transposes) ---
    # y lanes: j = sc*L + l -> y[p, s, sc] repeated L times.  The SYMBOL
    # axis rides the SUBLANES of every kernel block (a lane-vector-only
    # kernel ran at 1/8 VPU utilization).  Planes FIRST, then an f32
    # jnp.repeat: the same repeat on the complex array (or a trailing-dim
    # broadcast_to+reshape) lowers ~20x slower on this backend.
    y_pl = jnp.concatenate([jnp.real(y), jnp.imag(y)], axis=0)  # (2P, s, nsc)
    y_planes = jnp.repeat(y_pl, L, axis=-1)  # (2P, nsym_d, width)
    # w lanes: j -> w[sc, l, p]; rows p then p+P for re/im.
    w_lane = w.reshape(width, P)  # (sc*L, P) — row-major (sc, l) ✓
    w_planes = jnp.concatenate(
        [jnp.real(w_lane).T, jnp.imag(w_lane).T], axis=0)  # (2P, width)
    inv_nv = (1.0 / jnp.maximum(eq_nvar, 1e-12)).reshape(1, width)
    if pad:
        y_planes = jnp.pad(y_planes, ((0, 0), (0, 0), (0, pad)))
        w_planes = jnp.pad(w_planes, ((0, 0), (0, pad)))
        inv_nv = jnp.pad(inv_nv, ((0, 0), (0, pad)))
    gold2 = sign_planes.astype(jnp.float32).reshape(qm, nsym_d, width)
    if pad:
        gold2 = jnp.pad(gold2, ((0, 0), (0, 0), (0, pad)))
    scale = np.float32(LLR_MAX / range_limit)

    def kernel(y_ref, w_ref, nv_ref, g_ref, out_ref, err_ref):
        y_p = [(y_ref[p], y_ref[P + p]) for p in range(P)]  # (nsym_d, bn)
        w_p = [(w_ref[p : p + 1, :], w_ref[P + p : P + p + 1, :])
               for p in range(P)]  # (1, bn) — broadcast over symbols
        xr = w_p[0][0] * y_p[0][0] - w_p[0][1] * y_p[0][1]
        xi = w_p[0][0] * y_p[0][1] + w_p[0][1] * y_p[0][0]
        for p in range(1, P):
            xr = xr + w_p[p][0] * y_p[p][0] - w_p[p][1] * y_p[p][1]
            xi = xi + w_p[p][0] * y_p[p][1] + w_p[p][1] * y_p[p][0]
        inv = nv_ref[0:1, :]

        def axis_llrs(v):
            d2 = [(v - np.float32(lv)) ** 2 for lv in levels]
            outs = []
            for b in range(m):
                m0 = m1 = None
                for li_, d in enumerate(d2):
                    if labels[li_, b]:
                        m1 = d if m1 is None else jnp.minimum(m1, d)
                    else:
                        m0 = d if m0 is None else jnp.minimum(m0, d)
                outs.append(m1 - m0)
            # Nearest-point distance of this axis (for the EVM output).
            dmin = d2[0]
            for d in d2[1:]:
                dmin = jnp.minimum(dmin, d)
            return outs, dmin

        li, di = axis_llrs(xr)
        lq, dq = axis_llrs(xi)
        err_ref[...] = di + dq
        for t in range(m):
            for b, row in ((2 * t, li[t]), (2 * t + 1, lq[t])):
                q = jnp.clip(jnp.round(row * inv * scale), -LLR_MAX, LLR_MAX)
                # Descramble: multiply by the pre-resolved +-1 sign plane.
                out_ref[b] = (q * g_ref[b]).astype(jnp.int8)

    grid = (wp // BLOCK_N,)
    out, err2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * P, nsym_d, BLOCK_N), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * P, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qm, nsym_d, BLOCK_N), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qm, nsym_d, BLOCK_N), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsym_d, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qm, nsym_d, wp), jnp.int8),
            jax.ShapeDtypeStruct((nsym_d, wp), jnp.float32),
        ),
        interpret=interpret,
    )(y_planes, w_planes, inv_nv, gold2)

    if pad:
        out = out[..., :width]
        err2 = err2[..., :width]
    return out.reshape(qm, nsym_d * width), err2
