"""Pallas TPU kernel for the layered min-sum LDPC decoder.

The speed-of-light path for SURVEY.md §7's "one truly hard kernel": the
XLA version (decoder.py) pays a gather + scatter round trip to HBM per
layer; this kernel keeps the whole a-posteriori state in VMEM across all
iterations and layers, expressing circulant access as static `pltpu.roll`
on (batch_tile, Z) blocks.  Extrinsic messages R stay in VMEM too (layers
unrolled; R is a per-(layer, edge) block in a scratch buffer).

Tiling: grid over codeword-batch tiles; each tile decodes independently
(codeblock parallelism = the batch dimension, reference
pusch_decoder_impl.h:162).  Z up to 384 = 3x128 lanes; the batch tile is
the sublane dimension.

Numerics match decoder.py: f32 state, scaling 0.8, input clamp +-64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import graphs
from .decoder import INPUT_CLAMP, SCALING

DEFAULT_BATCH_TILE = 16  # measured 12% over 8 at the 141-CB Z=384 slot; 32 exceeds the 16M VMEM scoped limit


def _edge_plan(bg: int, z: int, nof_layers: int):
    """[(edges [(col, shift)], ...)] per layer."""
    g = graphs.get_graph(bg, z)
    return [g.row_edges(r) for r in range(nof_layers)], g


@functools.partial(
    jax.jit,
    static_argnames=(
        "bg", "z", "nof_iterations", "nof_layers", "batch_tile", "interpret",
        "early_stop", "bits_only"
    ),
)
def decode_pallas(
    llrs: jax.Array,
    bg: int,
    z: int,
    nof_iterations: int = 6,
    nof_layers: int | None = None,
    batch_tile: int = DEFAULT_BATCH_TILE,
    interpret: bool = False,
    early_stop: bool = False,
    bits_only: bool = False,
):
    """Pallas-kernel LDPC decode.

    llrs: (batch, N) rate-dematched LLRs, N = (n-2)*Z.
    Returns (bits (batch, K) uint8, app (batch, n*Z) f32,
    nof_iters (batch,) int32 — iterations actually run (per batch tile; the
    reference reports the same statistic per codeblock,
    pxsch_bler_test.cpp:375-388)).

    early_stop: on-device syndrome convergence check — the iteration loop is
    a `while_loop` that exits once every check equation in the tile was
    satisfied throughout a full iteration (the on-the-fly layered syndrome,
    the TPU-native analogue of the reference's per-iteration CRC early stop,
    ldpc_decoder_impl.cpp:126-136).  nof_iterations is the budget.  The
    per-tile exit keeps shapes static; a failing codeword in the tile runs
    the tile to the budget, matching per-CB behavior at tile granularity.
    """
    g = graphs.get_graph(bg, z)
    if nof_layers is None:
        nof_layers = g.m
    layers, _ = _edge_plan(bg, z, nof_layers)
    nb = g.n
    batch = llrs.shape[0]
    pad_b = (-batch) % batch_tile
    # int8 LLRs stay int8 on the wire into VMEM (4x less HBM read traffic
    # at the 141-CB slot; the kernel clamps to +-64 after the in-VMEM cast,
    # numerically identical to the f32 path since int8 is within +-127).
    in_dtype = llrs.dtype if llrs.dtype == jnp.int8 else jnp.float32
    x = jnp.pad(llrs.astype(in_dtype), ((0, pad_b), (0, 0)))
    bt = batch_tile
    nof_tiles = x.shape[0] // bt

    # Total number of edges (for the R scratch layout).
    edge_offsets = []
    total_edges = 0
    for edges in layers:
        edge_offsets.append(total_edges)
        total_edges += len(edges)

    def kernel(in_ref, app_out_ref, iters_out_ref, app_scr, r_scr):
        # Load channel LLRs into the APP scratch (with puncture prefix).
        app_scr[:, : 2 * z] = jnp.zeros((bt, 2 * z), jnp.float32)
        app_scr[:, 2 * z :] = jnp.clip(in_ref[:].astype(jnp.float32),
                                       -INPUT_CLAMP, INPUT_CLAMP)
        r_scr[:] = jnp.zeros_like(r_scr)

        def one_iteration(carry):
            i, _ = carry
            odd_any = jnp.zeros((), jnp.int32)
            for li, edges in enumerate(layers):
                base = edge_offsets[li]
                # Gather rotated variable blocks and subtract extrinsics.
                # Forward circulant P^s maps v[i] <- v[(i+s) mod Z], i.e.
                # jnp.roll(v, -s) == pltpu.roll(v, Z - s).
                vs = []
                app_parity = None
                for e, (col, shift) in enumerate(edges):
                    blk = app_scr[:, col * z : (col + 1) * z]
                    rot = pltpu.roll(blk, shift=(z - shift) % z, axis=1) if shift else blk
                    if early_stop:
                        hard = (rot < 0).astype(jnp.float32)
                        app_parity = hard if app_parity is None else app_parity + hard
                    vs.append(rot - r_scr[:, (base + e) * z : (base + e + 1) * z])
                if early_stop:
                    # On-the-fly syndrome: parity of the a-posteriori hard
                    # decisions entering this layer (TPU-native analogue of
                    # the reference's per-iteration CRC early stop,
                    # ldpc_decoder_impl.cpp:126-136).
                    layer_odd = jnp.mod(app_parity, 2.0) > 0.5
                    odd_any = jnp.maximum(odd_any, jnp.max(layer_odd.astype(jnp.int32)))
                absv = [jnp.abs(v) for v in vs]
                m1 = absv[0]
                for a in absv[1:]:
                    m1 = jnp.minimum(m1, a)
                big = jnp.float32(3.0e38)
                m2 = jnp.full_like(m1, big)
                nof_min = jnp.zeros_like(m1)
                for a in absv:
                    is_min = a == m1
                    nof_min = nof_min + is_min.astype(jnp.float32)
                    m2 = jnp.minimum(m2, jnp.where(is_min, big, a))
                # Duplicate minima: the second-smallest equals the smallest.
                m2 = jnp.where(nof_min > 1.5, m1, jnp.where(m2 >= big, m1, m2))
                neg_parity = jnp.zeros_like(m1)
                for v in vs:
                    neg_parity = neg_parity + (v < 0).astype(jnp.float32)
                odd_total = jnp.mod(neg_parity, 2.0) > 0.5
                for e, (col, shift) in enumerate(edges):
                    v = vs[e]
                    a = absv[e]
                    mag = jnp.where(a == m1, m2, m1)
                    # sign over the other edges = total parity xor own sign.
                    neg_others = jnp.logical_xor(odd_total, v < 0)
                    r_new = jnp.where(neg_others, -SCALING, SCALING) * mag
                    r_scr[:, (base + e) * z : (base + e + 1) * z] = r_new
                    newv = v + r_new
                    back = pltpu.roll(newv, shift=shift, axis=1) if shift else newv
                    app_scr[:, col * z : (col + 1) * z] = back
            return i + 1, odd_any

        if early_stop:
            # Exit once an entire iteration saw every check satisfied for
            # every codeword in the tile (or the budget runs out).
            final_i, _ = jax.lax.while_loop(
                lambda c: jnp.logical_and(c[0] < nof_iterations, c[1] > 0),
                one_iteration,
                (jnp.zeros((), jnp.int32), jnp.ones((), jnp.int32)),
            )
        else:
            jax.lax.fori_loop(
                0, nof_iterations, lambda it, c: one_iteration((it, c))[1], jnp.zeros((), jnp.int32)
            )
            final_i = jnp.full((), nof_iterations, jnp.int32)
        if bits_only:
            # Emit only the hard-decision payload bits: the a-posteriori
            # f32 array is 13x the bytes and the decode was measured
            # HBM-bound on exactly that write at the x32 slot batch.
            app_out_ref[:] = (app_scr[:, : g.kb * z] < 0).astype(jnp.uint8)
        else:
            app_out_ref[:] = app_scr[:]
        iters_out_ref[:] = jnp.full_like(iters_out_ref, final_i)

    out_cols = g.kb * z if bits_only else nb * z
    out_dtype = jnp.uint8 if bits_only else jnp.float32
    app, iters = pl.pallas_call(
        kernel,
        grid=(nof_tiles,),
        in_specs=[pl.BlockSpec((bt, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((bt, out_cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x.shape[0], out_cols), out_dtype),
            jax.ShapeDtypeStruct((x.shape[0], 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, nb * z), jnp.float32),
            pltpu.VMEM((bt, total_edges * z), jnp.float32),
        ],
        interpret=interpret,
    )(x)

    if bits_only:
        bits = app[:batch]
        return bits, None, iters[:batch, 0]
    app = app[:batch]
    bits = (app[:, : g.kb * z] < 0).astype(jnp.uint8)
    return bits, app, iters[:batch, 0]
