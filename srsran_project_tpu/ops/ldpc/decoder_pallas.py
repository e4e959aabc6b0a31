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

DEFAULT_BATCH_TILE = 16  # measured 12% over 8 at the 141-CB Z=384 slot; 32 exceeds the 16M VMEM scoped limit at the FULL graph
# Scratch budget for the auto tile: the 16 MB scoped VMEM limit minus
# headroom for what the estimate below does NOT count (double-buffered
# input/output blocks, layout padding — measured ~4-5 MB of slack needed
# on a full-graph Z=288 shape that OOM'd at 19.09/16 MB with tile 32).
_VMEM_BUDGET_BYTES = 10 << 20


def _auto_batch_tile(z: int, ncols: int, total_edges: int,
                     in_bytes_per_row: int, requested: int) -> int:
    """Largest power-of-two tile <= 2*requested whose scratch (APP + R +
    input block) fits the VMEM budget: the LBRM layer truncation shrinks
    the R scratch enough that tile 32 fits the flagship shape (the full
    46-layer graph still caps at 16)."""
    bt = max(requested, 1)
    while bt * 2 <= 2 * requested:
        cand = bt * 2
        need = cand * (ncols * z * 4 + total_edges * z * 4 + in_bytes_per_row)
        if need > _VMEM_BUDGET_BYTES:
            break
        bt = cand
        if bt >= 2 * requested:
            break
    need = bt * (ncols * z * 4 + total_edges * z * 4 + in_bytes_per_row)
    while bt > 1 and need > _VMEM_BUDGET_BYTES:
        bt //= 2
        need = bt * (ncols * z * 4 + total_edges * z * 4 + in_bytes_per_row)
    return bt


def _edge_plan(bg: int, z: int, nof_layers: int):
    """[(edges [(col, shift)], ...)] per layer."""
    g = graphs.get_graph(bg, z)
    return [g.row_edges(r) for r in range(nof_layers)], g


def _active_layers(g, n_cb: int | None, nof_layers: int | None) -> int:
    """Check rows that can influence the message bits for a length-n_cb
    circular buffer (LBRM).  The extension parity columns are degree-1
    ([E | I] structure, verified for every lifted graph), so a row whose
    parity column lies entirely beyond n_cb receives only its OWN check's
    extrinsic there — its variable-to-check message is identically zero
    and the row never sends a nonzero message to data bits: skipping it is
    BIT-EXACT for the decoded message under layered min-sum
    (regression: tests/test_fused_dematch_decode.py).  Same formula as the
    reference's layer count for a truncated input
    (ldpc_decoder_impl.cpp:106-117, nof_layers = codeblock_length/Z - K_b);
    at the flagship's LBRM n_cb this cuts 46 layers to 16 (57 % of edges).
    """
    nl = g.m if nof_layers is None else nof_layers
    if n_cb is not None and n_cb < g.nof_codeword_bits:
        nl = min(nl, max(4, -(-(n_cb + 2 * g.z) // g.z) - g.kb))
    return nl


def _iteration_body(layers, edge_offsets, z, app_scr, r_scr, early_stop):
    """Shared layered-min-sum iteration body over the VMEM APP/R scratch
    (used by both the plain decode kernel and the fused dematch+decode
    kernel)."""

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

    return one_iteration


def _run_iterations(one_iteration, nof_iterations, early_stop):
    if early_stop:
        # Exit once an entire iteration saw every check satisfied for
        # every codeword in the tile (or the budget runs out).
        final_i, _ = jax.lax.while_loop(
            lambda c: jnp.logical_and(c[0] < nof_iterations, c[1] > 0),
            one_iteration,
            (jnp.zeros((), jnp.int32), jnp.ones((), jnp.int32)),
        )
        return final_i
    jax.lax.fori_loop(
        0, nof_iterations, lambda it, c: one_iteration((it, c))[1],
        jnp.zeros((), jnp.int32)
    )
    return jnp.full((), nof_iterations, jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bg", "z", "nof_iterations", "nof_layers", "batch_tile", "interpret",
        "early_stop", "bits_only", "n_cb"
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
    n_cb: int | None = None,
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

    n_cb: LBRM circular-buffer length — truncates the decoded graph to the
    check rows that can influence the message bits (see _active_layers;
    bit-exact for the message).  The a-posteriori output's truncated
    columns read 0.
    """
    g = graphs.get_graph(bg, z)
    nof_layers = _active_layers(g, n_cb, nof_layers)
    layers, _ = _edge_plan(bg, z, nof_layers)
    nb = g.n
    ncols = g.kb + max(4, nof_layers)
    width_in = min(llrs.shape[1], (ncols - 2) * z)
    # int8 LLRs stay int8 on the wire into VMEM (4x less HBM read traffic
    # at the 141-CB slot; the kernel clamps to +-64 after the in-VMEM cast,
    # numerically identical to the f32 path since int8 is within +-127).
    in_dtype = llrs.dtype if llrs.dtype == jnp.int8 else jnp.float32
    edge_count = sum(len(edges) for edges in layers)
    bt = _auto_batch_tile(z, ncols, edge_count,
                          width_in * (1 if in_dtype == jnp.int8 else 4),
                          batch_tile)
    batch = llrs.shape[0]
    pad_b = (-batch) % bt
    x = jnp.pad(llrs.astype(in_dtype), ((0, pad_b), (0, 0)))
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

        one_iteration = _iteration_body(layers, edge_offsets, z, app_scr,
                                        r_scr, early_stop)
        final_i = _run_iterations(one_iteration, nof_iterations, early_stop)
        if bits_only:
            # Emit only the hard-decision payload bits: the a-posteriori
            # f32 array is 13x the bytes and the decode was measured
            # HBM-bound on exactly that write at the x32 slot batch.
            app_out_ref[:] = (app_scr[:, : g.kb * z] < 0).astype(jnp.uint8)
        elif ncols < nb:
            app_out_ref[:, : ncols * z] = app_scr[:]
            app_out_ref[:, ncols * z :] = jnp.zeros(
                (bt, (nb - ncols) * z), jnp.float32)
        else:
            app_out_ref[:] = app_scr[:]
        iters_out_ref[:] = jnp.full_like(iters_out_ref, final_i)

    out_cols = g.kb * z if bits_only else nb * z
    out_dtype = jnp.uint8 if bits_only else jnp.float32
    app, iters = pl.pallas_call(
        kernel,
        grid=(nof_tiles,),
        in_specs=[pl.BlockSpec((bt, width_in), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((bt, out_cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x.shape[0], out_cols), out_dtype),
            jax.ShapeDtypeStruct((x.shape[0], 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, ncols * z), jnp.float32),
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


# ---- fused rate-dematch + decode ------------------------------------------

@functools.lru_cache(maxsize=None)
def _dematch_plane_plan(bg: int, z: int, k_prime: int, e: int, rv: int,
                        qm: int, n_cb: int):
    """Static copy plan for the in-kernel rate dematch, working directly on
    the qm de-interleave bit-planes (de[i*(E/qm)+j] = raw[j*qm+i], so plane
    b of the de-interleaved stream is raw[b::qm] — extracted OUTSIDE the
    kernel as one whole-stream strided slice; see sch._fused_decode).

    Returns [(chunk_idx, plane_b, lo, hi, buf_start)]: copy
    plane_b[:, lo:hi] to buffer positions [buf_start, buf_start+hi-lo),
    accumulating for chunk_idx > 0 (repetition).  Pure host metadata —
    every slice in the kernel is static (TS 38.212 §5.4.2 collapses to
    contiguous runs per redundancy version; reference counterpart
    ldpc_rate_dematcher_impl.cpp, re-designed gather-free for TPU).
    """
    from .rate_match import _chunk_segments

    epq = e // qm
    plan = []
    for ci, segs in enumerate(_chunk_segments(bg, z, k_prime, e, rv, n_cb)):
        for bs, ds, ln in segs:
            for b in range(qm):
                lo = max(ds, b * epq)
                hi = min(ds + ln, (b + 1) * epq)
                if hi > lo:
                    plan.append((ci, b, lo - b * epq, hi - b * epq,
                                 bs + (lo - ds)))
    return tuple(plan)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bg", "z", "k_prime", "e", "rv", "qm", "n_cb", "nof_iterations",
        "nof_layers", "batch_tile", "interpret", "early_stop",
    ),
)
def decode_dematch_pallas(
    llr_planes,
    bg: int,
    z: int,
    k_prime: int,
    e: int,
    rv: int,
    qm: int,
    n_cb: int | None = None,
    nof_iterations: int = 6,
    nof_layers: int | None = None,
    batch_tile: int = DEFAULT_BATCH_TILE,
    interpret: bool = False,
    early_stop: bool = False,
):
    """Rate dematch + layered min-sum decode fused in ONE VMEM pass.

    llr_planes: tuple of qm arrays (batch, e//qm) int8 — the de-interleave
    bit-planes of each codeblock's E-bit rate-matched span.  The kernel
    assembles the N-bit circular buffer (erasures 0, fillers +INPUT_CLAMP,
    repetition chunks accumulated then clamped — numerically identical to
    rate_dematch -> decode_pallas, which round-trips a (C, N) int8 buffer
    through HBM and paid ~0.21 ms/slot of XLA transpose/concat glue) and
    iterates entirely in VMEM.

    Returns (bits (batch, K_b*Z) uint8, nof_iters (batch,) int32).
    """
    g = graphs.get_graph(bg, z)
    if n_cb is None:
        n_cb = g.nof_codeword_bits
    nof_layers = _active_layers(g, n_cb, nof_layers)
    # The APP scratch must hold the whole assembled buffer [0, n_cb) even
    # if a caller narrows nof_layers below the n_cb-derived count.
    ncols = max(g.kb + max(4, nof_layers), -(-(n_cb + 2 * z) // z))
    layers, _ = _edge_plan(bg, z, nof_layers)
    plan = _dematch_plane_plan(bg, z, k_prime, e, rv, qm, n_cb)
    if any(ci > 0 for ci, *_ in plan):
        raise ValueError(
            "decode_dematch_pallas covers the no-repetition case only "
            "(E <= usable buffer); use rate_dematch + decode_pallas")
    f_start = k_prime - 2 * z
    f_end = g.kb * z - 2 * z
    epq = e // qm
    edge_count = sum(len(edges) for edges in layers)
    bt = _auto_batch_tile(z, ncols, edge_count, qm * epq, batch_tile)
    batch = llr_planes[0].shape[0]
    pad_b = (-batch) % bt
    planes = tuple(jnp.pad(p.astype(jnp.int8), ((0, pad_b), (0, 0)))
                   for p in llr_planes)
    nof_tiles = planes[0].shape[0] // bt

    edge_offsets = []
    total_edges = 0
    for edges in layers:
        edge_offsets.append(total_edges)
        total_edges += len(edges)

    nb = g.n

    def kernel(*refs):
        plane_refs = refs[:qm]
        bits_ref, iters_ref, app_scr, r_scr = refs[qm:]
        # Whole-block loads cast to f32 up front; every subsequent slice is
        # a VALUE slice (register relayout), never an unaligned int8 ref
        # access — Mosaic miscompiled lane-unaligned int8 ref slices when
        # this kernel first ran on hardware (bit-exact in interpret mode,
        # wrong on chip).
        pf = [plane_refs[b][:].astype(jnp.float32) for b in range(qm)]
        # Zero = punctured prefix + never-transmitted (erasure) positions.
        app_scr[:] = jnp.zeros_like(app_scr)
        for _ci, b, lo, hi, bs in plan:
            piece = jnp.clip(pf[b][:, lo:hi], -INPUT_CLAMP, INPUT_CLAMP)
            app_scr[:, 2 * z + bs : 2 * z + bs + (hi - lo)] = piece
        if f_end > f_start:
            # Filler bits are known zeros: saturated positive LLR.
            app_scr[:, 2 * z + f_start : 2 * z + f_end] = jnp.full(
                (bt, f_end - f_start), INPUT_CLAMP, jnp.float32)
        r_scr[:] = jnp.zeros_like(r_scr)

        one_iteration = _iteration_body(layers, edge_offsets, z, app_scr,
                                        r_scr, early_stop)
        final_i = _run_iterations(one_iteration, nof_iterations, early_stop)
        bits_ref[:] = (app_scr[:, : g.kb * z] < 0).astype(jnp.uint8)
        iters_ref[:] = jnp.full_like(iters_ref, final_i)

    bits, iters = pl.pallas_call(
        kernel,
        grid=(nof_tiles,),
        in_specs=[pl.BlockSpec((bt, epq), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * qm,
        out_specs=(
            pl.BlockSpec((bt, g.kb * z), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((planes[0].shape[0], g.kb * z), jnp.uint8),
            jax.ShapeDtypeStruct((planes[0].shape[0], 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, ncols * z), jnp.float32),
            pltpu.VMEM((bt, total_edges * z), jnp.float32),
        ],
        interpret=interpret,
    )(*planes)

    return bits[:batch], iters[:batch, 0]
