"""LDPC decoder: layered normalized min-sum (counterpart of the reference's
ldpc_decoder_generic/avx2/avx512, lib/phy/upper/channel_coding/ldpc/
ldpc_decoder_impl.cpp) — re-designed for TPU.

Layout: the a-posteriori LLRs live as one flat (batch, NB*Z + 1) f32 vector
(last slot is a scatter sink for padded edges).  Each check layer's
variable-node access — "pick block c, rotate by s" — is a single precomputed
flat gather index matrix (Dmax, Z), so one layer update is: gather,
extrinsic-subtract, two-level min reduction, scaled sign-magnitude update,
scatter.  Layers run under `lax.scan` (the schedule is inherently
sequential); iterations under `lax.fori_loop`; codewords batch in the
leading axis to fill the VPU.

Numerics follow the reference semantics: channel LLRs clamped to ±64 on
load (ldpc_decoder_impl.h:205), punctured systematic blocks enter as 0,
normalized min-sum scaling factor 0.8 (ldpc_decoder_impl.h:198), hard
decision bit = 1 iff LLR < 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import graphs

SCALING = 0.8
INPUT_CLAMP = 64.0


@functools.lru_cache(maxsize=None)
def _layer_tables(bg: int, z: int, nof_layers: int):
    """Precompute per-layer gather tables.

    Returns (flat_idx (L, Dmax, Z) int32, valid (L, Dmax, 1) bool).
    flat index = col*Z + (zpos + shift) % Z; padded edges point at the
    sink slot NB*Z.
    """
    g = graphs.get_graph(bg, z)
    rows = [g.row_edges(r) for r in range(nof_layers)]
    dmax = max(len(r) for r in rows)
    nb = g.n
    sink = nb * z
    idx = np.full((nof_layers, dmax, z), sink, dtype=np.int32)
    valid = np.zeros((nof_layers, dmax, 1), dtype=bool)
    zidx = np.arange(z)
    for l, edges in enumerate(rows):
        for e, (col, shift) in enumerate(edges):
            idx[l, e] = col * z + (zidx + shift) % z
            valid[l, e, 0] = True
    return idx, valid


@functools.partial(
    jax.jit, static_argnames=("bg", "z", "nof_iterations", "nof_layers")
)
def decode(
    llrs: jax.Array,
    bg: int,
    z: int,
    nof_iterations: int = 6,
    nof_layers: int | None = None,
):
    """Decode rate-dematched codeword LLRs.

    llrs: (batch, N) with N = (n-2)*Z — the circular-buffer positions
          (punctured 2Z systematic bits NOT included; they are re-inserted
          as zeros here).  Positive LLR means bit 0.
    Returns (bits (batch, K) uint8, app (batch, N_full) f32 final LLRs).
    """
    g = graphs.get_graph(bg, z)
    if nof_layers is None:
        nof_layers = g.m
    nb = g.n
    batch = llrs.shape[0]

    idx_np, valid_np = _layer_tables(bg, z, nof_layers)
    idx = jnp.asarray(idx_np)
    valid = jnp.asarray(valid_np)
    dmax = idx.shape[1]

    x = jnp.clip(llrs.astype(jnp.float32), -INPUT_CLAMP, INPUT_CLAMP)
    app = jnp.concatenate(
        [jnp.zeros((batch, 2 * z), jnp.float32), x, jnp.zeros((batch, 1), jnp.float32)],
        axis=-1,
    )  # (batch, NB*Z + 1)

    # The zero scaled by a data-derived scalar keeps r0's device-varying
    # type aligned with app under shard_map (psum/pcast rules).
    r0 = jnp.zeros((nof_layers, batch, dmax, z), jnp.float32) + 0.0 * x[0, 0]

    def layer_step(app, inputs):
        layer_idx, layer_valid, r_l = inputs  # (Dmax, Z), (Dmax, 1), (B, Dmax, Z)
        flat = layer_idx.reshape(-1)
        gathered = app[:, flat].reshape(batch, dmax, z)
        v = gathered - r_l
        absv = jnp.where(layer_valid, jnp.abs(v), jnp.inf)
        neg = jnp.where(layer_valid, v < 0, False)
        total_sign = jnp.where(jnp.sum(neg, axis=1, keepdims=True) % 2 == 1, -1.0, 1.0)
        m1 = jnp.min(absv, axis=1, keepdims=True)
        is_min = absv == m1
        # Second minimum: if the minimum occurs on 2+ edges, every edge's
        # "min over the others" equals m1; otherwise mask the unique min.
        m2 = jnp.min(jnp.where(is_min, jnp.inf, absv), axis=1, keepdims=True)
        nof_min = jnp.sum(is_min, axis=1, keepdims=True)
        m2 = jnp.where((nof_min > 1) | jnp.isinf(m2), m1, m2)
        mag = jnp.where(is_min, m2, m1)
        sign_v = jnp.where(v < 0, -1.0, 1.0)
        r_new = SCALING * total_sign * sign_v * mag
        r_new = jnp.where(layer_valid, r_new, 0.0)
        newval = v + r_new
        out = jnp.where(layer_valid, newval, gathered).reshape(batch, -1)
        app = app.at[:, flat].set(out)
        return app, r_new

    def iteration(_, carry):
        app, r = carry
        app, r = jax.lax.scan(layer_step, app, (idx, valid, r))
        return app, r

    app, r = jax.lax.fori_loop(0, nof_iterations, iteration, (app, r0))

    full = app[:, : nb * z]
    bits = (full[:, : g.kb * z] < 0).astype(jnp.uint8)
    return bits, full
