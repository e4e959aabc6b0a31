"""Subcarrier-sharded channel estimation with halo exchange.

The north-star's sequence-parallel axis (SURVEY.md §5.7): a wide carrier's
subcarriers shard across devices; per-RE work (LS, interpolation) is local,
and the only communication is the raised-cosine smoothing filter's halo at
shard boundaries — exchanged with `jax.lax.ppermute` over the mesh (the
overlap-save pattern; XLA maps it onto ICI).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.estimator import _rc_filter_taps


def _halo_exchange(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Append neighbors' edge columns: (..., n) -> (..., halo + n + halo).

    Edge shards replicate their own boundary (edge-hold, matching the
    single-device convolution's edge padding).
    """
    idx = jax.lax.axis_index(axis_name)
    size = jax.lax.axis_size(axis_name)
    left_edge = x[..., :halo]
    right_edge = x[..., -halo:]
    # Receive the right edge of the left neighbor and vice versa.
    from_left = jax.lax.ppermute(right_edge, axis_name,
                                 [(i, (i + 1) % size) for i in range(size)])
    from_right = jax.lax.ppermute(left_edge, axis_name,
                                  [(i, (i - 1) % size) for i in range(size)])
    # Outermost shards: replicate own edge instead of wrapping around.
    from_left = jnp.where(idx == 0, jnp.repeat(x[..., :1], halo, axis=-1), from_left)
    from_right = jnp.where(idx == size - 1, jnp.repeat(x[..., -1:], halo, axis=-1), from_right)
    return jnp.concatenate([from_left, x, from_right], axis=-1)


def smooth_freq_sharded(h_pilots: jax.Array, mesh: Mesh, axis: str = "dp") -> jax.Array:
    """RC-filter smoothing of pilot estimates sharded along the last axis.

    h_pilots: (..., n_pilots) complex, sharded on `axis` over the mesh.
    Equivalent (up to edge handling at the global boundary) to the
    single-device ops.estimator._smooth_freq.
    """
    taps = _rc_filter_taps()
    halo = len(taps) // 2

    def local(block):
        ext = _halo_exchange(block, halo, axis)
        w = jnp.asarray(taps)
        out = jnp.zeros_like(block)
        n = block.shape[-1]
        for i in range(len(taps)):
            out = out + w[i] * ext[..., i : i + n]
        return out

    spec = P(*([None] * (h_pilots.ndim - 1) + [axis]))
    fn = jax.shard_map(local, mesh=mesh, in_specs=spec, out_specs=spec)
    return fn(h_pilots)


def smooth_freq_reference(h: jax.Array) -> jax.Array:
    """Single-device smoothing with the same edge handling (oracle)."""
    taps = _rc_filter_taps()
    halo = len(taps) // 2
    hp = jnp.concatenate(
        [jnp.repeat(h[..., :1], halo, axis=-1), h, jnp.repeat(h[..., -1:], halo, axis=-1)],
        axis=-1,
    )
    w = jnp.asarray(taps)
    out = jnp.zeros_like(h)
    for i in range(len(taps)):
        out = out + w[i] * hp[..., i : i + h.shape[-1]]
    return out
