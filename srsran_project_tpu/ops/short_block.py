"""Short-block codes for UCI of 1-11 bits (TS 38.212 §5.3.3 / §5.4.3).

Counterpart of the reference's short_block_encoder/detector
(lib/phy/upper/channel_coding/short/short_block_{encoder,detector}_impl.cpp).
K in [3, 11] uses the RM(32, K) code of Table 5.3.3.3-1; K in {1, 2} uses
the tiny repetition/simplex codes.  The ML detector is a single MXU matmul
of the LLR vector against all 2^K candidate codewords — the TPU-native
replacement for the reference's SIMD correlation search.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# TS 38.212 Table 5.3.3.3-1: 11 basis sequences M_{n,k} of length 32.
BASIS = np.array(
    [
        [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
        [1, 1, 0, 0, 1, 1, 0, 0, 1, 0, 0, 1, 0, 1, 0, 1, 1, 0, 1, 0, 0, 1, 0, 1, 1, 1, 0, 1, 0, 0, 1, 0],
        [0, 1, 0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 1, 1, 0, 1, 1, 1, 1, 1, 0],
        [0, 0, 1, 1, 1, 0, 0, 1, 1, 1, 0, 0, 1, 1, 0, 0, 0, 1, 1, 0, 0, 1, 0, 0, 1, 0, 1, 1, 0, 1, 1, 0],
        [0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0, 1, 1, 1, 0, 0, 0, 1, 1, 1, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 0],
        [0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 1, 1, 0, 0, 0, 1, 1, 0, 1, 1, 1, 0, 0, 0, 1, 1, 0, 0, 1, 1, 1, 0],
        [0, 0, 0, 0, 1, 1, 0, 1, 1, 0, 1, 0, 1, 1, 1, 1, 0, 0, 1, 0, 0, 0, 1, 0, 1, 1, 0, 1, 0, 1, 1, 0],
        [0, 0, 1, 1, 0, 1, 1, 1, 0, 0, 0, 1, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 1, 1, 0, 1, 1, 1, 1, 1, 0],
        [0, 1, 1, 0, 0, 0, 1, 0, 1, 1, 1, 0, 1, 1, 0, 1, 1, 0, 0, 0, 0, 1, 0, 1, 1, 0, 1, 1, 0, 0, 1, 0],
        [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 1, 1, 1, 1, 0, 1, 0, 0, 0, 0, 1, 0],
    ],
    dtype=np.uint8,
)


@functools.lru_cache(maxsize=None)
def _mother_codewords(k: int) -> np.ndarray:
    """(2^K, Ncode) all codewords of the K-bit short block code."""
    if k == 1:
        return np.array([[0], [1]], dtype=np.uint8)
    if k == 2:
        # Index decoding is LSB-first everywhere (matches detect()).
        msgs = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], dtype=np.uint8)
        return np.stack([msgs[:, 0], msgs[:, 1], msgs[:, 0] ^ msgs[:, 1]], axis=1)
    idx = np.arange(1 << k)
    msgs = ((idx[:, None] >> np.arange(k)) & 1).astype(np.uint8)  # a_k LSB-first? see encode
    return (msgs @ BASIS[:k]) % 2


def encode(msg: jax.Array, e: int) -> jax.Array:
    """(..., K) bits -> (..., E) coded bits (rate-matched by repetition).

    K = msg.shape[-1] in [1, 11]; for K in [3, 11] codeword
    d(n) = sum_k a_k M_{n,k} mod 2 (TS 38.212 §5.3.3.3).
    """
    k = msg.shape[-1]
    msg = msg.astype(jnp.uint8)
    if k == 1:
        base = msg
    elif k == 2:
        base = jnp.concatenate([msg, (msg[..., :1] ^ msg[..., 1:2])], axis=-1)
    else:
        basis = jnp.asarray(BASIS[:k].astype(np.float32))
        base = (
            jnp.matmul(msg.astype(jnp.float32), basis, preferred_element_type=jnp.float32)
            .astype(jnp.int32)
            & 1
        ).astype(jnp.uint8)
    n = base.shape[-1]
    reps = -(-e // n)
    tiled = jnp.tile(base, (1,) * (base.ndim - 1) + (reps,))
    return tiled[..., :e]


@functools.partial(jax.jit, static_argnames=("k", "e"))
def detect(llrs: jax.Array, k: int, e: int):
    """ML detection of a K-bit short block from (..., E) LLRs.

    Returns (bits (..., K) uint8, metric (...,) float32 in [0, 1] — the
    normalized correlation of the winning candidate).
    """
    cw = _mother_codewords(k)
    n = cw.shape[1]
    # Fold repeated positions back onto the mother codeword (sum LLRs).
    reps = -(-e // n)
    pad = reps * n - e
    x = jnp.pad(llrs.astype(jnp.float32), [(0, 0)] * (llrs.ndim - 1) + [(0, pad)])
    folded = x.reshape(x.shape[:-1] + (reps, n)).sum(axis=-2)  # (..., n)
    signs = jnp.asarray(1.0 - 2.0 * cw.astype(np.float32))  # (2^K, n)
    scores = jnp.matmul(folded, signs.T, preferred_element_type=jnp.float32)
    best = jnp.argmax(scores, axis=-1)
    msgs = ((np.arange(1 << k)[:, None] >> np.arange(k)) & 1).astype(np.uint8)
    bits = jnp.asarray(msgs)[best]
    denom = jnp.sum(jnp.abs(folded), axis=-1) + 1e-9
    metric = jnp.take_along_axis(scores, best[..., None], axis=-1)[..., 0] / denom
    return bits, metric
