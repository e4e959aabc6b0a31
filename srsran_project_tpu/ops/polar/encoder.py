"""Polar encoder + rate matcher (TS 38.212 §5.3.1.1 / §5.4.1), batched.

Counterpart of the reference's polar_encoder_impl / polar_allocator_impl /
polar_rate_matcher_impl — one jitted program per static PolarCode: allocate
info bits into the reliable positions, apply the butterfly transform
x = u F^{xor n} as log2(N) fully-vectorized XOR stages, then gather the
rate-matched output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import code as code_mod
from . import tables


def polar_transform(u: jax.Array) -> jax.Array:
    """x = u F^{xor n} over GF(2); u: (..., N) uint8.  Self-inverse."""
    n = u.shape[-1]
    stages = n.bit_length() - 1
    x = u
    for s in range(stages):
        step = 1 << s
        xs = x.reshape(x.shape[:-1] + (n // (2 * step), 2, step))
        upper = xs[..., 0, :] ^ xs[..., 1, :]
        x = jnp.stack([upper, xs[..., 1, :]], axis=-2).reshape(x.shape[:-1] + (n,))
    return x


@functools.partial(jax.jit, static_argnames=("code", "interleave_input"))
def encode(
    msg: jax.Array, code: code_mod.PolarCode, interleave_input: bool = False
) -> jax.Array:
    """(..., K) message bits -> (..., E) rate-matched coded bits.

    interleave_input: True for DL (PDCCH/PBCH, I_IL = 1).
    """
    k = code.k
    if interleave_input:
        pi = jnp.asarray(tables.input_interleaver(k))
        msg = msg[..., pi]
    u = jnp.zeros(msg.shape[:-1] + (code.nval,), dtype=jnp.uint8)
    u = u.at[..., jnp.asarray(np.asarray(code.info_set, dtype=np.int32))].set(
        msg.astype(jnp.uint8)
    )
    if code.pc_set:
        # PC bits are static GF(2) combinations of the message bits.
        m = jnp.asarray(code_mod.pc_masks(code))
        pc_vals = (msg.astype(jnp.uint8) @ m.T) & 1
        u = u.at[..., jnp.asarray(np.asarray(code.pc_set, np.int32))].set(pc_vals)
    d = polar_transform(u)
    sel = jnp.asarray(code_mod.rate_match_indices(code))
    return d[..., sel]


@functools.partial(jax.jit, static_argnames=("code",))
def rate_dematch_llrs(llrs: jax.Array, code: code_mod.PolarCode) -> jax.Array:
    """(..., E) float LLRs -> (..., N) decoder-input LLRs.

    Repetition adds; puncturing leaves untransmitted bits at 0 (unknown);
    shortening sets them to a large positive value (known zero).
    """
    sel = jnp.asarray(code_mod.rate_match_indices(code))
    n = code.nval
    base = jnp.zeros(llrs.shape[:-1] + (n,), dtype=jnp.float32)
    out = base.at[..., sel].add(llrs.astype(jnp.float32))
    if code.rm_mode == "shortening":
        jn = code_mod.rate_match_indices(code)
        known = np.setdiff1d(np.arange(n), jn)
        out = out.at[..., jnp.asarray(known)].set(1e9)
    return out
