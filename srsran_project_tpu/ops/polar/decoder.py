"""Polar decoder: simplified successive cancellation (SSC), batched.

Counterpart of the reference's polar_decoder_impl
(lib/phy/upper/channel_coding/polar/polar_decoder_impl.h:39-59 — node types
RATE_0 / RATE_R / RATE_1, no list decoding).  The recursion over the code
tree happens at trace time per static PolarCode: rate-0 subtrees emit
constants, rate-1 subtrees collapse to an elementwise hard decision (exact
for SC), and only mixed nodes generate f/g stages.  All tensor ops are
batched over codewords; there is no data-dependent control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import code as code_mod
from .encoder import polar_transform


def _f(a: jax.Array, b: jax.Array) -> jax.Array:
    """Check-node LLR combine (min-sum approximation)."""
    return jnp.sign(a) * jnp.sign(b) * jnp.minimum(jnp.abs(a), jnp.abs(b))


def _g(a: jax.Array, b: jax.Array, u_left: jax.Array) -> jax.Array:
    """Variable-node combine given the left partial sum."""
    return b + (1.0 - 2.0 * u_left.astype(a.dtype)) * a


@functools.partial(jax.jit, static_argnames=("code",))
def decode(llrs: jax.Array, code: code_mod.PolarCode) -> jax.Array:
    """(..., N) LLRs (positive = bit 0) -> (..., K) message bits.

    When the code carries PC bits (UCI 12<=A<=19), subtrees containing a PC
    position are expanded to leaves and the PC decision is forced to the
    XOR of the previously-decoded message bits in the same mod-5 residue
    class — the closed form of the spec's 5-bit cyclic register, tracked
    here as five batched accumulator bits (dynamically-frozen SC)."""
    nval = code.nval
    assert llrs.shape[-1] == nval
    frozen = np.ones(nval, dtype=bool)
    frozen[np.asarray(code.info_set)] = False
    pc = frozenset(code.pc_set)
    u_parts: dict[int, jax.Array] = {}
    batch = llrs.shape[:-1]
    # acc[r] = XOR of decoded message bits at positions p = r (mod 5) so far.
    acc = [jnp.zeros(batch, jnp.uint8) for _ in range(5)] if pc else None

    def rec(llr: jax.Array, lo: int, size: int) -> jax.Array:
        node_frozen = frozen[lo : lo + size]
        has_pc = any(q in pc for q in range(lo, lo + size)) if pc else False
        if node_frozen.all() and not has_pc:
            return jnp.zeros(batch + (size,), jnp.uint8)
        if size == 1:
            if lo in pc:
                u = acc[lo % 5][..., None]
            elif node_frozen[0]:
                u = jnp.zeros(batch + (1,), jnp.uint8)
            else:
                u = (llr < 0).astype(jnp.uint8)
                if acc is not None:
                    acc[lo % 5] = acc[lo % 5] ^ u[..., 0]
            u_parts[lo] = u
            return u
        if not node_frozen.any() and not has_pc:
            x = (llr < 0).astype(jnp.uint8)
            u = polar_transform(x)
            u_parts[lo] = u
            if acc is not None:
                for r in range(5):
                    js = [j for j in range(size) if (lo + j) % 5 == r]
                    if js:
                        contrib = u[..., jnp.asarray(js, np.int32)]
                        acc[r] = acc[r] ^ (jnp.sum(contrib, axis=-1) & 1)
            return x
        half = size // 2
        a, b = llr[..., :half], llr[..., half:]
        left = rec(_f(a, b), lo, half)
        right = rec(_g(a, b, left), lo + half, half)
        return jnp.concatenate([left ^ right, right], axis=-1)

    rec(llrs.astype(jnp.float32), 0, nval)

    # Assemble u_hat over the full block, then select the info positions.
    u_full = jnp.zeros(batch + (nval,), jnp.uint8)
    for lo, part in u_parts.items():
        u_full = u_full.at[..., lo : lo + part.shape[-1]].set(part)
    return u_full[..., jnp.asarray(np.asarray(code.info_set, np.int32))]
