"""EVM calculator (counterpart of the reference's evm_calculator in
lib/phy/upper/channel_modulation): error vector magnitude between equalized
symbols and the nearest (or known) constellation points."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mapper import Modulation, bits_per_symbol, constellation


@functools.partial(jax.jit, static_argnames=("mod",))
def evm(symbols: jax.Array, mod: Modulation, reference: jax.Array | None = None) -> jax.Array:
    """RMS EVM of (..., S) symbols.

    With `reference` (known transmitted symbols): exact EVM.  Without:
    decision-directed EVM against the nearest constellation point.
    """
    if reference is None:
        lut = jnp.asarray(constellation(mod))
        d2 = jnp.abs(symbols[..., None] - lut) ** 2
        err2 = jnp.min(d2, axis=-1)
    else:
        err2 = jnp.abs(symbols - reference) ** 2
    return jnp.sqrt(jnp.mean(err2, axis=-1))


@functools.partial(jax.jit, static_argnames=("mod",))
def hard_decision_bits(symbols: jax.Array, mod: Modulation) -> jax.Array:
    """Nearest-point hard demap: (..., S) -> (..., S*Qm) bits."""
    lut = jnp.asarray(constellation(mod))
    idx = jnp.argmin(jnp.abs(symbols[..., None] - lut) ** 2, axis=-1)
    qm = bits_per_symbol(mod)
    shifts = jnp.arange(qm - 1, -1, -1, dtype=idx.dtype)
    bits = (idx[..., None] >> shifts) & 1
    return bits.reshape(symbols.shape[:-1] + (symbols.shape[-1] * qm,)).astype(jnp.uint8)
