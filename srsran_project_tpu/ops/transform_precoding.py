"""Transform precoding for DFT-s-OFDM PUSCH (TS 38.211 §6.3.1.4).

Counterpart of the reference's transform_precoder_dft_impl
(lib/phy/generic_functions/transform_precoding/transform_precoder_dft_impl.cpp).
Precode: y = DFT_M(x) / sqrt(M) over each symbol's M = 12 * n_prb samples;
deprecode is the inverse.  Valid M are 2^a 3^b 5^c multiples of 12
(TS 38.211 §6.3.1.4); jnp.fft handles all of them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def is_valid_nof_prb(n_prb: int) -> bool:
    n = n_prb
    for p in (2, 3, 5):
        while n % p == 0:
            n //= p
    return n == 1


@functools.partial(jax.jit, static_argnames=())
def precode(x: jax.Array) -> jax.Array:
    """(..., M) data symbols -> (..., M) frequency-domain samples."""
    m = x.shape[-1]
    return (jnp.fft.fft(x, axis=-1) / np.sqrt(m)).astype(jnp.complex64)


@functools.partial(jax.jit, static_argnames=())
def deprecode(y: jax.Array) -> jax.Array:
    """(..., M) frequency-domain samples -> (..., M) data symbols."""
    m = y.shape[-1]
    return (jnp.fft.ifft(y, axis=-1) * np.sqrt(m)).astype(jnp.complex64)


def deprecode_noise_var(noise_var: jax.Array, m: int) -> jax.Array:
    """The IDFT spreads each symbol's noise evenly; per-sample variance is
    the average over the M subcarriers."""
    return jnp.broadcast_to(jnp.mean(noise_var, axis=-1, keepdims=True), noise_var.shape[:-1] + (m,))
