"""Lower-PHY sample-domain helpers: amplitude control and PRACH OFDM
demodulation.

Counterparts of the reference's amplitude_controller_clipping_impl
(lib/phy/lower/amplitude_controller/amplitude_controller_clipping_impl.cpp)
and ofdm_prach_demodulator_impl (lib/phy/lower/modulation/
ofdm_prach_demodulator_impl.h:37).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("enable_clipping",))
def amplitude_control(
    samples: jax.Array,
    gain_db: float | jax.Array = 0.0,
    full_scale: float = 1.0,
    ceiling_db: float | jax.Array = -0.1,
    enable_clipping: bool = True,
):
    """Apply gain and (optionally) clip the complex envelope.

    Returns (samples, metrics dict with avg/peak power dBFS and clipping
    probability), mirroring the reference's amplitude_controller metrics.
    """
    g = 10.0 ** (jnp.asarray(gain_db, jnp.float32) / 20.0)
    x = samples * g.astype(samples.dtype)
    mag = jnp.abs(x)
    avg_pw = jnp.mean(mag**2)
    peak_pw = jnp.max(mag**2)
    ceiling = full_scale * 10.0 ** (jnp.asarray(ceiling_db, jnp.float32) / 20.0)
    clipped = mag > ceiling
    if enable_clipping:
        scale = jnp.where(clipped, ceiling / jnp.maximum(mag, 1e-12), 1.0)
        x = x * scale.astype(x.dtype)
    metrics = {
        "avg_power_dbfs": 10.0 * jnp.log10(jnp.maximum(avg_pw, 1e-12) / full_scale**2),
        "peak_power_dbfs": 10.0 * jnp.log10(jnp.maximum(peak_pw, 1e-12) / full_scale**2),
        "clipping_prob": jnp.mean(clipped.astype(jnp.float32)),
    }
    return x, metrics


@functools.partial(jax.jit, static_argnames=("l_ra", "dft_size", "nof_symbols", "cp_samples", "k_offset"))
def prach_demodulate(
    samples: jax.Array,
    l_ra: int = 839,
    dft_size: int = 4096,
    nof_symbols: int = 1,
    cp_samples: int = 3168,
    k_offset: int = 0,
):
    """Extract the frequency-domain PRACH preamble from time samples.

    samples: (..., cp_samples + nof_symbols*dft_size) baseband at the PRACH
    sampling grid (preamble SCS).  Repeated symbols are coherently averaged;
    returns (..., L_RA) the preamble subcarriers starting at k_offset
    relative to DC (negative-first ordering handled by the caller's offset).
    """
    body = samples[..., cp_samples:]
    syms = body.reshape(body.shape[:-1] + (nof_symbols, dft_size))
    spec = jnp.fft.fft(syms, axis=-1) / np.sqrt(dft_size)
    avg = spec.mean(axis=-2)
    idx = (k_offset + np.arange(l_ra)) % dft_size
    return avg[..., jnp.asarray(idx.astype(np.int32))]
