"""Host<->device IO shims for transports that cannot move every dtype.

The TPU tunnel used by this build (axon) cannot transfer ``bool`` or
``complex64`` buffers in either direction (the transfer raises
UNIMPLEMENTED or hangs), while int8/uint8/int32/float32/bfloat16 move
fine and complex/bool math *on device* is fully functional.  These
helpers keep bool/complex from ever crossing the host<->device boundary:

- ``to_host(x)``   — np.asarray that reads bool via uint8 and complex via
                     (real, imag) float32 planes.
- ``to_device(x)`` — device_put that writes complex via float32 planes
                     recombined on device and bool via uint8.

On healthy backends (CPU tests, real pods) they reduce to plain
``np.asarray`` / ``jax.device_put``; the shim engages only for arrays on
non-CPU devices, so the cost on the hot CPU test path is one isinstance
check.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.cache
def _split():
    return jax.jit(lambda x: (jnp.real(x).astype(jnp.float32),
                              jnp.imag(x).astype(jnp.float32)))


@functools.cache
def _as_u8():
    return jax.jit(lambda x: x.astype(jnp.uint8))


@functools.cache
def _combine():
    return jax.jit(lambda re, im: jax.lax.complex(re, im))


def _non_cpu(x: jax.Array) -> bool:
    try:
        dev = next(iter(x.devices()))
    except Exception:
        return False
    return dev.platform != "cpu"


def to_host(x) -> np.ndarray:
    """Read a device array to numpy without bool/complex on the wire."""
    if not isinstance(x, jax.Array) or not _non_cpu(x):
        return np.asarray(x)
    dt = x.dtype
    if dt == jnp.bool_:
        return np.asarray(_as_u8()(x)).astype(np.bool_)
    if jnp.issubdtype(dt, jnp.complexfloating):
        re, im = _split()(x)
        out = np.empty(x.shape, np.complex64)
        out.real = np.asarray(re)
        out.imag = np.asarray(im)
        return out
    return np.asarray(x)


def to_device(x) -> jax.Array:
    """device_put without bool/complex on the wire."""
    if isinstance(x, jax.Array):
        return x  # already resident
    a = np.asarray(x)
    if jax.default_backend() == "cpu":
        return jax.device_put(a)
    if a.dtype == np.bool_:
        return jax.device_put(a.astype(np.uint8)).astype(jnp.bool_)
    if np.issubdtype(a.dtype, np.complexfloating):
        re = jax.device_put(np.ascontiguousarray(a.real, dtype=np.float32))
        im = jax.device_put(np.ascontiguousarray(a.imag, dtype=np.float32))
        return _combine()(re, im)
    return jax.device_put(a)


@functools.cache
def _zeros_c64(shape: tuple):
    return jax.jit(lambda: jnp.zeros(shape, jnp.complex64))


def zeros_complex(shape) -> jax.Array:
    """Device-generated complex64 zeros.  Eager jnp.zeros(..., complex64)
    materializes the complex fill constant through a host->device transfer,
    which this tunnel cannot carry (and which poisons the session); a
    compiled fill never touches the wire."""
    return _zeros_c64(tuple(shape))()
