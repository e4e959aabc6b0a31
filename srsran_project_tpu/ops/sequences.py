"""Low-PAPR (Zadoff-Chu family) sequence generation (TS 38.211 §5.2.2).

Counterpart of the reference's low_papr_sequence_generator_impl
(lib/phy/upper/sequence_generators/low_papr_sequence_generator_impl.cpp).
Sequences are static per (u, v, length), so they are built host-side in
float64 and cached; the cyclic-shift phase ramp exp(j*alpha*n) is applied on
device (alpha may be traced).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=1)
def _phi_tables():
    d = np.load(os.path.join(os.path.dirname(__file__), "_low_papr_phi.npz"))
    return {6: d["phi6"], 12: d["phi12"], 18: d["phi18"], 24: d["phi24"]}


def _largest_prime_below(n: int) -> int:
    def is_prime(x):
        if x < 2:
            return False
        for p in range(2, int(x**0.5) + 1):
            if x % p == 0:
                return False
        return True

    for c in range(n - 1, 1, -1):
        if is_prime(c):
            return c
    raise ValueError(n)


@functools.lru_cache(maxsize=None)
def base_sequence(u: int, v: int, length: int) -> np.ndarray:
    """r̄_{u,v}(n), complex128 host array of the given length.

    Lengths 6/12/18/24 use the phi tables (Tables 5.2.2.2-1..4); length 30
    uses the closed form; >= 36 uses the cyclically-extended ZC sequence.
    """
    if length in (6, 12, 18, 24):
        phi = _phi_tables()[length][u].astype(np.float64)
        return np.exp(1j * phi * np.pi / 4)
    if length == 30:
        n = np.arange(30, dtype=np.float64)
        arg = -np.pi * (u + 1) * (n + 1) * (n + 2) / 31.0
        return np.exp(1j * arg)
    assert length >= 36 and length % 6 == 0, length
    n_zc = _largest_prime_below(length)
    qbar = n_zc * (u + 1) / 31.0
    q = int(np.floor(qbar + 0.5)) + v * (-1) ** int(np.floor(2 * qbar))
    m = np.arange(length, dtype=np.float64) % n_zc
    arg = -np.pi * q * m * (m + 1) / n_zc
    return np.exp(1j * arg)


@functools.partial(jax.jit, static_argnames=("u", "v", "length"))
def generate(u: int, v: int, length: int, alpha: jax.Array) -> jax.Array:
    """r^{(alpha)}_{u,v}(n) = e^{j*alpha*n} * r̄_{u,v}(n); alpha may be traced.

    alpha: scalar or (...,) radians-per-sample cyclic shift.
    Returns (..., length) complex64.
    """
    base = jnp.asarray(base_sequence(u, v, length).astype(np.complex64))
    n = jnp.arange(length, dtype=jnp.float32)
    a = jnp.asarray(alpha, jnp.float32)[..., None]
    ramp = jnp.exp(1j * a * n)
    return (ramp * base).astype(jnp.complex64)


def group_hopping_params(
    n_id: int, slot_in_frame: int, symbol: int, hopping: str = "neither"
) -> tuple[int, int]:
    """(u, v) sequence group / number for PUCCH low-PAPR sequences
    (TS 38.211 §6.3.2.2.1; reference low_papr_sequence usage in
    lib/phy/upper/channel_processors/pucch/).

    hopping:
    - "neither": u = n_id mod 30, v = 0.
    - "enable" (group hopping): f_gh from 8 Gold bits at position
      8*(14*n_s + l), c_init = floor(n_id/30); v = 0.
    - "disable" (sequence hopping): u = n_id mod 30; v = c(14*n_s + l)
      with c_init = 32*floor(n_id/30) + n_id mod 30.
    """
    from . import scrambling

    if hopping == "neither":
        return n_id % 30, 0
    if hopping == "enable":
        pos = 8 * (14 * slot_in_frame + symbol)
        bits = scrambling.gold_ref(n_id // 30, pos + 8)[pos : pos + 8]
        f_gh = int(sum(int(b) << m for m, b in enumerate(bits))) % 30
        return (f_gh + n_id) % 30, 0
    if hopping == "disable":
        pos = 14 * slot_in_frame + symbol
        c_init = 32 * (n_id // 30) + (n_id % 30)
        v = int(scrambling.gold_ref(c_init, pos + 1)[pos])
        return n_id % 30, v
    raise ValueError(f"unknown hopping mode {hopping!r}")
