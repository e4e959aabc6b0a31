"""CRC calculators for 5G NR (TS 38.212 §5.1).

Counterpart of the reference's crc_calculator_{lut,clmul,neon}_impl
(lib/phy/upper/channel_coding/crc_calculator_lut_impl.cpp) — re-designed for
TPU: a CRC over GF(2) is a linear map of the message bits, so for a fixed
message length L the checksum is ``(bits @ A) mod 2`` where ``A`` is an
(L, crc_len) 0/1 matrix whose row i is the CRC of the i-th unit vector.
That matmul runs on the MXU in f32 (exact for L < 2^24) and batches over
codeblocks for free.  The generator matrices are cached per (poly, L).

A pure-Python long-division model (`crc_ref`) is the test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Generator polynomials, including the leading x^len term (TS 38.212 §5.1).
POLY_CRC24A = (0x1864CFB, 24)
POLY_CRC24B = (0x1800063, 24)
POLY_CRC24C = (0x1B2B117, 24)
POLY_CRC16 = (0x11021, 16)
POLY_CRC11 = (0xE21, 11)
POLY_CRC6 = (0x61, 6)

POLYS = {
    "24A": POLY_CRC24A,
    "24B": POLY_CRC24B,
    "24C": POLY_CRC24C,
    "16": POLY_CRC16,
    "11": POLY_CRC11,
    "6": POLY_CRC6,
}


def crc_ref(bits, name: str) -> np.ndarray:
    """Bit-exact long-division CRC (spec model / oracle).

    bits: 1-D array-like of 0/1, MSB-first message.
    Returns the crc as a 0/1 uint8 array of length crc_len, MSB first.
    """
    poly, n = POLYS[name]
    reg = 0
    for b in np.asarray(bits, dtype=np.uint8):
        reg = (reg << 1) | int(b)
        if reg >> n:
            reg ^= poly
    # Flush n zero bits.
    for _ in range(n):
        reg <<= 1
        if reg >> n:
            reg ^= poly
    return np.array([(reg >> (n - 1 - i)) & 1 for i in range(n)], dtype=np.uint8)


@functools.lru_cache(maxsize=None)
def _generator_matrix(name: str, length: int) -> np.ndarray:
    """(length, crc_len) uint8 matrix A with A[i] = crc(e_i).

    Built by stepping x^(crc_len + k) mod g(x) from k = 0 upwards: the last
    message bit contributes x^crc_len mod g, the one before x^(crc_len+1),
    etc.
    """
    poly, n = POLYS[name]
    mask = (1 << n) - 1
    out = np.empty((length, n), dtype=np.uint8)
    r = 1  # x^0
    # Advance to x^n mod g.
    for _ in range(n):
        r <<= 1
        if r >> n:
            r ^= poly
    for k in range(length):
        row = length - 1 - k
        out[row] = [(r >> (n - 1 - i)) & 1 for i in range(n)]
        r <<= 1
        if r >> n:
            r ^= poly
    return out


def generator_matrix(name: str, length: int) -> np.ndarray:
    return _generator_matrix(name, length)


@functools.partial(jax.jit, static_argnames=("name",))
def crc(bits: jax.Array, name: str) -> jax.Array:
    """CRC of messages via GF(2) matmul on the MXU.

    bits: (..., L) 0/1 array (any integer or float dtype).
    Returns (..., crc_len) uint8 CRC bits, MSB first.

    Exactness: the f32 accumulation is an exact integer count of set
    positions (< 2^24 for all NR message lengths), reduced mod 2.
    """
    length = bits.shape[-1]
    a = jnp.asarray(generator_matrix(name, length), dtype=jnp.float32)
    acc = jnp.matmul(bits.astype(jnp.float32), a, preferred_element_type=jnp.float32)
    return (acc.astype(jnp.int32) & 1).astype(jnp.uint8)


def crc_append(bits: jax.Array, name: str) -> jax.Array:
    """Message with CRC attached: (..., L) -> (..., L + crc_len)."""
    c = crc(bits, name)
    return jnp.concatenate([bits.astype(jnp.uint8), c], axis=-1)


def crc_check(bits_with_crc: jax.Array, name: str) -> jax.Array:
    """Boolean per-message CRC pass/fail for (..., L + crc_len) inputs."""
    c = crc(bits_with_crc, name)
    return jnp.all(c == 0, axis=-1)
