"""Gold-sequence pseudo-random generator and scrambling (TS 38.211 §5.2.1).

Counterpart of the reference's pseudo_random_generator_impl
(lib/phy/upper/sequence_generators/pseudo_random_generator_impl.cpp) with its
x1/x2 LFSRs and fast-advance — re-designed for TPU as a *linear-algebra*
generator:

  c(n) = x1(n + Nc) XOR x2(n + Nc),  Nc = 1600

x1 never depends on the seed, so its (length-Nmax) output is a precomputed
constant.  The x2 LFSR is linear over GF(2) in its 31-bit initial state, so
x2(n + Nc) = XOR over set bits i of c_init of S_i(n), where S_i is the
sequence seeded with the i-th unit vector.  We precompute the 31 basis
sequences once (NumPy, bit-packed), and a jit-traced sequence evaluation is
then 31 predicated XORs of byte arrays — no sequential LFSR on device, seeds
may be traced values (per-UE RNTIs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NC = 1600
_NBITS = 31

# Maximum sequence length materialized for the basis tables.  Large enough for
# the largest NR codeword scrambling run (273 PRB * 12 * 14 * 8 bits * 4
# layers ~ 1.47 Mbit).  Tables are built lazily and grow on demand.
_DEFAULT_MAX_LEN = 1 << 14


def _lfsr_fill(x: np.ndarray, taps) -> None:
    """Fill x[..., 31:] from x[..., :31] with s[i+31] = XOR_t s[i+t].

    Vectorized in chunks of 28 (the recurrence's maximum safe lookahead:
    computing s[i+31] needs s[i+3], so 28 new terms are independent).
    """
    total = x.shape[-1]
    have = _NBITS
    while have < total:
        m = min(_NBITS - max(taps), total - have)
        i0 = have - _NBITS
        acc = x[..., i0 + taps[0] : i0 + taps[0] + m].copy()
        for t in taps[1:]:
            acc ^= x[..., i0 + t : i0 + t + m]
        x[..., have : have + m] = acc
        have += m


def _lfsr_x1(n: int) -> np.ndarray:
    """x1 sequence (unit seed), first n outputs after the Nc advance."""
    x = np.zeros(NC + n + _NBITS, dtype=np.uint8)
    x[0] = 1
    _lfsr_fill(x, (0, 3))
    return x[NC : NC + n]


def _lfsr_x2_basis(n: int) -> np.ndarray:
    """(31, n) basis: row i is x2 output (after Nc) for seed = e_i."""
    x = np.zeros((_NBITS, NC + n + _NBITS), dtype=np.uint8)
    for bit in range(_NBITS):
        x[bit, bit] = 1
    _lfsr_fill(x, (0, 1, 2, 3))
    return x[:, NC : NC + n]


@functools.lru_cache(maxsize=8)
def _tables(n: int):
    x1 = _lfsr_x1(n)
    basis = _lfsr_x2_basis(n)
    return x1, basis


def _table_len(n: int) -> int:
    """Quantize requested lengths so the lru_cache stays small."""
    m = _DEFAULT_MAX_LEN
    while m < n:
        m *= 2
    return m


def gold_ref(c_init: int, length: int) -> np.ndarray:
    """Direct LFSR spec model (oracle): c(n) for n in [0, length)."""
    total = NC + length
    x1 = np.zeros(total + _NBITS, dtype=np.uint8)
    x2 = np.zeros(total + _NBITS, dtype=np.uint8)
    x1[0] = 1
    for i in range(_NBITS):
        x2[i] = (c_init >> i) & 1
    for i in range(total):
        x1[i + _NBITS] = x1[i + 3] ^ x1[i]
        x2[i + _NBITS] = x2[i + 3] ^ x2[i + 2] ^ x2[i + 1] ^ x2[i]
    return x1[NC : NC + length] ^ x2[NC : NC + length]


@functools.partial(jax.jit, static_argnames=("length",))
def gold_sequence(c_init: jax.Array, length: int) -> jax.Array:
    """Gold sequence c(n), n in [0, length), with traced c_init.

    c_init: scalar (or batched (...,)) uint32/int32 seed.
    Returns (..., length) uint8 bits.
    """
    n = _table_len(length)
    x1, basis = _tables(n)
    x1 = jnp.asarray(x1[:length])
    basis = jnp.asarray(basis[:, :length])
    c_init = jnp.asarray(c_init, dtype=jnp.uint32)
    # Unrolled XOR-select over the 31 seed bits; XLA fuses this into a few
    # elementwise kernels with no (..., 31, N) intermediate.
    x2 = jnp.zeros(c_init.shape + (length,), dtype=jnp.uint8)
    for i in range(_NBITS):
        bit = ((c_init >> np.uint32(i)) & 1).astype(jnp.uint8)[..., None]
        x2 = x2 ^ (bit & basis[i])
    return x1 ^ x2


def scramble_bits(bits: jax.Array, c_init: jax.Array) -> jax.Array:
    """Scramble a (..., N) bit array (XOR with the Gold sequence)."""
    seq = gold_sequence(c_init, bits.shape[-1])
    return (bits.astype(jnp.uint8) ^ seq).astype(jnp.uint8)


def descramble_llrs(llrs: jax.Array, c_init: jax.Array) -> jax.Array:
    """Descramble int8 LLRs by sign-flipping where the sequence bit is 1.

    Matches the reference demodulator's descrambling-by-sign-flip
    (lib/phy/upper/channel_processors/pusch/pusch_demodulator_impl.cpp:282).
    Flip of -128 saturates to +127 to stay in int8.
    """
    seq = gold_sequence(c_init, llrs.shape[-1])
    flipped = jnp.where(
        llrs == jnp.int8(-128), jnp.int8(127), (-llrs.astype(jnp.int16)).astype(jnp.int8)
    )
    return jnp.where(seq == 1, flipped, llrs)
