"""UCI encoding/decoding (TS 38.212 §6.3): HARQ-ACK / CSI payload codecs.

Counterpart of the reference's uci_decoder_impl
(lib/phy/upper/channel_processors/uci/uci_decoder_impl.cpp): payloads of
1..11 bits use the short-block (RM) code; 12+ bits use CRC-aided polar
(CRC6 for K<=19, CRC11 above) with the UL triangular channel interleaver.

Deviation noted for future parity work: the 3 parity-check bits the spec
adds for 12 <= K <= 19 are not yet implemented (the CRC6 is); decode remains
self-consistent with encode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import crc as crc_mod
from . import polar, short_block
from .polar import code as polar_code_mod


def _crc_name(k: int) -> str | None:
    if k <= 11:
        return None
    return "6" if k <= 19 else "11"


@functools.lru_cache(maxsize=None)
def _uci_code(k: int, e: int) -> polar.PolarCode:
    crc_len = 6 if k <= 19 else 11
    if k <= 19:
        # 12 <= A <= 19: 3 PC bits, one of minimal row weight when the
        # rate-matched budget is large (TS 38.212 §6.3.1.3.1 / §5.3.1.2).
        n_pc = 3
        n_pc_wm = 1 if e - (k + crc_len) + 3 > 192 else 0
        return polar.construct(k + crc_len, e, n_max=10, n_pc=n_pc,
                               n_pc_wm=n_pc_wm)
    return polar.construct(k + crc_len, e, n_max=10)


def _is_segmented(k: int, e: int) -> bool:
    """Two polar segments for large payloads (TS 38.212 §6.3.1.2.1)."""
    return k >= 360 and e >= 1088


def encode_uci(bits: jax.Array, e: int) -> jax.Array:
    """(..., K) UCI payload -> (..., E) coded bits."""
    k = bits.shape[-1]
    if k <= 11:
        return short_block.encode(bits, e)
    if _is_segmented(k, e):
        # Split into 2 segments (zero-prepended if K is odd), each with its
        # own CRC, polar code of length E/2, concatenated.
        kseg = -(-k // 2)
        pad = 2 * kseg - k
        x = jnp.concatenate(
            [jnp.zeros(bits.shape[:-1] + (pad,), jnp.uint8), bits.astype(jnp.uint8)], axis=-1
        )
        segs = x.reshape(x.shape[:-1] + (2, kseg))
        code = _uci_code(kseg, e // 2)
        with_crc = crc_mod.crc_append(segs, _crc_name(kseg))
        coded = polar.encode(with_crc, code)
        perm = jnp.asarray(polar_code_mod.channel_interleaver_pattern(e // 2))
        coded = coded[..., perm]
        return coded.reshape(coded.shape[:-2] + (e,))
    code = _uci_code(k, e)
    with_crc = crc_mod.crc_append(bits, _crc_name(k))
    coded = polar.encode(with_crc, code)
    perm = jnp.asarray(polar_code_mod.channel_interleaver_pattern(e))
    return coded[..., perm]


def decode_uci(llrs: jax.Array, k: int):
    """(..., E) LLRs -> (bits (..., K) uint8, ok (...,) bool)."""
    e = llrs.shape[-1]
    if k <= 11:
        bits, metric = short_block.detect(llrs, k, e)
        return bits, metric > 0.2
    if _is_segmented(k, e):
        kseg = -(-k // 2)
        pad = 2 * kseg - k
        x = llrs.reshape(llrs.shape[:-1] + (2, e // 2))
        code = _uci_code(kseg, e // 2)
        perm = jnp.asarray(polar_code_mod.channel_interleaver_pattern(e // 2))
        deint = jnp.zeros_like(x)
        deint = deint.at[..., perm].set(x)
        lin = polar.rate_dematch_llrs(deint, code)
        u = polar.decode(lin, code)
        ok = jnp.all(crc_mod.crc_check(u, _crc_name(kseg)), axis=-1)
        bits = u[..., :kseg].reshape(u.shape[:-2] + (2 * kseg,))
        return bits[..., pad:], ok
    code = _uci_code(k, e)
    perm = jnp.asarray(polar_code_mod.channel_interleaver_pattern(e))
    deint = jnp.zeros_like(llrs)
    deint = deint.at[..., perm].set(llrs)
    lin = polar.rate_dematch_llrs(deint, code)
    u = polar.decode(lin, code)
    ok = crc_mod.crc_check(u, _crc_name(k))
    return u[..., :k], ok
