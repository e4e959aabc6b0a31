"""SS/PBCH block: PSS, SSS, PBCH encode + SSB grid assembly.

Counterpart of the reference's ssb processors
(lib/phy/upper/channel_processors/ssb/ssb_processor_impl.h:51,
pbch_encoder_impl.cpp, pbch_modulator_impl.cpp): BCH payload interleaving +
first scrambling (TS 38.212 §7.1), CRC24C, polar(K=56, E=864), second
scrambling + QPSK (TS 38.211 §7.3.3), PSS/SSS m-sequences and the
240x4-subcarrier SSB grid layout (§7.4.2/§7.4.3).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import crc as crc_mod
from ..ops import polar, scrambling
from ..ops.modulation import Modulation, map_bits

A_BITS = 32
E_PBCH = 864
K_PBCH = A_BITS + 24

# TS 38.212 Table 7.1.1-1: PBCH payload interleaver pattern G(j).
G_PATTERN = (
    16, 23, 18, 17, 8, 30, 10, 6, 24, 7, 0, 5, 3, 2, 1, 4,
    9, 11, 12, 13, 14, 15, 19, 20, 21, 22, 25, 26, 27, 28, 29, 31,
)

SSB_NSC = 240
SSB_NSYM = 4
_PSS_SC0 = 56  # PSS/SSS occupy subcarriers 56..182


def _mseq(taps_fn, length=127) -> np.ndarray:
    x = np.zeros(length + 7, dtype=np.uint8)
    x[0] = 1  # x(0)=1, x(1..6)=0 for SSS generators
    for i in range(length):
        x[i + 7] = taps_fn(x, i)
    return x[:length]


@functools.lru_cache(maxsize=1)
def _pss_base() -> np.ndarray:
    x = np.zeros(127 + 7, dtype=np.uint8)
    x[:7] = [0, 1, 1, 0, 1, 1, 1]  # TS 38.211 §7.4.2.2.1 initial state
    for i in range(127):
        x[i + 7] = x[i + 4] ^ x[i]
    return x[:127]


@functools.lru_cache(maxsize=1)
def _sss_bases():
    x0 = _mseq(lambda x, i: x[i + 4] ^ x[i])
    x1 = _mseq(lambda x, i: x[i + 1] ^ x[i])
    return x0, x1


def pss_sequence(nid2: int) -> np.ndarray:
    """d_PSS(n), 127 BPSK values (TS 38.211 §7.4.2.2)."""
    x = _pss_base()
    m = (np.arange(127) + 43 * nid2) % 127
    return (1.0 - 2.0 * x[m]).astype(np.float32)


def sss_sequence(nid1: int, nid2: int) -> np.ndarray:
    """d_SSS(n), 127 BPSK values (TS 38.211 §7.4.2.3)."""
    x0, x1 = _sss_bases()
    m0 = 15 * (nid1 // 112) + 5 * nid2
    m1 = nid1 % 112
    n = np.arange(127)
    s0 = 1.0 - 2.0 * x0[(n + m0) % 127]
    s1 = 1.0 - 2.0 * x1[(n + m1) % 127]
    return (s0 * s1).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class SsbConfig:
    pci: int  # physical cell id N_ID = 3*NID1 + NID2
    ssb_index: int = 0
    l_max: int = 8
    sfn_2lsb: int = 0  # 2nd/3rd LSB of SFN: first-scrambling offset v
    hrf: int = 0  # half-frame bit (second half-frame = 1)

    @property
    def nid1(self) -> int:
        return self.pci // 3

    @property
    def nid2(self) -> int:
        return self.pci % 3

    @functools.cached_property
    def code(self) -> polar.PolarCode:
        return polar.construct(K_PBCH, E_PBCH, n_max=9)


def pbch_pack_payload(mib_bits, sfn: int, hrf: int, ssb_index: int,
                      l_max: int, k_ssb: int = 0) -> np.ndarray:
    """Pack the 24 MIB bits + timing fields into the 32-bit pre-interleave
    PBCH payload a(j) consumed by :func:`encode_pbch` (ordering mirrors the
    reference's interleaver walk, pbch_encoder_impl.cpp:39-74
    payload_generate: SFN-field MIB bits first, then SFN LSBs, HRF, the
    SSB-index/k_ssb bits, then the remaining MIB bits)."""
    mib = np.asarray(mib_bits, np.uint8)
    assert mib.size == 24
    out = []
    out.extend(mib[1:7])                        # MIB SFN payload bits -> G[0..5]
    out.extend(((sfn >> s) & 1) for s in (3, 2, 1, 0))  # SFN 4 LSBs -> G[6..9]
    out.append(hrf & 1)                         # half-frame -> G[10]
    if l_max == 64:
        out.extend(((ssb_index >> s) & 1) for s in (5, 4, 3))  # -> G[11..13]
    else:
        out.extend(((k_ssb >> 4) & 1, 0, 0))    # k_ssb MSB + reserved
    out.append(mib[0])                          # MIB bit 0 -> G[14]
    out.extend(mib[7:24])                       # rest -> G[15..31]
    return np.asarray(out, np.uint8)


def pbch_payload_interleave(a_bits: jax.Array) -> jax.Array:
    """a'(G(j)) = a(j): spread the 32 payload bits (TS 38.212 §7.1.1)."""
    g = jnp.asarray(np.asarray(G_PATTERN, np.int32))
    out = jnp.zeros(a_bits.shape, jnp.uint8)
    return out.at[..., g].set(a_bits.astype(jnp.uint8))


def _first_scrambling_mask(cfg: SsbConfig) -> np.ndarray:
    """(A,) 0/1 Gold bits to XOR (SFN 2nd/3rd LSB and HRF positions kept
    clear), per TS 38.212 §7.1.2 with interleaved positions."""
    m = A_BITS - 3 if cfg.l_max in (4, 8) else A_BITS - 6
    seq = scrambling.gold_ref(cfg.pci, (cfg.sfn_2lsb + 1) * m)[-m:]
    mask = np.zeros(A_BITS, dtype=np.uint8)
    # Unscrambled positions (interleaved indices): SFN 2nd/3rd LSB and HRF
    # always; additionally the 3 SSB-index bits when L_max = 64
    # (reference pbch_encoder_impl.cpp:86-105 scramble()).
    skip = {G_PATTERN[7], G_PATTERN[8], G_PATTERN[10]}
    if cfg.l_max == 64:
        skip |= {G_PATTERN[11], G_PATTERN[12], G_PATTERN[13]}
    j = 0
    for i in range(A_BITS):
        if i in skip:
            continue
        mask[i] = seq[j]
        j += 1
        if j == m:
            break
    return mask


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_pbch(payload: jax.Array, cfg: SsbConfig) -> jax.Array:
    """32 interleaved+payload bits -> 864 scrambled coded bits."""
    a = pbch_payload_interleave(payload)
    a = a ^ jnp.asarray(_first_scrambling_mask(cfg))
    with_crc = crc_mod.crc_append(a, "24C")
    coded = polar.encode(with_crc, cfg.code, interleave_input=True)
    # Second scrambling (TS 38.211 §7.3.3.1): block v = ssb index LSBs.
    v = cfg.ssb_index & (0b111 if cfg.l_max > 4 else 0b11)
    seq = scrambling.gold_sequence(np.uint32(cfg.pci), (v + 1) * E_PBCH)[..., v * E_PBCH :]
    return coded ^ seq


@functools.lru_cache(maxsize=None)
def _ssb_re_layout(pci: int):
    """(pbch_data_idx (432,), dmrs_idx (144,)) flat indices into (4, 240)."""
    v = pci % 4
    data, dmrs = [], []
    def pbch_block(sym, sc_lo, sc_hi):
        for sc in range(sc_lo, sc_hi):
            (dmrs if sc % 4 == v else data).append(sym * SSB_NSC + sc)
    pbch_block(1, 0, SSB_NSC)
    pbch_block(2, 0, 48)
    pbch_block(2, 192, SSB_NSC)
    pbch_block(3, 0, SSB_NSC)
    assert len(data) == 432 and len(dmrs) == 144
    return np.asarray(data, np.int32), np.asarray(dmrs, np.int32)


def _dmrs_c_init(cfg: SsbConfig) -> int:
    # TS 38.211 §7.4.1.4.1: i_ssb takes the SSB index 2 LSBs + 4*n_hf for
    # L_max = 4, or the 3 LSBs (no half-frame term) otherwise.
    if cfg.l_max == 4:
        issb = (cfg.ssb_index & 0b11) + 4 * (cfg.hrf & 1)
    else:
        issb = cfg.ssb_index & 0b111
    return ((1 << 11) * (issb + 1) * (cfg.pci // 4 + 1) + (1 << 6) * (issb + 1) + (cfg.pci % 4)) % (
        1 << 31
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def assemble_ssb(payload: jax.Array, cfg: SsbConfig, beta: float = 1.0) -> jax.Array:
    """32-bit PBCH payload -> SSB grid (4, 240) complex64 with PSS/SSS/PBCH/DM-RS."""
    grid = jnp.zeros((SSB_NSYM * SSB_NSC,), jnp.complex64)
    pss = jnp.asarray(pss_sequence(cfg.nid2).astype(np.complex64))
    sss = jnp.asarray(sss_sequence(cfg.nid1, cfg.nid2).astype(np.complex64))
    grid = grid.at[0 * SSB_NSC + _PSS_SC0 : 0 * SSB_NSC + _PSS_SC0 + 127].set(pss)
    grid = grid.at[2 * SSB_NSC + _PSS_SC0 : 2 * SSB_NSC + _PSS_SC0 + 127].set(sss)

    coded = encode_pbch(payload, cfg)
    syms = map_bits(coded, Modulation.QPSK)
    data_idx, dmrs_idx = _ssb_re_layout(cfg.pci)
    grid = grid.at[jnp.asarray(data_idx)].set(syms)

    c = scrambling.gold_sequence(np.uint32(_dmrs_c_init(cfg)), 2 * 144)
    re = 1.0 - 2.0 * c[0::2].astype(jnp.float32)
    im = 1.0 - 2.0 * c[1::2].astype(jnp.float32)
    pilots = ((re + 1j * im) / np.sqrt(2)).astype(jnp.complex64)
    grid = grid.at[jnp.asarray(dmrs_idx)].set(pilots)
    return (beta * grid).reshape(SSB_NSYM, SSB_NSC)


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_pbch(llrs: jax.Array, cfg: SsbConfig):
    """(864,) LLRs -> (payload (32,) uint8, crc_ok bool).

    Inverts the second scrambling, polar-decodes, checks CRC24C, undoes the
    input interleaving, the first scrambling, and the payload interleaver.
    """
    v = cfg.ssb_index & (0b111 if cfg.l_max > 4 else 0b11)
    seq = scrambling.gold_sequence(np.uint32(cfg.pci), (v + 1) * E_PBCH)[..., v * E_PBCH :]
    llrs = jnp.where(seq == 1, -llrs, llrs)
    lin = polar.rate_dematch_llrs(llrs, cfg.code)
    u = polar.decode(lin, cfg.code)
    # Undo the polar input interleaver.
    from ..ops.polar import tables as ptab

    pi = ptab.input_interleaver(K_PBCH)
    deint = jnp.zeros_like(u)
    deint = deint.at[..., jnp.asarray(pi)].set(u)
    ok = crc_mod.crc_check(deint, "24C")
    a = deint[..., :A_BITS] ^ jnp.asarray(_first_scrambling_mask(cfg))
    g = jnp.asarray(np.asarray(G_PATTERN, np.int32))
    payload = a[..., g]
    return payload, ok
