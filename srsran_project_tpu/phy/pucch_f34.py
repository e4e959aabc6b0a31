"""PUCCH Formats 3 and 4: DFT-s-OFDM UCI (TS 38.211 §6.3.2.6).

Counterpart of the reference's pucch_demodulator_format3/format4
(lib/phy/upper/channel_processors/pucch/pucch_demodulator_format{3,4}.cpp).
Format 3: QPSK UCI symbols transform-precoded over 1-16 PRBs; Format 4:
one PRB with a pre-DFT orthogonal cover code (OCC length 2 or 4).  DM-RS
symbols carry low-PAPR sequences (Table 6.4.1.3.3.2-1 positions, no
frequency hopping, no additional DM-RS).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import scrambling, sequences, transform_precoding as tp, uci as uci_mod
from ..ops.modulation import Modulation, demap_soft, map_bits
from ..ran.constants import NRE

# DM-RS symbol indices within the PUCCH allocation (TS 38.211
# Table 6.4.1.3.3.2-1, no additional DM-RS).  Frequency hopping only
# changes the 4-symbol entry (reference
# get_pucch_formats3_4_dmrs_symbol_mask).
_DMRS_POS = {4: (1,), 5: (0, 3), 6: (1, 4), 7: (1, 4), 8: (1, 5), 9: (1, 6),
             10: (2, 7), 11: (2, 7), 12: (2, 8), 13: (2, 9), 14: (3, 10)}
_DMRS_POS_HOP = {**_DMRS_POS, 4: (0, 2)}
# additionalDMRS doubles the DM-RS density for >= 10 symbols.
_DMRS_POS_ADD = {**_DMRS_POS, 10: (1, 3, 6, 8), 11: (1, 3, 6, 9),
                 12: (1, 4, 7, 10), 13: (1, 4, 7, 11), 14: (1, 5, 8, 12)}


@dataclasses.dataclass(frozen=True)
class PucchFormat34Config:
    prb_start: int
    nof_prb: int  # 1 for format 4
    start_symbol: int
    nof_symbols: int  # 4..14
    nof_uci_bits: int
    rnti: int
    n_id: int = 0  # scrambling + sequence id
    occ_length: int = 1  # 1 => format 3; 2/4 => format 4
    occ_index: int = 0
    slot_in_frame: int = 0
    nof_rx_ports: int = 1
    nof_grid_sc: int = 624
    # Intra-slot frequency hopping: PRB start of the second hop (relative
    # symbols nof_symbols//2 onward).
    second_hop_prb: int | None = None
    # additionalDMRS (TS 38.331): 4 DM-RS symbols for >= 10-symbol
    # allocations.
    additional_dmrs: bool = False
    # pi/2-BPSK data modulation instead of QPSK (TS 38.211 6.3.2.6.2).
    pi2_bpsk: bool = False

    @property
    def data_symbols(self) -> tuple[int, ...]:
        dm = self.dmrs_symbols
        return tuple(i for i in range(self.nof_symbols) if i not in dm)

    @property
    def dmrs_symbols(self) -> tuple[int, ...]:
        if self.additional_dmrs and self.nof_symbols >= 10:
            return _DMRS_POS_ADD[self.nof_symbols]
        table = _DMRS_POS_HOP if self.second_hop_prb is not None else _DMRS_POS
        return table[self.nof_symbols]

    def prb_of(self, sym_rel: int) -> int:
        if self.second_hop_prb is not None and sym_rel >= self.nof_symbols // 2:
            return self.second_hop_prb
        return self.prb_start

    @property
    def nof_data_sc(self) -> int:
        return self.nof_prb * NRE

    @property
    def modulation(self) -> Modulation:
        return Modulation.PI_2_BPSK if self.pi2_bpsk else Modulation.QPSK

    @property
    def nof_coded_bits(self) -> int:
        # QPSK (2 bits/RE) or pi/2-BPSK (1) over data symbols; OCC divides
        # the payload capacity.
        qm = 1 if self.pi2_bpsk else 2
        return qm * len(self.data_symbols) * self.nof_data_sc // self.occ_length


def _c_init(cfg: PucchFormat34Config) -> int:
    return ((cfg.rnti << 15) + cfg.n_id) % (1 << 31)


# Format 4 DM-RS initial cyclic shift per OCC index (TS 38.211
# Table 6.4.1.3.3.1-1; reference dmrs_pucch_estimator_formats3_4.cpp:34-50).
_F4_DMRS_M0 = {0: 0, 1: 6, 2: 3, 3: 9}


@functools.lru_cache(maxsize=None)
def _dmrs_seq(cfg: PucchFormat34Config, sym_rel: int) -> np.ndarray:
    """Low-PAPR DM-RS for one DM-RS symbol over the allocation."""
    u = cfg.n_id % 30
    base = sequences.base_sequence(u, 0, cfg.nof_data_sc)
    # Per-symbol cyclic shift from the cell PRN (alpha hopping), plus the
    # OCC-dependent m0 for Format 4.
    m0 = _F4_DMRS_M0[cfg.occ_index] if cfg.occ_length > 1 else 0
    sym_abs = cfg.start_symbol + sym_rel
    seq = scrambling.gold_ref(cfg.n_id % (1 << 31), 8 * 14 * (cfg.slot_in_frame + 1))
    bits = seq[8 * (14 * cfg.slot_in_frame + sym_abs) : 8 * (14 * cfg.slot_in_frame + sym_abs) + 8]
    ncs = int(sum(int(b) << m for m, b in enumerate(bits)))
    alpha = 2.0 * np.pi * ((m0 + ncs) % NRE) / NRE
    ramp = np.exp(1j * alpha * np.arange(cfg.nof_data_sc))
    return (base * ramp).astype(np.complex64)


def _occ(cfg: PucchFormat34Config) -> np.ndarray:
    """Pre-DFT block weights w_i(m) = e^{-j2pi·i·m/n} (TS 38.211 Table
    6.3.2.6.3-1/2; reference pucch_format4_length{2,4} tables)."""
    n = cfg.occ_length
    i = cfg.occ_index
    return np.exp(-2j * np.pi * i * np.arange(n) / n).astype(np.complex64)


def generate(cfg: PucchFormat34Config, bits: np.ndarray) -> np.ndarray:
    """UE-side contribution: (14, nof_grid_sc) grid."""
    coded = np.asarray(uci_mod.encode_uci(bits, cfg.nof_coded_bits))
    scr = np.asarray(scrambling.scramble_bits(coded, np.uint32(_c_init(cfg))))
    syms = np.asarray(map_bits(scr, cfg.modulation))  # (nof data REs,)
    m = cfg.nof_data_sc
    per_sym = m // cfg.occ_length
    blocks = syms.reshape(len(cfg.data_symbols), per_sym)
    occ = _occ(cfg)
    grid = np.zeros((14, cfg.nof_grid_sc), np.complex64)
    def sc_of(rel):
        k0 = cfg.prb_of(rel) * NRE
        return slice(k0, k0 + m)
    for i, rel in enumerate(cfg.data_symbols):
        # Pre-DFT OCC spreading: repeat the block occ_length times, weighted.
        x = np.concatenate([blocks[i] * occ[k] for k in range(cfg.occ_length)])
        grid[cfg.start_symbol + rel, sc_of(rel)] = np.asarray(tp.precode(x))
    for rel in cfg.dmrs_symbols:
        grid[cfg.start_symbol + rel, sc_of(rel)] = _dmrs_seq(cfg, rel)
    return grid


@functools.partial(jax.jit, static_argnames=("cfg",))
def process(grid: jax.Array, cfg: PucchFormat34Config):
    """(P, 14, nsc) received grid -> (uci bits, ok, snr_db)."""
    m = cfg.nof_data_sc
    p = cfg.nof_rx_ports

    # Channel estimate per port per HOP from that hop's DM-RS symbols
    # (frequency-flat per sc); one hop when hopping is off.
    half = cfg.nof_symbols // 2

    def hop_of(rel):
        return 1 if (cfg.second_hop_prb is not None and rel >= half) else 0

    hops = sorted({hop_of(rel) for rel in range(cfg.nof_symbols)})
    h_by_hop = {}
    resid = 0.0
    nresid = 0
    for hop in hops:
        dm = [rel for rel in cfg.dmrs_symbols if hop_of(rel) == hop]
        sc0 = cfg.prb_of(dm[0]) * NRE
        h_acc = 0.0
        for rel in dm:
            y = grid[:, cfg.start_symbol + rel, sc0 : sc0 + m]
            h_acc = h_acc + y * jnp.conj(jnp.asarray(_dmrs_seq(cfg, rel)))
        h_by_hop[hop] = h_acc / len(dm)
        for rel in dm:
            y = grid[:, cfg.start_symbol + rel, sc0 : sc0 + m]
            resid = resid + (jnp.abs(
                y * jnp.conj(jnp.asarray(_dmrs_seq(cfg, rel))) - h_by_hop[hop]) ** 2).mean()
            nresid += 1
    denom = max(nresid - len(hops), 1)
    nvar = jnp.maximum(resid / denom, 1e-10)

    # Equalize each data symbol (MRC), inverse transform precoding, OCC despread.
    occ = jnp.asarray(_occ(cfg))
    per_sym = m // cfg.occ_length
    parts = []
    gain = sum((jnp.abs(h_by_hop[hop]) ** 2).sum(axis=0).mean() for hop in hops) / len(hops)
    for rel in cfg.data_symbols:
        h = h_by_hop[hop_of(rel)]
        sc0 = cfg.prb_of(rel) * NRE
        y = grid[:, cfg.start_symbol + rel, sc0 : sc0 + m]
        z = (jnp.conj(h) * y).sum(axis=0) / ((jnp.abs(h) ** 2).sum(axis=0) + 1e-12)
        x = tp.deprecode(z)  # (m,)
        xb = x.reshape(cfg.occ_length, per_sym)
        despread = (xb * jnp.conj(occ)[:, None]).mean(axis=0)
        parts.append(despread)
    x_all = jnp.concatenate(parts)  # (nof_coded/2,)
    eq_nvar = jnp.broadcast_to(nvar / jnp.maximum(gain, 1e-9), x_all.shape)
    llr = demap_soft(x_all, eq_nvar, cfg.modulation)
    seq = scrambling.gold_sequence(jnp.uint32(_c_init(cfg)), llr.shape[-1])
    llr = jnp.where(seq == 1, -llr, llr)
    bits, ok = uci_mod.decode_uci(llr, cfg.nof_uci_bits)
    snr_db = 10.0 * jnp.log10(jnp.maximum(gain / nvar, 1e-12))
    return bits, ok, snr_db
