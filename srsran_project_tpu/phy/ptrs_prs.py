"""PT-RS (TS 38.211 §7.4.1.2) and PRS (TS 38.211 §7.4.1.7) generators.

Counterparts of the reference's ptrs_pdsch_generator and prs_generator
(lib/phy/upper/signal_processors/{ptrs,prs}/).  PT-RS reuses the PDSCH
DM-RS sequence on one subcarrier of every K-th allocated PRB; PRS is a
dedicated Gold-sequence QPSK signal on a comb across several symbols.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import scrambling
from ..ran import dmrs as dmrs_mod
from ..ran.constants import NRE


@dataclasses.dataclass(frozen=True)
class PtrsConfig:
    rb_start: int
    rb_count: int
    symbols: tuple[int, ...]  # PT-RS time positions (every L_PTRS-th data symbol)
    k_ptrs: int = 2  # frequency density: one RE every K_PTRS PRBs
    re_offset: int = 0
    scrambling_id: int = 0
    n_scid: int = 0
    slot_in_frame: int = 0
    nof_grid_sc: int = 624
    nof_grid_symbols: int = 14


@functools.lru_cache(maxsize=None)
def _ptrs_indices(cfg: PtrsConfig):
    prbs = list(range(cfg.rb_start, cfg.rb_start + cfg.rb_count, cfg.k_ptrs))
    ks = np.asarray([p * NRE + cfg.re_offset for p in prbs], np.int32)
    # Sequence index of the DM-RS pilot at this subcarrier (type 1): the
    # PT-RS RE reuses r(m) of the DM-RS on the same subcarrier.
    seq_idx = np.asarray([p * 6 + cfg.re_offset // 2 for p in prbs], np.int32)
    return ks, seq_idx


@functools.partial(jax.jit, static_argnames=("cfg",))
def generate_ptrs(cfg: PtrsConfig) -> jax.Array:
    """PT-RS contribution as a (nsym, nsc) single-layer grid."""
    ks, seq_idx = _ptrs_indices(cfg)
    grid = jnp.zeros((cfg.nof_grid_symbols * cfg.nof_grid_sc,), jnp.complex64)
    nseq = int(seq_idx.max()) + 1
    for sym in cfg.symbols:
        c_init = dmrs_mod.dmrs_c_init(cfg.slot_in_frame, sym, cfg.scrambling_id, cfg.n_scid)
        c = scrambling.gold_sequence(np.uint32(c_init), 2 * nseq)
        re = 1.0 - 2.0 * c[0::2].astype(jnp.float32)
        im = 1.0 - 2.0 * c[1::2].astype(jnp.float32)
        pilots = ((re + 1j * im) / np.sqrt(2)).astype(jnp.complex64)
        grid = grid.at[sym * cfg.nof_grid_sc + jnp.asarray(ks)].set(pilots[jnp.asarray(seq_idx)])
    return grid.reshape(cfg.nof_grid_symbols, cfg.nof_grid_sc)


@dataclasses.dataclass(frozen=True)
class PrsConfig:
    rb_start: int
    rb_count: int
    start_symbol: int
    nof_symbols: int  # 2,4,6,12
    comb_size: int = 4  # K in {2,4,6,12}
    comb_offset: int = 0
    n_id_prs: int = 0
    slot_in_frame: int = 0
    nof_grid_sc: int = 624
    nof_grid_symbols: int = 14


# Relative RE offsets per symbol within the comb pattern (TS 38.211
# Table 7.4.1.7.3-1, comb sizes 2/4/6/12).
_PRS_OFFSETS = {
    2: (0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1),
    4: (0, 2, 1, 3, 0, 2, 1, 3, 0, 2, 1, 3),
    6: (0, 3, 1, 4, 2, 5, 0, 3, 1, 4, 2, 5),
    12: (0, 6, 3, 9, 1, 7, 4, 10, 2, 8, 5, 11),
}


def _prs_c_init(cfg: PrsConfig, symbol: int) -> int:
    n = cfg.n_id_prs
    return (
        (1 << 22) * (n // 1024)
        + (1 << 10) * (14 * cfg.slot_in_frame + symbol + 1) * (2 * (n % 1024) + 1)
        + (n % 1024)
    ) % (1 << 31)


@functools.partial(jax.jit, static_argnames=("cfg",))
def generate_prs(cfg: PrsConfig) -> jax.Array:
    """PRS contribution as a (nsym, nsc) single-port grid."""
    grid = jnp.zeros((cfg.nof_grid_symbols * cfg.nof_grid_sc,), jnp.complex64)
    per_sym = cfg.rb_count * NRE // cfg.comb_size
    offsets = _PRS_OFFSETS[cfg.comb_size]
    # Pilot sequence index counts from Point A: skip rb_start PRBs' worth
    # of pilots (reference prs_generator_impl.cpp:77 `prg->advance`).
    per_prb = NRE // cfg.comb_size
    skip = cfg.rb_start * per_prb
    for i in range(cfg.nof_symbols):
        sym = cfg.start_symbol + i
        koff = (cfg.comb_offset + offsets[i % len(offsets)]) % cfg.comb_size
        ks = cfg.rb_start * NRE + koff + cfg.comb_size * np.arange(per_sym)
        c = scrambling.gold_sequence(np.uint32(_prs_c_init(cfg, sym)),
                                     2 * (skip + per_sym))[2 * skip :]
        re = 1.0 - 2.0 * c[0::2].astype(jnp.float32)
        im = 1.0 - 2.0 * c[1::2].astype(jnp.float32)
        pilots = ((re + 1j * im) / np.sqrt(2)).astype(jnp.complex64)
        grid = grid.at[sym * cfg.nof_grid_sc + jnp.asarray(ks.astype(np.int32))].set(pilots)
    return grid.reshape(cfg.nof_grid_symbols, cfg.nof_grid_sc)


@functools.partial(jax.jit, static_argnames=("cfg", "dft_size"))
def prs_toa_estimate(rx_grid: jax.Array, cfg: PrsConfig, dft_size: int = 4096):
    """UE-side DL-PRS time-of-arrival estimate (samples at dft_size/grid
    resolution) + RSRP — the measurement the positioning procedure reports
    (counterpart of the reference's PRS processing for NRPPa positioning).

    Per PRS symbol: LS channel estimate on the comb REs -> combined IDFT
    power-delay profile across symbols -> fractional peak (parabolic
    interpolation), mapped to TOA in samples of the dft_size domain.
    """
    per_sym = cfg.rb_count * NRE // cfg.comb_size
    offsets = _PRS_OFFSETS[cfg.comb_size]
    # coherent spectrum accumulation: the staggered comb offsets across
    # symbols fill the subcarrier grid, so a single IDFT of the combined
    # spectrum has no comb aliases (static channel over the PRS duration)
    spread = jnp.zeros((dft_size,), jnp.complex64)
    rsrp = 0.0
    for i in range(cfg.nof_symbols):
        sym = cfg.start_symbol + i
        koff = (cfg.comb_offset + offsets[i % len(offsets)]) % cfg.comb_size
        ks = cfg.rb_start * NRE + koff + cfg.comb_size * np.arange(per_sym)
        c = scrambling.gold_sequence(np.uint32(_prs_c_init(cfg, sym)), 2 * per_sym)
        re = 1.0 - 2.0 * c[0::2].astype(jnp.float32)
        im = 1.0 - 2.0 * c[1::2].astype(jnp.float32)
        pilots = ((re + 1j * im) / np.sqrt(2)).astype(jnp.complex64)
        h = rx_grid[sym, jnp.asarray(ks.astype(np.int32))] * jnp.conj(pilots)
        rsrp = rsrp + (jnp.abs(h) ** 2).mean() / cfg.nof_symbols
        spread = spread.at[jnp.asarray(ks.astype(np.int32) % dft_size)].add(h)
    pdp = jnp.abs(jnp.fft.ifft(spread)) ** 2
    peak = jnp.argmax(pdp)
    # parabolic interpolation around the peak for sub-sample resolution
    y0 = pdp[(peak - 1) % dft_size]
    y1 = pdp[peak]
    y2 = pdp[(peak + 1) % dft_size]
    frac = 0.5 * (y0 - y2) / (y0 - 2 * y1 + y2 + 1e-12)
    toa = (peak.astype(jnp.float32) + frac) % dft_size
    # delays beyond half the window are negative (early) arrivals
    toa = jnp.where(toa > dft_size / 2, toa - dft_size, toa)
    return {"toa_samples": toa, "rsrp": rsrp, "peak_power": y1 / (pdp.mean() + 1e-12)}
