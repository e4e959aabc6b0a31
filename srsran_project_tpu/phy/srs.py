"""SRS generation (UE side, for tests) and channel estimation (gNB side).

Counterpart of the reference's srs_estimator_generic_impl
(lib/phy/upper/signal_processors/srs/srs_estimator_generic_impl.cpp).
TS 38.211 §6.4.1.4: low-PAPR sequences on a comb (K_TC = 2 or 4) over 1-4
symbols; the estimator LS-correlates per rx port, averages over symbols,
and reports per-subcarrier channel, noise variance, and a wideband TA
estimate from the phase ramp.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sequences
from ..ran.constants import NRE


@dataclasses.dataclass(frozen=True)
class SrsConfig:
    rb_start: int
    rb_count: int
    start_symbol: int
    nof_symbols: int  # 1, 2, 4
    comb: int = 2  # K_TC
    comb_offset: int = 0
    sequence_id: int = 0  # n_SRS_ID
    cyclic_shift: int = 0
    nof_rx_ports: int = 1
    nof_grid_sc: int = 624
    nof_grid_symbols: int = 14

    @property
    def seq_length(self) -> int:
        return self.rb_count * NRE // self.comb


@functools.lru_cache(maxsize=None)
def _sc_indices(cfg: SrsConfig) -> np.ndarray:
    k0 = cfg.rb_start * NRE + cfg.comb_offset
    return (k0 + cfg.comb * np.arange(cfg.seq_length)).astype(np.int32)


def _alpha(cfg: SrsConfig) -> float:
    n_cs_max = 8 if cfg.comb == 2 else 12
    return 2.0 * np.pi * cfg.cyclic_shift / n_cs_max


@functools.lru_cache(maxsize=None)
def _sequence(cfg: SrsConfig) -> np.ndarray:
    """Host-side sequence (static per config, safe inside jit traces)."""
    u = cfg.sequence_id % 30
    base = sequences.base_sequence(u, 0, cfg.seq_length)
    ramp = np.exp(1j * _alpha(cfg) * np.arange(cfg.seq_length))
    return (base * ramp).astype(np.complex64)


def generate(cfg: SrsConfig) -> np.ndarray:
    """UE-side SRS contribution: (nof_grid_symbols, nof_grid_sc) grid."""
    grid = np.zeros((cfg.nof_grid_symbols, cfg.nof_grid_sc), np.complex64)
    seq = _sequence(cfg)
    sc = _sc_indices(cfg)
    for sym in range(cfg.start_symbol, cfg.start_symbol + cfg.nof_symbols):
        grid[sym, sc] = seq
    return grid


@functools.partial(jax.jit, static_argnames=("cfg",))
def estimate(grid: jax.Array, cfg: SrsConfig):
    """(P, nsym, nsc) received grid -> SRS channel estimate.

    Returns dict: h (P, seq_length) complex64, noise_var (P,), epre (P,),
    ta_seconds-like normalized delay (P,) in units of 1/(comb*scs*len).
    """
    sc = jnp.asarray(_sc_indices(cfg))
    syms = list(range(cfg.start_symbol, cfg.start_symbol + cfg.nof_symbols))
    y = grid[:, jnp.asarray(syms), :][..., sc]  # (P, S, L)
    ref = jnp.asarray(_sequence(cfg))
    ls = y * jnp.conj(ref)
    h = ls.mean(axis=1)  # (P, L)
    resid = ls - h[:, None, :]
    if len(syms) > 1:
        noise_var = (jnp.abs(resid) ** 2).mean(axis=(1, 2)) * len(syms) / (len(syms) - 1)
    else:
        # Single symbol: estimate noise from high-frequency half of the
        # delay spectrum of the LS estimate.
        d = jnp.fft.ifft(h, axis=-1)
        n = d.shape[-1]
        noise_var = 2.0 * (jnp.abs(d[:, n // 4 : 3 * n // 4]) ** 2).sum(axis=-1) / (n / 2) * n / n
    epre = (jnp.abs(y) ** 2).mean(axis=(1, 2))
    # TA from average phase slope across the comb.
    prod = (h[:, 1:] * jnp.conj(h[:, :-1])).sum(axis=-1)
    slope = jnp.angle(prod)  # radians per comb step
    return {"h": h, "noise_var": noise_var, "epre": epre, "phase_slope": slope}
