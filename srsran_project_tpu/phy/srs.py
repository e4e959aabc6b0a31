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
    nof_antenna_ports: int = 1  # N_ap^SRS: 1, 2 or 4
    nof_rx_ports: int = 1
    nof_grid_sc: int = 624
    nof_grid_symbols: int = 14

    @property
    def seq_length(self) -> int:
        return self.rb_count * NRE // self.comb

    @property
    def n_cs_max(self) -> int:
        return 8 if self.comb == 2 else 12

    def port_cyclic_shift(self, i_port: int) -> int:
        """n_SRS^{cs,i} = (cs + n_cs_max*i/N_ap) mod n_cs_max
        (TS 38.211 6.4.1.4.2; reference srs_information.cpp:70-73)."""
        return (self.cyclic_shift + (self.n_cs_max * i_port) // self.nof_antenna_ports) % self.n_cs_max

    def port_comb_offset(self, i_port: int) -> int:
        """4-port transmissions with cs >= n_cs_max/2 interleave ports 1/3
        onto the opposite comb (srs_information.cpp:76-81)."""
        k_tc = self.comb_offset
        if (self.nof_antenna_ports == 4 and self.cyclic_shift >= self.n_cs_max // 2
                and i_port in (1, 3)):
            k_tc = (k_tc + self.comb // 2) % self.comb
        return k_tc


@functools.lru_cache(maxsize=None)
def _sc_indices(cfg: SrsConfig, i_port: int = 0) -> np.ndarray:
    k0 = cfg.rb_start * NRE + cfg.port_comb_offset(i_port)
    return (k0 + cfg.comb * np.arange(cfg.seq_length)).astype(np.int32)


def _alpha(cfg: SrsConfig, i_port: int = 0) -> float:
    return 2.0 * np.pi * cfg.port_cyclic_shift(i_port) / cfg.n_cs_max


@functools.lru_cache(maxsize=None)
def _sequence(cfg: SrsConfig, i_port: int = 0) -> np.ndarray:
    """Host-side sequence (static per config, safe inside jit traces)."""
    u = cfg.sequence_id % 30
    base = sequences.base_sequence(u, 0, cfg.seq_length)
    ramp = np.exp(1j * _alpha(cfg, i_port) * np.arange(cfg.seq_length))
    return (base * ramp).astype(np.complex64)


def generate(cfg: SrsConfig) -> np.ndarray:
    """UE-side SRS contribution: (N_ap, nof_grid_symbols, nof_grid_sc)
    (squeezed to 2-D for single-port configurations)."""
    grids = []
    for p in range(cfg.nof_antenna_ports):
        grid = np.zeros((cfg.nof_grid_symbols, cfg.nof_grid_sc), np.complex64)
        seq = _sequence(cfg, p)
        sc = _sc_indices(cfg, p)
        for sym in range(cfg.start_symbol, cfg.start_symbol + cfg.nof_symbols):
            grid[sym, sc] = seq
        grids.append(grid)
    return grids[0] if cfg.nof_antenna_ports == 1 else np.stack(grids)


@functools.partial(jax.jit, static_argnames=("cfg",))
def estimate(grid: jax.Array, cfg: SrsConfig):
    """(P, nsym, nsc) received grid -> SRS channel estimate.

    Returns dict: h (P, seq_length) complex64, noise_var (P,), epre (P,),
    ta_seconds-like normalized delay (P,) in units of 1/(comb*scs*len).
    """
    syms = list(range(cfg.start_symbol, cfg.start_symbol + cfg.nof_symbols))

    def per_port(i_port: int):
        sc = jnp.asarray(_sc_indices(cfg, i_port))
        y = grid[:, jnp.asarray(syms), :][..., sc]  # (P, S, L)
        ref = jnp.asarray(_sequence(cfg, i_port))
        ls = y * jnp.conj(ref)
        h = ls.mean(axis=1)  # (P, L)
        if cfg.nof_antenna_ports > 1:
            # Other ports' cyclic shifts appear as delay-domain replicas at
            # multiples of L/N_ap bins; gate the impulse response to a
            # +-L/(2 N_ap) window around zero delay to isolate this port
            # (the delay-division multiplexing the shift allocation is
            # designed for; the reference gets the same isolation from its
            # first-replica TA peak + wideband averaging).
            d = jnp.fft.ifft(h, axis=-1)
            n = d.shape[-1]
            half = max(n // (2 * cfg.nof_antenna_ports), 1)
            mask = np.zeros(n, np.float32)
            mask[: half + 1] = 1.0
            mask[n - half :] = 1.0
            h = jnp.fft.fft(d * jnp.asarray(mask), axis=-1)
            # Noise from the outer half of this port's own delay window
            # (beyond any realistic channel spread).
            outer = np.zeros(n, np.float32)
            outer[half // 2 : half + 1] = 1.0
            outer[n - half : n - half // 2] = 1.0
            nbins = float(outer.sum())
            noise_var = (jnp.abs(d * jnp.asarray(outer)) ** 2).sum(axis=-1) * n / max(nbins, 1.0)
            y_pow = (jnp.abs(y) ** 2).mean(axis=(1, 2))
            prod = (h[:, 1:] * jnp.conj(h[:, :-1])).sum(axis=-1)
            slope = jnp.angle(prod)
            return h, noise_var, y_pow, slope
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
        prod = (h[:, 1:] * jnp.conj(h[:, :-1])).sum(axis=-1)
        slope = jnp.angle(prod)  # radians per comb step
        return h, noise_var, epre, slope

    if cfg.nof_antenna_ports == 1:
        h, noise_var, epre, slope = per_port(0)
        return {"h": h, "noise_var": noise_var, "epre": epre, "phase_slope": slope}
    parts = [per_port(p) for p in range(cfg.nof_antenna_ports)]
    # (rx, tx, L) channel; other ports' cyclic shifts average out in the
    # wideband coefficient exactly like the reference's mean LSE.
    return {
        "h": jnp.stack([p[0] for p in parts], axis=1),
        "noise_var": jnp.stack([p[1] for p in parts], axis=1).mean(axis=1),
        "epre": parts[0][2],
        "phase_slope": jnp.stack([p[3] for p in parts], axis=1),
    }
