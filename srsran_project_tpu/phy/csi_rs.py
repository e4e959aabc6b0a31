"""NZP-CSI-RS generation (TS 38.211 §7.4.1.5).

Counterpart of the reference's nzp_csi_rs_generator
(lib/phy/upper/signal_processors/nzp_csi_rs_generator_impl.cpp).  v1 covers
mapping row 1 (single port, density 3, no CDM): pilots at subcarriers
k0 + {0, 4, 8} of each allocated PRB on one symbol.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import scrambling
from ..ran.constants import NRE


@dataclasses.dataclass(frozen=True)
class CsiRsConfig:
    rb_start: int
    rb_count: int
    symbol: int
    scrambling_id: int
    k0: int = 0  # frequency-domain offset within the PRB
    slot_in_frame: int = 0
    nof_grid_symbols: int = 14
    nof_grid_sc: int = 624


def _c_init(cfg: CsiRsConfig) -> int:
    return ((1 << 10) * (14 * cfg.slot_in_frame + cfg.symbol + 1) * (2 * cfg.scrambling_id + 1)
            + cfg.scrambling_id) % (1 << 31)


@functools.lru_cache(maxsize=None)
def _re_indices(cfg: CsiRsConfig):
    ks, seq = [], []
    for rb in range(cfg.rb_start, cfg.rb_start + cfg.rb_count):
        for i, off in enumerate((0, 4, 8)):
            ks.append(cfg.symbol * cfg.nof_grid_sc + rb * NRE + cfg.k0 + off)
            seq.append(rb * 3 + i)
    return np.asarray(ks, np.int32), np.asarray(seq, np.int32)


@functools.partial(jax.jit, static_argnames=("cfg", "amplitude"))
def generate(cfg: CsiRsConfig, amplitude: float = 1.0) -> jax.Array:
    """CSI-RS contribution as a (nsym, nsc) single-port grid."""
    idx, seq_idx = _re_indices(cfg)
    nseq = int(seq_idx.max()) + 1
    c = scrambling.gold_sequence(np.uint32(_c_init(cfg)), 2 * nseq)
    re = 1.0 - 2.0 * c[0::2].astype(jnp.float32)
    im = 1.0 - 2.0 * c[1::2].astype(jnp.float32)
    pilots = ((re + 1j * im) / np.sqrt(2)).astype(jnp.complex64)
    grid = jnp.zeros((cfg.nof_grid_symbols * cfg.nof_grid_sc,), jnp.complex64)
    grid = grid.at[jnp.asarray(idx)].set(amplitude * pilots[jnp.asarray(seq_idx)])
    return grid.reshape(cfg.nof_grid_symbols, cfg.nof_grid_sc)
