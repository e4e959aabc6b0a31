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
    row: int = 1  # TS 38.211 Table 7.4.1.5.3-1 mapping row (1-4 supported)
    k0: int = 0  # frequency-domain offset within the PRB
    slot_in_frame: int = 0
    nof_grid_symbols: int = 14
    nof_grid_sc: int = 624

    @property
    def nof_ports(self) -> int:
        return {1: 1, 2: 1, 3: 2, 4: 4}[self.row]


def _c_init(cfg: CsiRsConfig) -> int:
    return ((1 << 10) * (14 * cfg.slot_in_frame + cfg.symbol + 1) * (2 * cfg.scrambling_id + 1)
            + cfg.scrambling_id) % (1 << 31)


@functools.lru_cache(maxsize=None)
def _re_layout(cfg: CsiRsConfig):
    """Per-port (flat grid idx (Np,), sequence idx (Np,), cdm weight (Np,)).

    Row 1: 1 port, density 3 (k0 + {0,4,8}).  Row 2: 1 port, density 1.
    Row 3: 2 ports, FD-CDM2 on (k0, k0+1).  Row 4: 4 ports, two FD-CDM2
    groups at k0 and k0+2.
    """
    out = []
    rbs = range(cfg.rb_start, cfg.rb_start + cfg.rb_count)

    def entry(port_offsets_weights):
        for offsets_weights in port_offsets_weights:
            ks, seq, w = [], [], []
            for rb_i, rb in enumerate(rbs):
                base = cfg.symbol * cfg.nof_grid_sc + rb * NRE
                for j, (off, wgt) in enumerate(offsets_weights):
                    ks.append(base + cfg.k0 + off)
                    seq.append(rb_i * len(offsets_weights) + j)
                    w.append(wgt)
            out.append((np.asarray(ks, np.int32), np.asarray(seq, np.int32),
                        np.asarray(w, np.float32)))

    if cfg.row == 1:
        entry([[(0, 1.0), (4, 1.0), (8, 1.0)]])
    elif cfg.row == 2:
        entry([[(0, 1.0)]])
    elif cfg.row == 3:
        entry([[(0, 1.0), (1, 1.0)], [(0, 1.0), (1, -1.0)]])
    elif cfg.row == 4:
        entry([
            [(0, 1.0), (1, 1.0)], [(0, 1.0), (1, -1.0)],
            [(2, 1.0), (3, 1.0)], [(2, 1.0), (3, -1.0)],
        ])
    else:
        raise ValueError(f"unsupported CSI-RS row {cfg.row}")
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("cfg", "amplitude"))
def generate(cfg: CsiRsConfig, amplitude: float = 1.0) -> jax.Array:
    """CSI-RS contribution as a (nof_ports, nsym, nsc) grid (squeezed to
    (nsym, nsc) for single-port rows, preserving the row-1 legacy shape)."""
    layout = _re_layout(cfg)
    grids = []
    for idx, seq_idx, w in layout:
        nseq = int(seq_idx.max()) + 1
        c = scrambling.gold_sequence(np.uint32(_c_init(cfg)), 2 * nseq)
        re = 1.0 - 2.0 * c[0::2].astype(jnp.float32)
        im = 1.0 - 2.0 * c[1::2].astype(jnp.float32)
        pilots = ((re + 1j * im) / np.sqrt(2)).astype(jnp.complex64)
        g = jnp.zeros((cfg.nof_grid_symbols * cfg.nof_grid_sc,), jnp.complex64)
        vals = amplitude * pilots[jnp.asarray(seq_idx)] * jnp.asarray(w)
        g = g.at[jnp.asarray(idx)].set(vals)
        grids.append(g.reshape(cfg.nof_grid_symbols, cfg.nof_grid_sc))
    if len(grids) == 1:
        return grids[0]
    return jnp.stack(grids)
