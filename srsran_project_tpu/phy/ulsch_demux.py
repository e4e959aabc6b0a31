"""UL-SCH demultiplexing: HARQ-ACK / CSI multiplexed with data on PUSCH.

Counterpart of the reference's ulsch_demultiplex_impl
(lib/phy/upper/channel_processors/pusch/ulsch_demultiplex_impl.cpp) driven
by lib/ran/pusch/ulsch_info.cpp.  v1 semantics:

* HARQ-ACK bits are encoded with the UCI codec to G_ack coded bits and
  PUNCTURE the data bit stream at deterministic positions (first data
  symbol after the first DM-RS symbol, spread across the allocation) —
  mirroring the spec's puncturing behavior for <= 2 ACK bits and used here
  for all ACK sizes;
* CSI part 1 is encoded to G_csi1 bits on RESERVED positions (data is
  rate-matched around them) on the earliest data symbols.

Positions are computed host-side per static config; mux/demux are pure
gathers/scatters.  The exact TS 38.212 §6.2.7 interleaving is tracked as a
parity TODO; encode and decode here are exactly inverse of each other.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import uci as uci_mod
from . import allocation as alloc_mod


@dataclasses.dataclass(frozen=True)
class UlschMuxConfig:
    alloc: alloc_mod.Allocation
    qm: int
    nof_layers: int
    nof_grid_symbols: int
    nof_grid_sc: int
    g_ack: int = 0  # coded HARQ-ACK bits (0 = none)
    g_csi1: int = 0  # coded CSI part-1 bits (0 = none)

    @property
    def g_total(self) -> int:
        return alloc_mod.nof_data_re(self.alloc) * self.qm * self.nof_layers


@functools.lru_cache(maxsize=None)
def _positions(cfg: UlschMuxConfig):
    """(ack_pos (G_ack,), csi_pos (G_csi1,)) bit indices into the G stream."""
    a = cfg.alloc
    didx = alloc_mod.data_re_indices(a, cfg.nof_grid_symbols, cfg.nof_grid_sc)
    sym_of_re = didx // cfg.nof_grid_sc
    bits_per_re = cfg.qm * cfg.nof_layers
    g = cfg.g_total

    # ACK: REs on the first data symbol strictly after the first DM-RS symbol.
    first_dmrs = min(a.dmrs_symbols)
    ack_syms = [s for s in range(a.sym_start, a.sym_start + a.sym_count) if s > first_dmrs]
    ack_re = np.nonzero(np.isin(sym_of_re, ack_syms))[0]
    need_re = -(-cfg.g_ack // bits_per_re)
    stride = max(1, len(ack_re) // max(need_re, 1))
    chosen = ack_re[::stride][:need_re]
    ack_pos = (chosen[:, None] * bits_per_re + np.arange(bits_per_re)[None, :]).reshape(-1)[: cfg.g_ack]

    # CSI1: earliest data REs not used by ACK.
    used = np.zeros(g, dtype=bool)
    used[ack_pos] = True
    free = np.nonzero(~used)[0]
    csi_pos = free[: cfg.g_csi1]
    return ack_pos.astype(np.int32), csi_pos.astype(np.int32)


def multiplex(data_bits: jax.Array, ack_bits: jax.Array | None, csi1_bits: jax.Array | None,
              cfg: UlschMuxConfig) -> jax.Array:
    """Build the transmitted G-bit stream.

    data_bits: (G - G_csi1,) SCH bits (rate-matched around CSI, punctured
    by ACK); ack/csi1 are PAYLOAD bits (encoded here with the UCI codec).
    """
    ack_pos, csi_pos = _positions(cfg)
    g = cfg.g_total
    out = jnp.zeros((g,), jnp.uint8)
    # Place data in all non-CSI positions.
    data_mask = np.ones(g, dtype=bool)
    data_mask[csi_pos] = False
    data_idx = jnp.asarray(np.nonzero(data_mask)[0])
    out = out.at[data_idx].set(data_bits.astype(jnp.uint8))
    if cfg.g_csi1:
        coded = uci_mod.encode_uci(csi1_bits, cfg.g_csi1)
        out = out.at[jnp.asarray(csi_pos)].set(coded.astype(jnp.uint8))
    if cfg.g_ack:
        coded = uci_mod.encode_uci(ack_bits, cfg.g_ack)
        out = out.at[jnp.asarray(ack_pos)].set(coded.astype(jnp.uint8))  # puncture
    return out


def demultiplex(llrs: jax.Array, cfg: UlschMuxConfig):
    """Split received G-bit LLRs into (data_llrs, ack_llrs, csi1_llrs).

    ACK positions are erased (set to 0) in the data stream (puncture);
    CSI positions are removed entirely (data was rate-matched around them).
    """
    ack_pos, csi_pos = _positions(cfg)
    g = cfg.g_total
    ack_llrs = llrs[..., jnp.asarray(ack_pos)] if cfg.g_ack else None
    csi_llrs = llrs[..., jnp.asarray(csi_pos)] if cfg.g_csi1 else None
    data = llrs
    if cfg.g_ack:
        data = data.at[..., jnp.asarray(ack_pos)].set(0)
    data_mask = np.ones(g, dtype=bool)
    data_mask[csi_pos] = False
    data = data[..., jnp.asarray(np.nonzero(data_mask)[0])]
    return data, ack_llrs, csi_llrs


def decode_uci_parts(ack_llrs, csi_llrs, nof_ack_bits: int, nof_csi1_bits: int):
    """Decode the UCI payloads; returns dict of (bits, ok) per part."""
    out = {}
    if ack_llrs is not None and nof_ack_bits:
        bits, ok = uci_mod.decode_uci(ack_llrs.astype(jnp.float32), nof_ack_bits)
        out["ack"] = (bits, ok)
    if csi_llrs is not None and nof_csi1_bits:
        bits, ok = uci_mod.decode_uci(csi_llrs.astype(jnp.float32), nof_csi1_bits)
        out["csi1"] = (bits, ok)
    return out
