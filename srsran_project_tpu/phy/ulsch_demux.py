"""UL-SCH demultiplexing: HARQ-ACK / CSI multiplexed with data on PUSCH.

Counterpart of the reference's ulsch_demultiplex_impl
(lib/phy/upper/channel_processors/pusch/ulsch_demultiplex_impl.cpp) driven
by lib/ran/pusch/ulsch_info.cpp, implementing the TS 38.212 §6.2.7
multiplexing procedure:

* HARQ-ACK starts at l1 (the first data symbol after the first run of
  DM-RS symbols).  For payloads of 1-2 bits the ACK REs are RESERVED
  (layout sized by ``g_ack_rvd``, the G computed for a 2-bit payload);
  data maps straight through the reserved REs and the actual coded ACK
  bits then PUNCTURE the first G_ack of them.  For payloads > 2 bits the
  data is rate-matched around the ACK REs.
* CSI part 1 starts at l0 (the first data symbol) and is always
  rate-matched around; it never maps onto reserved/ACK REs.
* Within a symbol, a stream needing fewer REs than are available is
  spread evenly with stride d = floor(M / n_re) (the spec's distance
  rule); otherwise it takes the whole symbol and continues.

Positions are computed host-side per static config; mux/demux are pure
gathers/scatters on bit streams of G = nof_data_re * Qm * nof_layers.
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
    g_csi2: int = 0  # coded CSI part-2 bits (0 = none)
    nof_ack_bits: int = 0  # ACK payload size (selects puncture vs rate-match)
    g_ack_rvd: int = 0  # reserved-ACK layout bits (2-bit G); 0 -> use g_ack

    @property
    def g_total(self) -> int:
        return alloc_mod.nof_data_re(self.alloc) * self.qm * self.nof_layers

    @property
    def ack_punctures(self) -> bool:
        """1-2 bit ACK payloads puncture; larger payloads rate-match."""
        return self.nof_ack_bits <= 2

    @property
    def nof_data_bits(self) -> int:
        """SCH bits carried: G minus CSI minus (rate-matched ACK)."""
        g = self.g_total - self.g_csi1 - self.g_csi2
        if self.g_ack and not self.ack_punctures:
            g -= self.g_ack
        return g


@functools.lru_cache(maxsize=None)
def _layout(cfg: UlschMuxConfig):
    """(ack_pos, csi_pos, data_idx) bit indices into the G stream.

    ack_pos carries the actual coded ACK bits; data_idx enumerates the data
    stream's positions (including reserved-ACK REs in puncture mode)."""
    a = cfg.alloc
    bpre = cfg.qm * cfg.nof_layers
    didx = alloc_mod.data_re_indices(a, cfg.nof_grid_symbols, cfg.nof_grid_sc)
    sym_of_re = np.asarray(didx) // cfg.nof_grid_sc
    symbols = list(range(a.sym_start, a.sym_start + a.sym_count))
    re_by_sym = {s: np.nonzero(sym_of_re == s)[0] for s in symbols}
    data_syms = [s for s in symbols if len(re_by_sym[s])]
    l0 = data_syms[0]
    dmrs = sorted(a.dmrs_symbols)
    end_first_dmrs = dmrs[0]
    while end_first_dmrs + 1 in dmrs:
        end_first_dmrs += 1
    after = [s for s in data_syms if s > end_first_dmrs]
    l1 = after[0] if after else l0

    def spread(g_bits: int, start_sym: int, excluded: set) -> list:
        chosen = []
        rem = g_bits
        for s in data_syms:
            if s < start_sym or rem <= 0:
                continue
            phi = [int(r) for r in re_by_sym[s] if int(r) not in excluded]
            m = len(phi)
            if m == 0:
                continue
            if rem >= m * bpre:
                take = phi
            else:
                n_re = -(-rem // bpre)
                d = m // n_re
                take = [phi[j * d] for j in range(n_re)]
            chosen += take
            rem -= len(take) * bpre
        return chosen

    punct = cfg.ack_punctures
    g_layout = (cfg.g_ack_rvd or cfg.g_ack) if punct else cfg.g_ack
    ack_layout_re = spread(g_layout, l1, set()) if g_layout else []
    csi_re = spread(cfg.g_csi1, l0, set(ack_layout_re)) if cfg.g_csi1 else []
    # CSI part 2 maps from l0 around CSI1; unlike CSI1 it MAY occupy
    # reserved-ACK REs in puncture mode (6.2.7) and is then punctured.
    csi2_excl = set(csi_re) | (set() if punct else set(ack_layout_re))
    csi2_re = spread(cfg.g_csi2, l0, csi2_excl) if cfg.g_csi2 else []

    def bits_of(res: list, limit: int) -> np.ndarray:
        if not res:
            return np.zeros(0, np.int32)
        arr = (np.asarray(res, np.int64)[:, None] * bpre
               + np.arange(bpre)[None, :]).reshape(-1)
        return arr[:limit].astype(np.int32)

    # Actual ACK bits occupy the first G_ack bit positions of the layout.
    ack_pos = bits_of(ack_layout_re, cfg.g_ack)

    data_mask = np.ones(len(didx), dtype=bool)
    if csi_re:
        data_mask[np.asarray(csi_re)] = False
    if csi2_re:
        data_mask[np.asarray(csi2_re)] = False
    if ack_layout_re and not punct:
        data_mask[np.asarray(ack_layout_re)] = False
    data_re = np.nonzero(data_mask)[0]
    data_idx = (data_re[:, None] * bpre + np.arange(bpre)[None, :]) \
        .reshape(-1).astype(np.int32)
    csi_pos = bits_of(csi_re, cfg.g_csi1)
    csi2_pos = bits_of(csi2_re, cfg.g_csi2)
    return ack_pos, csi_pos, csi2_pos, data_idx


def _positions(cfg: UlschMuxConfig):
    """(ack_pos, csi_pos) bit indices — kept for tests/back-compat."""
    ack_pos, csi_pos, _, _ = _layout(cfg)
    return ack_pos, csi_pos


def multiplex(data_bits: jax.Array, ack_bits: jax.Array | None, csi1_bits: jax.Array | None,
              cfg: UlschMuxConfig, csi2_bits: jax.Array | None = None) -> jax.Array:
    """Build the transmitted G-bit stream.

    data_bits: (nof_data_bits,) SCH bits; ack/csi1/csi2 are PAYLOAD bits
    (encoded here with the UCI codec).  ACK is placed last so it punctures
    whatever occupies its reserved REs (data or CSI2)."""
    ack_pos, csi_pos, csi2_pos, data_idx = _layout(cfg)
    g = cfg.g_total
    out = jnp.zeros((g,), jnp.uint8)
    out = out.at[jnp.asarray(data_idx)].set(data_bits.astype(jnp.uint8))
    if cfg.g_csi1:
        coded = uci_mod.encode_uci(csi1_bits, cfg.g_csi1)
        out = out.at[jnp.asarray(csi_pos)].set(coded.astype(jnp.uint8))
    if cfg.g_csi2:
        coded = uci_mod.encode_uci(csi2_bits, cfg.g_csi2)
        out = out.at[jnp.asarray(csi2_pos)].set(coded.astype(jnp.uint8))
    if cfg.g_ack:
        coded = uci_mod.encode_uci(ack_bits, cfg.g_ack)
        out = out.at[jnp.asarray(ack_pos)].set(coded.astype(jnp.uint8))
    return out


def demultiplex(llrs: jax.Array, cfg: UlschMuxConfig):
    """Split received G-bit LLRs into (data_llrs, ack_llrs, csi1_llrs).

    In puncture mode the actual ACK bit positions are erased (0) in the
    data stream; rate-matched ACK and CSI positions are removed entirely."""
    ack_pos, csi_pos, csi2_pos, data_idx = _layout(cfg)
    ack_llrs = llrs[..., jnp.asarray(ack_pos)] if cfg.g_ack else None
    csi_llrs = llrs[..., jnp.asarray(csi_pos)] if cfg.g_csi1 else None
    rest = llrs
    if cfg.g_ack and cfg.ack_punctures:
        rest = rest.at[..., jnp.asarray(ack_pos)].set(0)
    data = rest[..., jnp.asarray(data_idx)]
    csi2_llrs = rest[..., jnp.asarray(csi2_pos)] if cfg.g_csi2 else None
    return data, ack_llrs, csi_llrs, csi2_llrs


def decode_uci_parts(ack_llrs, csi_llrs, nof_ack_bits: int, nof_csi1_bits: int,
                     csi2_llrs=None, nof_csi2_bits: int = 0):
    """Decode the UCI payloads; returns dict of (bits, ok) per part."""
    out = {}
    if ack_llrs is not None and nof_ack_bits:
        bits, ok = uci_mod.decode_uci(ack_llrs.astype(jnp.float32), nof_ack_bits)
        out["ack"] = (bits, ok)
    if csi_llrs is not None and nof_csi1_bits:
        bits, ok = uci_mod.decode_uci(csi_llrs.astype(jnp.float32), nof_csi1_bits)
        out["csi1"] = (bits, ok)
    if csi2_llrs is not None and nof_csi2_bits:
        bits, ok = uci_mod.decode_uci(csi2_llrs.astype(jnp.float32), nof_csi2_bits)
        out["csi2"] = (bits, ok)
    return out
