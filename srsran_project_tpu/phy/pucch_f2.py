"""PUCCH Format 2: UCI on QPSK with DM-RS, encode (UE side, for tests) and
demodulate+decode (gNB side).

Counterpart of the reference's pucch_demodulator_format2 + UCI decode
(lib/phy/upper/channel_processors/pucch/pucch_demodulator_format2.cpp).
Layout per TS 38.211 §6.3.2.5/§6.4.1.3.2: data on REs k mod 3 != 1, DM-RS
on k mod 3 == 1 of every allocated PRB, 1-2 symbols; scrambling with
c_init = rnti * 2^15 + n_id; UCI coded with the ops.uci codec.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import scrambling, uci
from ..ops.estimator import estimate_channel
from ..ops.modulation import Modulation, demap_soft, map_bits
from ..ran.constants import NRE


@dataclasses.dataclass(frozen=True)
class PucchFormat2Config:
    rb_start: int
    rb_count: int
    start_symbol: int
    nof_symbols: int  # 1 or 2
    nof_uci_bits: int
    rnti: int
    n_id: int = 0  # data scrambling
    n_id0: int = 0  # DM-RS scrambling
    slot_in_frame: int = 0
    nof_rx_ports: int = 1
    nof_grid_sc: int = 624
    # Intra-slot frequency hopping (2-symbol F2 only): RB start of the
    # second symbol (reference format2_configuration.second_hop_prb).
    second_hop_rb_start: int | None = None

    def rb_start_of(self, sym_rel: int) -> int:
        if sym_rel > 0 and self.second_hop_rb_start is not None:
            return self.second_hop_rb_start
        return self.rb_start

    @property
    def nof_data_re(self) -> int:
        return self.rb_count * 8 * self.nof_symbols  # 8 data REs per PRB

    @property
    def nof_coded_bits(self) -> int:
        return self.nof_data_re * 2  # QPSK


@functools.lru_cache(maxsize=None)
def _re_layout(cfg: PucchFormat2Config):
    data, dmrs = [], []
    for si, sym in enumerate(range(cfg.start_symbol, cfg.start_symbol + cfg.nof_symbols)):
        rb0 = cfg.rb_start_of(si)
        for rb in range(rb0, rb0 + cfg.rb_count):
            for re in range(NRE):
                k = sym * cfg.nof_grid_sc + rb * NRE + re
                (dmrs if re % 3 == 1 else data).append(k)
    return np.asarray(data, np.int32), np.asarray(dmrs, np.int32)


def _dmrs_pilots(cfg: PucchFormat2Config) -> np.ndarray:
    """(nsym, 4*rb_count) QPSK pilots (TS 38.211 §6.4.1.3.2.1)."""
    out = []
    for si, sym in enumerate(range(cfg.start_symbol, cfg.start_symbol + cfg.nof_symbols)):
        c_init = ((1 << 17) * (14 * cfg.slot_in_frame + sym + 1) * (2 * cfg.n_id0 + 1)
                  + 2 * cfg.n_id0) % (1 << 31)
        # Pilot index counts 4 per PRB from CRB0, at this symbol's hop.
        rb0 = cfg.rb_start_of(si)
        n0 = rb0 * 4
        n1 = (rb0 + cfg.rb_count) * 4
        c = scrambling.gold_ref(c_init, 2 * n1)
        re = 1.0 - 2.0 * c[0::2].astype(np.float32)
        im = 1.0 - 2.0 * c[1::2].astype(np.float32)
        out.append(((re + 1j * im) / np.sqrt(2))[n0:n1])
    return np.stack(out).astype(np.complex64)


def _c_init(cfg: PucchFormat2Config) -> int:
    return (cfg.rnti << 15) + cfg.n_id


def generate(cfg: PucchFormat2Config, bits: np.ndarray) -> np.ndarray:
    """UE-side grid (nsym_total, nsc) for tests."""
    coded = np.asarray(uci.encode_uci(bits, cfg.nof_coded_bits))
    scr = np.asarray(scrambling.scramble_bits(coded, np.uint32(_c_init(cfg))))
    syms = np.asarray(map_bits(scr, Modulation.QPSK))
    grid = np.zeros((14 * cfg.nof_grid_sc,), np.complex64)
    data_idx, dmrs_idx = _re_layout(cfg)
    grid[data_idx] = syms
    grid[dmrs_idx] = _dmrs_pilots(cfg).reshape(-1)
    return grid.reshape(14, cfg.nof_grid_sc)


@functools.partial(jax.jit, static_argnames=("cfg",))
def process(grid: jax.Array, cfg: PucchFormat2Config):
    """(P, nsym, nsc) received grid -> (uci_bits, ok, snr_db)."""
    p = cfg.nof_rx_ports
    gflat = grid.reshape(p, -1)
    data_idx, dmrs_idx = _re_layout(cfg)

    # Channel estimate from DM-RS: pilots at k % 3 == 1, 4 per PRB.
    y_p = gflat[:, jnp.asarray(dmrs_idx)].reshape(p, cfg.nof_symbols, -1)
    ref = jnp.asarray(_dmrs_pilots(cfg))[None]  # (1, nsym, Np)
    wf = jnp.ones((y_p.shape[-1],), jnp.float32)
    pair_pos = tuple(
        float((3 * i + 1 + 3 * (i + 1) + 1) / 2 - 0) for i in range(0, y_p.shape[-1], 2)
    )  # pair centers in allocation subcarriers
    if cfg.second_hop_rb_start is None:
        h, nvar, metrics = estimate_channel(y_p, ref, wf, pair_pos, cfg.rb_count * NRE)
        h_per_sym = [h] * cfg.nof_symbols
    else:
        # Frequency hopping: each symbol sees a different channel segment;
        # estimate per symbol from its own DM-RS.
        h_per_sym, nvars = [], []
        for si in range(cfg.nof_symbols):
            h_s, nvar_s, metrics = estimate_channel(
                y_p[:, si : si + 1], ref[:, si : si + 1], wf, pair_pos,
                cfg.rb_count * NRE)
            h_per_sym.append(h_s)
            nvars.append(nvar_s)
        nvar = jnp.stack(nvars).mean(axis=0)

    # Equalize data REs (MRC across ports), per symbol hop.
    data_per_sym = cfg.rb_count * 8
    sc_list = []
    for si in range(cfg.nof_symbols):
        seg = data_idx[si * data_per_sym : (si + 1) * data_per_sym]
        sc_list.append((seg % cfg.nof_grid_sc) - cfg.rb_start_of(si) * NRE)
    sc_of_data = np.concatenate(sc_list)
    h_d = jnp.concatenate(
        [h_per_sym[si][:, jnp.asarray(sc_list[si])] for si in range(cfg.nof_symbols)],
        axis=1)  # (P, Nd)
    y_d = gflat[:, jnp.asarray(data_idx)]
    num = (jnp.conj(h_d) * y_d).sum(axis=0)
    den = (jnp.abs(h_d) ** 2).sum(axis=0) + 1e-12
    x_hat = num / den
    eq_nvar = nvar.mean() / den

    llrs = demap_soft(x_hat, eq_nvar, Modulation.QPSK)
    seq = scrambling.gold_sequence(jnp.uint32(_c_init(cfg)), llrs.shape[-1])
    llrs = jnp.where(seq == 1, -llrs, llrs)
    bits, ok = uci.decode_uci(llrs, cfg.nof_uci_bits)
    snr_db = 10.0 * jnp.log10(jnp.maximum(metrics["snr"].mean(), 1e-12))
    return bits, ok, snr_db
