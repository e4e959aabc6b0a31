"""PDCCH processor: DCI payload -> resource grid.

Counterpart of the reference's pdcch_processor/encoder/modulator
(lib/phy/upper/channel_processors/pdcch/pdcch_processor_impl.cpp):
CRC24C attach with RNTI masking (TS 38.212 §7.3.2) -> input interleaving ->
polar encode + rate match -> scrambling -> QPSK -> CCE/REG mapping with
DM-RS (TS 38.211 §7.3.2/§7.4.1.3).  Static per PdcchConfig; non-interleaved
CCE-to-REG mapping, 1-symbol CORESET in this version.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import polar, scrambling
from ..ops.modulation import Modulation, map_bits
from ..ran.constants import NRE


@dataclasses.dataclass(frozen=True)
class PdcchConfig:
    payload_bits: int  # DCI size A (without CRC)
    aggregation_level: int  # 1, 2, 4, 8, 16 (CCEs)
    cce_index: int
    coreset_rb_start: int
    coreset_rb_count: int  # multiple of 6 / duration
    symbol: int = 0  # first CORESET symbol
    duration: int = 1  # CORESET duration in symbols (1-3)
    interleaved: bool = False  # CCE-to-REG interleaving (TS 38.211 §7.3.2.2)
    reg_bundle_size: int = 6  # L: 2, 3 or 6
    interleaver_rows: int = 2  # R: 2, 3 or 6
    shift_index: int = 0  # n_shift (cell id by default in spec)
    n_id: int = 0  # pdcch-DMRS-ScramblingID / cell id
    n_rnti: int = 0  # for data scrambling (UE-specific search space)
    nof_grid_symbols: int = 14
    nof_grid_sc: int = 624
    slot_in_frame: int = 0

    @property
    def nof_regs(self) -> int:
        return self.coreset_rb_count * self.duration

    @property
    def nof_coded_bits(self) -> int:
        # L CCEs x 6 REGs x 9 data REs x 2 bits (QPSK).
        return self.aggregation_level * 6 * 9 * 2

    @functools.cached_property
    def code(self) -> polar.PolarCode:
        return polar.construct(self.payload_bits + 24, self.nof_coded_bits, n_max=9)


def _crc24c_with_rnti(payload: jax.Array, rnti: jax.Array) -> jax.Array:
    """TS 38.212 §7.3.2: prepend 24 ones, CRC24C, mask last 16 CRC bits
    with the RNTI; returns payload+CRC (ones dropped)."""
    from ..ops import crc as crc_mod

    ones = jnp.ones(payload.shape[:-1] + (24,), jnp.uint8)
    ext = jnp.concatenate([ones, payload.astype(jnp.uint8)], axis=-1)
    c = crc_mod.crc(ext, "24C")
    rnti_bits = (
        (jnp.asarray(rnti, jnp.uint32)[..., None] >> jnp.arange(15, -1, -1, dtype=jnp.uint32)) & 1
    ).astype(jnp.uint8)
    c = c.at[..., 8:].set(c[..., 8:] ^ rnti_bits)
    return jnp.concatenate([payload.astype(jnp.uint8), c], axis=-1)


@functools.lru_cache(maxsize=None)
def _cce_to_regs(cfg: PdcchConfig) -> list[int]:
    """REG indices of this PDU's CCEs, after optional REG-bundle
    interleaving (TS 38.211 §7.3.2.2).

    REGs are numbered time-first within the CORESET: REG j sits at symbol
    (j mod duration), PRB (j // duration).  CCE i consists of bundles
    f(6i/L + 0..6/L-1), where f is the block interleaver over
    N_bundle = N_REG / L with R rows: f(cR + r) = (rC + c + n_shift) mod N.
    """
    l = cfg.reg_bundle_size
    n_reg = cfg.nof_regs
    n_bundle = n_reg // l
    if cfg.interleaved:
        r_rows = cfg.interleaver_rows
        c_cols = n_bundle // r_rows
        assert r_rows * c_cols == n_bundle, "N_bundle must divide by R"
        f = [0] * n_bundle
        for x in range(n_bundle):
            c, r = divmod(x, r_rows)
            f[x] = (r * c_cols + c + cfg.shift_index) % n_bundle
    else:
        f = list(range(n_bundle))
    regs = []
    bundles_per_cce = 6 // l
    for i in range(cfg.cce_index, cfg.cce_index + cfg.aggregation_level):
        for b in range(bundles_per_cce):
            bundle = f[i * bundles_per_cce + b]
            regs.extend(range(bundle * l, (bundle + 1) * l))
    return regs


@functools.lru_cache(maxsize=None)
def _re_indices(cfg: PdcchConfig):
    """(data_flat_idx (Nd,), dmrs_flat_idx (Np,), dmrs_seq_idx (Np,),
    dmrs_sym (Np,))."""
    data, dmrs, seq, dsym = [], [], [], []
    for reg in _cce_to_regs(cfg):
        sym = cfg.symbol + (reg % cfg.duration)
        prb = cfg.coreset_rb_start + reg // cfg.duration
        base = sym * cfg.nof_grid_sc + prb * NRE
        for re in range(NRE):
            if re % 4 == 1:
                dmrs.append(base + re)
                # DM-RS sequence index counts pilot triplets from CRB0.
                seq.append(prb * 3 + re // 4)
                dsym.append(sym)
            else:
                data.append(base + re)
    # Coded symbols map onto the allocated REs in (symbol, frequency)
    # ascending order, NOT in CCE/REG enumeration order — the reference
    # modulator derives a PRB mask from the CCEs and fills it sequentially
    # (pdcch_modulator_impl.cpp mapping; golden-tested).  Sort all index
    # arrays by flat grid position (symbol-major).
    data = np.sort(np.asarray(data, np.int32))
    order = np.argsort(np.asarray(dmrs, np.int32), kind="stable")
    return (
        data,
        np.asarray(dmrs, np.int32)[order],
        np.asarray(seq, np.int32)[order],
        np.asarray(dsym, np.int32)[order],
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def process(payload: jax.Array, rnti: jax.Array, cfg: PdcchConfig) -> jax.Array:
    """Encode one DCI into a single-port resource grid (nsym, nsc)."""
    with_crc = _crc24c_with_rnti(payload, rnti)
    coded = polar.encode(with_crc, cfg.code, interleave_input=True)
    c_init = (jnp.asarray(cfg.n_rnti, jnp.uint32) << 16) + jnp.uint32(cfg.n_id)
    coded = scrambling.scramble_bits(coded, c_init)
    syms = map_bits(coded, Modulation.QPSK)

    data_idx, dmrs_idx, seq_idx, dmrs_sym = _re_indices(cfg)
    grid = jnp.zeros((cfg.nof_grid_symbols * cfg.nof_grid_sc,), jnp.complex64)
    grid = grid.at[jnp.asarray(data_idx)].set(syms)

    # PDCCH DM-RS (TS 38.211 §7.4.1.3): per-symbol c_init from slot/n_id.
    nseq = int(seq_idx.max()) + 1
    for sym in sorted(set(int(s) for s in dmrs_sym)):
        ci = ((1 << 17) * (14 * cfg.slot_in_frame + sym + 1) * (2 * cfg.n_id + 1)
              + 2 * cfg.n_id) % (1 << 31)
        c = scrambling.gold_sequence(np.uint32(ci), 2 * nseq)
        re_p = 1.0 - 2.0 * c[0::2].astype(jnp.float32)
        im_p = 1.0 - 2.0 * c[1::2].astype(jnp.float32)
        pilots = ((re_p + 1j * im_p) / np.sqrt(2)).astype(jnp.complex64)
        mask = dmrs_sym == sym
        grid = grid.at[jnp.asarray(dmrs_idx[mask])].set(pilots[jnp.asarray(seq_idx[mask])])
    return grid.reshape(cfg.nof_grid_symbols, cfg.nof_grid_sc)


@functools.lru_cache(maxsize=None)
def _re_groups(cfg: PdcchConfig):
    """Group ids mapping every data/DM-RS RE to its (symbol, PRB) REG for
    LS channel estimation on receive."""
    data_idx, dmrs_idx, seq_idx, dmrs_sym = _re_indices(cfg)
    def group_of(flat):
        sym = flat // cfg.nof_grid_sc
        prb = (flat % cfg.nof_grid_sc) // NRE
        return sym * (cfg.nof_grid_sc // NRE) + prb
    groups = sorted({int(group_of(i)) for i in dmrs_idx})
    gid = {g: k for k, g in enumerate(groups)}
    data_g = np.asarray([gid[int(group_of(i))] for i in data_idx], np.int32)
    dmrs_g = np.asarray([gid[int(group_of(i))] for i in dmrs_idx], np.int32)
    return data_g, dmrs_g, len(groups)


@functools.partial(jax.jit, static_argnames=("cfg",))
def receive(grid: jax.Array, rnti: jax.Array, cfg: PdcchConfig):
    """UE-side PDCCH reception for one candidate: (nsym, nsc) grid ->
    (dci_bits (payload_bits,) uint8, crc_ok bool).

    LS channel estimate per REG from the PDCCH DM-RS, ZF equalize, QPSK
    soft demap, descramble, polar rate-dematch + SSC decode, CRC24C with
    the RNTI mask (blind-decode candidate check).
    """
    flat = grid.reshape(-1)
    data_idx, dmrs_idx, seq_idx, dmrs_sym = _re_indices(cfg)
    data_g, dmrs_g, n_groups = _re_groups(cfg)

    # reference pilots (same construction as process())
    nseq = int(seq_idx.max()) + 1
    ref = jnp.zeros((len(dmrs_idx),), jnp.complex64)
    for sym in sorted(set(int(s) for s in dmrs_sym)):
        ci = ((1 << 17) * (14 * cfg.slot_in_frame + sym + 1) * (2 * cfg.n_id + 1)
              + 2 * cfg.n_id) % (1 << 31)
        c = scrambling.gold_sequence(np.uint32(ci), 2 * nseq)
        re_p = 1.0 - 2.0 * c[0::2].astype(jnp.float32)
        im_p = 1.0 - 2.0 * c[1::2].astype(jnp.float32)
        pilots = ((re_p + 1j * im_p) / np.sqrt(2)).astype(jnp.complex64)
        mask = dmrs_sym == sym
        ref = ref.at[jnp.asarray(np.where(mask)[0])].set(pilots[jnp.asarray(seq_idx[mask])])

    rx_p = flat[jnp.asarray(dmrs_idx)]
    # per-REG LS estimate: mean of rx * conj(ref) over the REG's pilots
    num = jnp.zeros((n_groups,), jnp.complex64).at[jnp.asarray(dmrs_g)].add(rx_p * jnp.conj(ref))
    cnt = jnp.zeros((n_groups,), jnp.float32).at[jnp.asarray(dmrs_g)].add(1.0)
    h = num / (cnt + 1e-12)

    rx_d = flat[jnp.asarray(data_idx)]
    hd = h[jnp.asarray(data_g)]
    eq = rx_d * jnp.conj(hd) / (jnp.abs(hd) ** 2 + 1e-9)
    # QPSK LLRs (sign convention: positive = bit 0), interleaved re/im
    scale = 2.0 * np.sqrt(2.0)
    llrs = jnp.stack([scale * eq.real, scale * eq.imag], axis=-1).reshape(-1)
    c_init = (jnp.asarray(cfg.n_rnti, jnp.uint32) << 16) + jnp.uint32(cfg.n_id)
    seq = scrambling.gold_sequence(c_init, cfg.nof_coded_bits)
    llrs = jnp.where(seq == 1, -llrs, llrs)
    lin = polar.rate_dematch_llrs(llrs, cfg.code)
    u = polar.decode(lin, cfg.code)
    # undo the DL input interleaver
    from ..ops.polar import tables as ptab

    pi = ptab.input_interleaver(cfg.payload_bits + 24)
    deint = jnp.zeros_like(u)
    deint = deint.at[..., jnp.asarray(pi)].set(u)
    payload, crc_rx = deint[..., : cfg.payload_bits], deint[..., cfg.payload_bits :]
    # unmask the RNTI from the last 16 CRC bits and verify over ones+payload
    rnti_bits = ((jnp.asarray(rnti, jnp.uint32)[..., None]
                  >> jnp.arange(15, -1, -1, dtype=jnp.uint32)) & 1).astype(jnp.uint8)
    crc_rx = crc_rx.at[..., 8:].set(crc_rx[..., 8:] ^ rnti_bits)
    from ..ops import crc as crc_mod

    ones = jnp.ones(payload.shape[:-1] + (24,), jnp.uint8)
    expected = crc_mod.crc(jnp.concatenate([ones, payload], axis=-1), "24C")
    ok = jnp.all(expected == crc_rx, axis=-1)
    return payload, ok
