"""PDCCH processor: grid structure, CCE/REG mapping (incl. interleaved and
multi-symbol CORESETs), blind-decode loopback through the polar chain."""

import numpy as np
import pytest

from srsran_project_tpu.ops import polar, scrambling
from srsran_project_tpu.ops.modulation import Modulation, demap_soft
from srsran_project_tpu.phy import pdcch


def _cfg(**kw):
    base = dict(payload_bits=40, aggregation_level=2, cce_index=0,
                coreset_rb_start=10, coreset_rb_count=24, symbol=0)
    base.update(kw)
    return pdcch.PdcchConfig(**base)


def test_grid_structure_1sym():
    cfg = _cfg()
    rng = np.random.default_rng(0)
    dci = rng.integers(0, 2, size=(40,), dtype=np.uint8)
    grid = np.asarray(pdcch.process(dci, np.uint32(0x4601), cfg))
    # 2 CCEs = 12 REGs = 12 PRBs on symbol 0 starting at PRB 10.
    region = grid[0, 10 * 12 : 22 * 12]
    assert (np.abs(region) > 0.1).all()
    assert np.abs(grid[1:]).max() == 0
    assert np.abs(grid[0, : 10 * 12]).max() == 0


def test_multi_symbol_coreset():
    cfg = _cfg(duration=2, aggregation_level=2, coreset_rb_count=12)
    dci = np.zeros(40, np.uint8)
    grid = np.asarray(pdcch.process(dci, np.uint32(1), cfg))
    # 12 REGs over 2 symbols -> 6 PRBs on each of symbols 0 and 1.
    assert (np.abs(grid[0, 10 * 12 : 16 * 12]) > 0.1).all()
    assert (np.abs(grid[1, 10 * 12 : 16 * 12]) > 0.1).all()
    assert np.abs(grid[2:]).max() == 0


def test_interleaved_mapping_spreads_regs():
    cfg_i = _cfg(interleaved=True, reg_bundle_size=2, interleaver_rows=2,
                 coreset_rb_count=48, aggregation_level=1)
    regs_i = pdcch._cce_to_regs(cfg_i)
    cfg_n = _cfg(interleaved=False, coreset_rb_count=48, aggregation_level=1)
    regs_n = pdcch._cce_to_regs(cfg_n)
    assert sorted(regs_n) == list(range(6))  # contiguous
    # Interleaved: same count, but spread across the CORESET.
    assert len(regs_i) == 6
    assert max(regs_i) - min(regs_i) > 6
    # All CCEs together tile the CORESET exactly once.
    all_regs = []
    for cce in range(8):
        all_regs += pdcch._cce_to_regs(_cfg(interleaved=True, reg_bundle_size=2,
                                            interleaver_rows=2, coreset_rb_count=48,
                                            aggregation_level=1, cce_index=cce))
    assert sorted(all_regs) == list(range(48))


@pytest.mark.parametrize("al,interleaved", [(1, False), (4, False), (2, True)])
def test_blind_decode_loopback(al, interleaved):
    cfg = _cfg(aggregation_level=al, coreset_rb_count=24,
               interleaved=interleaved, reg_bundle_size=6, interleaver_rows=2,
               n_rnti=0x4601)
    rng = np.random.default_rng(al)
    dci = rng.integers(0, 2, size=(40,), dtype=np.uint8)
    rnti = np.uint32(0x4601)
    grid = np.asarray(pdcch.process(dci, rnti, cfg))
    # UE-side blind decode: extract data REs, demap, descramble, polar decode.
    data_idx, _, _, _ = pdcch._re_indices(cfg)
    syms = grid.reshape(-1)[data_idx]
    nvar = np.full(syms.shape, 0.05, np.float32)
    llr = np.asarray(demap_soft(syms, nvar, Modulation.QPSK))
    c_init = ((0x4601 << 16) + cfg.n_id) % (1 << 31)
    seq = scrambling.gold_ref(c_init, len(llr))
    llr = np.where(seq == 1, -llr, llr).astype(np.float32)
    lin = polar.rate_dematch_llrs(llr, cfg.code)
    u = np.asarray(polar.decode(np.asarray(lin), cfg.code))
    from srsran_project_tpu.ops.polar import tables as ptab

    pi = ptab.input_interleaver(cfg.code.k)
    deint = np.empty_like(u)
    deint[pi] = u
    # CRC24C with RNTI mask must check out.
    from srsran_project_tpu.ops import crc as crc_mod

    ones = np.ones(24, np.uint8)
    payload, crc_bits = deint[:40], deint[40:]
    rnti_bits = np.asarray([(0x4601 >> (15 - i)) & 1 for i in range(16)], np.uint8)
    crc_unmasked = crc_bits.copy()
    crc_unmasked[8:] ^= rnti_bits
    want = crc_mod.crc_ref(np.concatenate([ones, payload]), "24C")
    np.testing.assert_array_equal(crc_unmasked, want)
    np.testing.assert_array_equal(payload, dci)
