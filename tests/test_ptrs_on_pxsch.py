"""PT-RS on PxSCH: TX insertion, RX common-phase-error tracking + LLR
erasure, end-to-end under per-symbol phase noise."""

import dataclasses

import numpy as np

from srsran_project_tpu.ops.modulation import Modulation
from srsran_project_tpu.phy import pdsch, pusch
from srsran_project_tpu.phy.allocation import Allocation


def _cfgs(ptrs=True):
    alloc = Allocation(rb_start=0, rb_count=24, sym_start=0, sym_count=14, dmrs_symbols=(2,))
    common = dict(tbs=2048, target_code_rate=0.3, modulation=Modulation.QAM16, alloc=alloc,
                  nof_layers=1, nof_grid_symbols=14, nof_grid_sc=288)
    tx = pdsch.PdschConfig(nof_ports=1, ptrs_enabled=ptrs, **common)
    rx = pusch.PuschConfig(nof_rx_ports=1, ptrs_enabled=ptrs, **common)
    return tx, rx


def test_ptrs_present_on_grid():
    tx, _ = _cfgs()
    rng = np.random.default_rng(0)
    tb = rng.integers(0, 2, size=(tx.tbs,), dtype=np.uint8)
    grid = np.asarray(pdsch.process(tb, np.uint32(1), np.eye(1, dtype=np.complex64), tx))
    idx, vals, syms = pdsch.ptrs_layout(tx)
    np.testing.assert_allclose(grid.reshape(-1)[idx], vals, atol=1e-6)
    # 12 PT-RS PRBs on each of 13 data symbols.
    assert len(idx) == 12 * 13


def test_cpe_tracking_recovers_under_phase_noise():
    tx, rx = _cfgs(ptrs=True)
    tx_off, rx_off = _cfgs(ptrs=False)
    rng = np.random.default_rng(1)
    tb = rng.integers(0, 2, size=(tx.tbs,), dtype=np.uint8)
    rnti = np.uint32(0x42)
    w = np.eye(1, dtype=np.complex64)
    grid = np.asarray(pdsch.process(tb, rnti, w, tx))
    grid_off = np.asarray(pdsch.process(tb, rnti, w, tx_off))

    # Random per-symbol common phase (phase noise), constant across SCs.
    phases = rng.uniform(-1.5, 1.5, 14)
    phases[2] = 0.0  # keep the DM-RS symbol clean for a fair estimate
    rot = np.exp(1j * phases)[None, :, None].astype(np.complex64)
    noise = (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)
             ).astype(np.complex64) * 0.02

    out = pusch.process((grid * rot + noise).astype(np.complex64), rnti, rx)
    assert bool(np.asarray(out["tb_crc_ok"]))
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), tb)

    # Without PT-RS the same phase noise breaks 16QAM decoding.
    out_off = pusch.process((grid_off * rot + noise).astype(np.complex64), rnti, rx_off)
    assert not bool(np.asarray(out_off["tb_crc_ok"]))


def test_ptrs_erasure_only_hits_punctured_bits():
    _, rx = _cfgs()
    pos = pusch._ptrs_bit_positions(rx)
    assert len(pos) == 12 * 13 * 4  # QAM16, 1 layer
    assert len(np.unique(pos)) == len(pos)
