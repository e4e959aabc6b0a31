"""CFO compensation in the PUSCH front end."""

import dataclasses

import numpy as np

from srsran_project_tpu.ops.modulation import Modulation
from srsran_project_tpu.phy import pdsch, pusch
from srsran_project_tpu.phy.allocation import Allocation


def test_cfo_compensation_recovers_tb():
    alloc = Allocation(rb_start=0, rb_count=24, sym_start=0, sym_count=14,
                       dmrs_symbols=(2, 11))
    common = dict(tbs=2048, target_code_rate=0.4, modulation=Modulation.QAM16,
                  alloc=alloc, nof_layers=1, nof_grid_symbols=14, nof_grid_sc=288)
    tx = pdsch.PdschConfig(nof_ports=1, **common)
    rng = np.random.default_rng(0)
    tb = rng.integers(0, 2, size=(2048,), dtype=np.uint8)
    rnti = np.uint32(0x42)
    grid = np.asarray(pdsch.process(tb, rnti, np.eye(1, dtype=np.complex64), tx))

    # Apply a per-symbol phase drift (a CFO) + noise.
    phase_per_sym = 0.3
    rot = np.exp(1j * phase_per_sym * np.arange(14))[None, :, None]
    noisy = grid * rot.astype(np.complex64)
    noisy = noisy + (rng.standard_normal(noisy.shape) + 1j * rng.standard_normal(noisy.shape)
                     ).astype(np.complex64) * 0.02

    rx_off = pusch.PuschConfig(nof_rx_ports=1, cfo_compensation=False, **common)
    rx_on = pusch.PuschConfig(nof_rx_ports=1, cfo_compensation=True, **common)
    out_off = pusch.process(noisy.astype(np.complex64), rnti, rx_off)
    out_on = pusch.process(noisy.astype(np.complex64), rnti, rx_on)

    # With compensation the TB decodes; without, the rotating constellation
    # between DM-RS symbols breaks it at 16QAM.
    assert bool(np.asarray(out_on["tb_crc_ok"]))
    np.testing.assert_array_equal(np.asarray(out_on["tb_bits"]), tb)
    assert not bool(np.asarray(out_off["tb_crc_ok"]))
