"""UCI multiplexed on PUSCH through the full processor (transmit -> channel
-> process): HARQ-ACK + CSI1 decode alongside the data TB."""

import numpy as np
import pytest

from srsran_project_tpu.ops.modulation import Modulation
from srsran_project_tpu.phy import pusch
from srsran_project_tpu.phy.allocation import Allocation


def _cfg(o_ack=2, o_csi=6):
    alloc = Allocation(rb_start=0, rb_count=24, sym_start=0, sym_count=14, dmrs_symbols=(2, 11))
    return pusch.PuschConfig(
        tbs=2048, target_code_rate=0.3, modulation=Modulation.QAM16, alloc=alloc,
        nof_layers=1, nof_rx_ports=1, nof_grid_sc=288,
        uci=pusch.UciOnPuschConfig(nof_harq_ack_bits=o_ack, nof_csi1_bits=o_csi),
    )


def test_uci_on_pusch_end_to_end():
    cfg = _cfg()
    rng = np.random.default_rng(0)
    tb = rng.integers(0, 2, size=(cfg.tbs,), dtype=np.uint8)
    ack = np.asarray([1, 0], np.uint8)
    csi = rng.integers(0, 2, size=(6,), dtype=np.uint8)
    rnti = np.uint32(0xBEEF)
    grid = pusch.transmit(tb, rnti, cfg, ack_bits=ack, csi1_bits=csi)
    noisy = np.asarray(grid) * 0.9 + (
        rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)
    ).astype(np.complex64) * 0.02
    out = pusch.process(noisy.astype(np.complex64), rnti, cfg)
    assert bool(np.asarray(out["tb_crc_ok"]))
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), tb)
    np.testing.assert_array_equal(np.asarray(out["harq_ack_bits"]), ack)
    np.testing.assert_array_equal(np.asarray(out["csi1_bits"]), csi)


def test_uci_sizes_follow_betas():
    small = _cfg().uci_mux
    big = pusch.PuschConfig(
        tbs=2048, target_code_rate=0.3, modulation=Modulation.QAM16,
        alloc=_cfg().alloc, nof_grid_sc=288,
        uci=pusch.UciOnPuschConfig(nof_harq_ack_bits=2, nof_csi1_bits=6,
                                   beta_harq_ack_index=13, beta_csi_index=13),
    ).uci_mux
    assert big.g_ack > small.g_ack
    assert big.g_csi1 > small.g_csi1
    # Data G shrinks by exactly the reserved CSI bits.
    assert _cfg().sch.nof_total_bits == _cfg().g_total - small.g_csi1


def test_no_uci_is_plain_pusch():
    cfg = pusch.PuschConfig(
        tbs=2048, target_code_rate=0.3, modulation=Modulation.QAM16,
        alloc=_cfg().alloc, nof_grid_sc=288)
    assert cfg.uci_mux is None
    assert cfg.sch.nof_total_bits == cfg.g_total


def test_uci_on_pusch_via_upper_phy():
    from srsran_project_tpu.fapi import messages as fapi
    from srsran_project_tpu.phy.upper_phy import UpperPhy, UpperPhyConfig
    from srsran_project_tpu.ran.constants import SubcarrierSpacing
    from srsran_project_tpu.ran.slot_point import SlotPoint

    cfg = _cfg()
    rng = np.random.default_rng(1)
    tb = rng.integers(0, 2, size=(cfg.tbs,), dtype=np.uint8)
    ack = np.asarray([0, 1], np.uint8)
    csi = rng.integers(0, 2, size=(6,), dtype=np.uint8)
    rnti = np.uint32(0x777)
    grid = np.asarray(pusch.transmit(tb, rnti, cfg, ack_bits=ack, csi1_bits=csi))[None][0]
    phy = UpperPhy(UpperPhyConfig(nof_ports=1, nof_grid_sc=288))
    slot = SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, 0, 0)
    req = fapi.UlTtiRequest(slot=slot, pusch=[fapi.UlPuschPdu(cfg, 0x777)])
    res = phy.process_ul_tti(req, grid + 1e-3)
    assert res.crc[0].tb_crc_ok
    kinds = {tuple(u.uci_bits.tolist()) for u in res.uci}
    assert tuple(ack.tolist()) in kinds
    assert tuple(csi.tolist()) in kinds


def test_uci_rate_matched_ack_end_to_end():
    # 5-bit ACK payload: rate-matched (not punctured) per TS 38.212 6.2.7.
    cfg = _cfg(o_ack=5, o_csi=7)
    assert not cfg.uci_mux.ack_punctures
    assert cfg.sch.nof_total_bits == (
        cfg.g_total - cfg.uci_mux.g_ack - cfg.uci_mux.g_csi1)
    rng = np.random.default_rng(5)
    tb = rng.integers(0, 2, size=(cfg.tbs,), dtype=np.uint8)
    ack = rng.integers(0, 2, size=(5,), dtype=np.uint8)
    csi = rng.integers(0, 2, size=(7,), dtype=np.uint8)
    rnti = np.uint32(0xBEEF)
    grid = pusch.transmit(tb, rnti, cfg, ack_bits=ack, csi1_bits=csi)
    noisy = np.asarray(grid) * 0.9 + (
        rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)
    ).astype(np.complex64) * 0.02
    out = pusch.process(noisy.astype(np.complex64), rnti, cfg)
    assert bool(np.asarray(out["tb_crc_ok"]))
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), tb)
    assert bool(np.asarray(out["harq_ack_ok"]))
    np.testing.assert_array_equal(np.asarray(out["harq_ack_bits"]), ack)
    np.testing.assert_array_equal(np.asarray(out["csi1_bits"]), csi)


def test_reserved_ack_layout_in_processor():
    # 1-2 bit ACK: reserved layout sized for 2 bits, data punctured only at
    # the actual coded ACK positions.
    cfg = _cfg(o_ack=1, o_csi=0)
    mux = cfg.uci_mux
    assert mux.ack_punctures and mux.g_ack_rvd >= mux.g_ack
    assert cfg.sch.nof_total_bits == cfg.g_total  # data maps through


def test_all_three_uci_streams_end_to_end():
    # ACK + CSI1 + CSI2 through the full processor.
    alloc = Allocation(rb_start=0, rb_count=24, sym_start=0, sym_count=14,
                      dmrs_symbols=(2, 11))
    cfg = pusch.PuschConfig(
        tbs=2048, target_code_rate=0.3, modulation=Modulation.QAM16,
        alloc=alloc, nof_layers=1, nof_rx_ports=1, nof_grid_sc=288,
        uci=pusch.UciOnPuschConfig(nof_harq_ack_bits=2, nof_csi1_bits=6,
                                   nof_csi2_bits=9),
    )
    assert cfg.uci_mux.g_csi2 > 0
    rng = np.random.default_rng(3)
    tb = rng.integers(0, 2, size=(cfg.tbs,), dtype=np.uint8)
    ack = np.asarray([1, 1], np.uint8)
    csi1 = rng.integers(0, 2, size=(6,), dtype=np.uint8)
    csi2 = rng.integers(0, 2, size=(9,), dtype=np.uint8)
    rnti = np.uint32(0xBEEF)
    grid = pusch.transmit(tb, rnti, cfg, ack_bits=ack, csi1_bits=csi1,
                          csi2_bits=csi2)
    noisy = np.asarray(grid) * 0.9 + (
        rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)
    ).astype(np.complex64) * 0.02
    out = pusch.process(noisy.astype(np.complex64), rnti, cfg)
    assert bool(np.asarray(out["tb_crc_ok"]))
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), tb)
    np.testing.assert_array_equal(np.asarray(out["harq_ack_bits"]), ack)
    np.testing.assert_array_equal(np.asarray(out["csi1_bits"]), csi1)
    np.testing.assert_array_equal(np.asarray(out["csi2_bits"]), csi2)


@pytest.mark.parametrize("rank", [1, 2, 4])
def test_two_step_csi_part2_sizing(rank):
    """CSI part 2 size follows the decoded part-1 RI (reference
    uci_part2_size_calculator flow): the receiver is configured only with
    the report config; the rank and part-2 payload come out right for
    every allowed rank."""
    from srsran_project_tpu.ran import csi as csi_mod

    report = csi_mod.CsiReportConfig(nof_csi_rs_ports=4)
    n1 = csi_mod.part1_bitwidth(report)
    ri_off, ri_w, sizes = csi_mod.part2_correspondence(report)
    v = report.allowed_ranks.index(rank)
    n2 = sizes[v]

    alloc = Allocation(rb_start=0, rb_count=24, sym_start=0, sym_count=14,
                       dmrs_symbols=(2, 11))
    cfg = pusch.PuschConfig(
        tbs=2048, target_code_rate=0.3, modulation=Modulation.QAM16, alloc=alloc,
        nof_layers=1, nof_rx_ports=1, nof_grid_sc=288,
        uci=pusch.UciOnPuschConfig(
            nof_harq_ack_bits=1, nof_csi1_bits=n1,
            nof_csi2_bits=max(sizes),  # G reservation covers the max size
            csi_report_cfg=report))

    rng = np.random.default_rng(rank)
    tb = rng.integers(0, 2, size=(cfg.tbs,), dtype=np.uint8)
    csi1 = np.zeros(n1, np.uint8)
    for j in range(ri_w):
        csi1[ri_off + j] = (v >> (ri_w - 1 - j)) & 1
    csi1[ri_w:] = rng.integers(0, 2, n1 - ri_w)
    csi2 = rng.integers(0, 2, size=(n2,), dtype=np.uint8)
    # Pad TX part 2 to the reserved size the receiver rate-matched for.
    csi2_tx = np.concatenate([csi2, np.zeros(max(sizes) - n2, np.uint8)])
    rnti = np.uint32(0x2468)
    grid = pusch.transmit(tb, rnti, cfg, ack_bits=np.asarray([1], np.uint8),
                          csi1_bits=csi1, csi2_bits=csi2)
    noisy = np.asarray(grid) + (
        rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)
    ).astype(np.complex64) * 0.02
    out = pusch.process(noisy.astype(np.complex64), rnti, cfg)
    assert bool(np.asarray(out["tb_crc_ok"]))
    assert int(out["csi_rank"]) == rank
    assert int(out["nof_csi2_bits"]) == n2
    np.testing.assert_array_equal(np.asarray(out["csi1_bits"]), csi1)
    np.testing.assert_array_equal(np.asarray(out["csi2_bits"])[:n2], csi2)
