"""Two-cell scheduling (l2sim/multi_cell.py): per-cell schedulers with
shared UE contexts, per-cell FAPI streams driven through the real PHY,
per-cell metrics, and UE mobility between cells — reference architecture
lib/scheduler/cell_scheduler.cpp:92 (one cell_scheduler per cell) +
ue_context/ue_cell.cpp (UE resources on the serving cell)."""

import jax
import numpy as np

from srsran_project_tpu.l2sim.multi_cell import MultiCellScheduler
from srsran_project_tpu.l2sim.scheduler import SchedulerConfig
from srsran_project_tpu.phy import channel_emulator as chem
from srsran_project_tpu.phy.upper_phy import UpperPhy, UpperPhyConfig
from srsran_project_tpu.ran.constants import SubcarrierSpacing
from srsran_project_tpu.ran.slot_point import SlotPoint


def _slot(i):
    return SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, i // 20, i % 20)


def _mk_two_cells():
    return MultiCellScheduler({
        1: SchedulerConfig(nof_rb=48, max_ues_per_slot=2),
        2: SchedulerConfig(nof_rb=24, nof_grid_sc=288, max_ues_per_slot=2),
    })


def test_two_cell_e2e_per_cell_streams():
    """UEs attached on both cells; every slot yields one FAPI stream per
    cell, grants appear only on the UE's serving cell, and both cells'
    traffic decodes through the real PHY."""
    msched = _mk_two_cells()
    cell_of = {0x10: 1, 0x11: 1, 0x20: 2, 0x21: 2}
    for rnti, cid in cell_of.items():
        msched.add_ue(rnti, cid, mcs=4)

    phys = {1: UpperPhy(UpperPhyConfig(nof_ports=1)),
            2: UpperPhy(UpperPhyConfig(nof_ports=1, nof_grid_sc=288))}
    chans = {1: chem.ChannelConfig(profile="single", sinr_db=25.0, nof_sc=624),
             2: chem.ChannelConfig(profile="single", sinr_db=25.0, nof_sc=288)}
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    served = {1: set(), 2: set()}
    for i in range(4):
        streams = msched.run_slot(_slot(i), rng)
        assert set(streams) == {1, 2}
        for cid, (dl, tx, ul, grants) in streams.items():
            # Serving-cell pinning: every grant's UE is homed on this cell.
            for rnti, _h, _t in grants:
                assert cell_of[rnti] == cid, (hex(rnti), cid)
            for pdu in ul.pusch:
                assert cell_of[pdu.rnti] == cid
            served[cid].update(r for r, _, _ in grants)
            grid = phys[cid].process_dl_tti(dl, tx)
            key, sub = jax.random.split(key)
            rx, _, _ = chem.apply_channel(grid, sub, chans[cid])
            res = phys[cid].process_ul_tti(ul, rx)
            msched.handle_results(cid, res)
    assert served[1] == {0x10, 0x11}
    assert served[2] == {0x20, 0x21}
    rep = msched.metrics_report()
    for cid in (1, 2):
        assert rep[cid]["nof_ul_grants"] > 0
        assert rep[cid]["nof_crc_ok"] > 0, rep
        assert rep[cid]["nof_crc_nok"] == 0, rep
        assert rep[cid]["dl_bits"] > 0 and rep[cid]["ul_bits"] > 0
    # The two carriers differ: per-cell bit counts do too.
    assert rep[1]["ul_bits"] > rep[2]["ul_bits"]


def test_move_ue_carries_context():
    """move_ue transfers the WHOLE UE context (HARQ/PF state object
    identity) to the target cell; scheduling follows."""
    msched = MultiCellScheduler({
        1: SchedulerConfig(nof_rb=24, nof_grid_sc=288, max_ues_per_slot=1),
        2: SchedulerConfig(nof_rb=24, nof_grid_sc=288, max_ues_per_slot=1),
    })
    ctx = msched.add_ue(0x30, 1, mcs=4)
    rng = np.random.default_rng(1)
    streams = msched.run_slot(_slot(0), rng)
    assert [r for r, _, _ in streams[1][3]] == [0x30]
    assert streams[2][3] == []
    msched.move_ue(0x30, 2)
    assert msched.ue_context(0x30) is ctx  # same context object, new cell
    streams = msched.run_slot(_slot(1), rng)
    assert streams[1][3] == []
    assert [r for r, _, _ in streams[2][3]] == [0x30]


def test_carrier_aggregation_grants_on_both_carriers():
    """CA: a UE with a PCell + SCell gets grants from BOTH carriers in the
    same slot, with independent per-carrier HARQ contexts (reference
    ue_cell-per-carrier), and both carriers' traffic decodes clean."""
    msched = MultiCellScheduler({
        1: SchedulerConfig(nof_rb=24, nof_grid_sc=288, max_ues_per_slot=1),
        2: SchedulerConfig(nof_rb=24, nof_grid_sc=288, max_ues_per_slot=1),
    })
    pctx = msched.add_ue(0x40, 1, mcs=4)
    sctx = msched.add_scell(0x40, 2, mcs=4)
    assert pctx is not sctx  # independent per-carrier contexts (HARQ etc.)
    assert msched.carriers_of(0x40) == (1, 2)

    phys = {c: UpperPhy(UpperPhyConfig(nof_ports=1, nof_grid_sc=288))
            for c in (1, 2)}
    ch = chem.ChannelConfig(profile="single", sinr_db=25.0, nof_sc=288)
    rng = np.random.default_rng(3)
    key = jax.random.PRNGKey(3)
    granted = {1: 0, 2: 0}
    for i in range(3):
        streams = msched.run_slot(_slot(i), rng)
        for cid, (dl, tx, ul, grants) in streams.items():
            granted[cid] += sum(1 for r, _, _ in grants if r == 0x40)
            if not ul.pusch:
                continue
            grid = phys[cid].process_dl_tti(dl, tx)
            key, sub = jax.random.split(key)
            rx, _, _ = chem.apply_channel(grid, sub, ch)
            res = phys[cid].process_ul_tti(ul, rx)
            msched.handle_results(cid, res)
    assert granted[1] >= 2 and granted[2] >= 2, granted
    # Per-carrier accounting: bits flowed on both carriers.
    rep = msched.metrics_report()
    assert rep[1]["nof_crc_ok"] > 0 and rep[2]["nof_crc_ok"] > 0
    assert rep[1]["nof_crc_nok"] == 0 and rep[2]["nof_crc_nok"] == 0
    # Aggregated UE throughput = sum of the per-carrier contexts.
    assert pctx.ul_bits_ok > 0 and sctx.ul_bits_ok > 0
    # PCell mobility is blocked while an SCell is active.
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        msched.move_ue(0x40, 2)


def test_measurement_gaps_gate_scheduling():
    """UEs with a measurement-gap config get NO grants during their gaps
    and resume after (reference meas-gap gating of the schedulable set)."""
    from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler
    from srsran_project_tpu.l2sim.ue_context_loops import MeasGapConfig

    cfg = SchedulerConfig(nof_rb=24, nof_grid_sc=288, max_ues_per_slot=2,
                          meas_gap=MeasGapConfig(mgrp_ms=20, mgl_ms=6.0,
                                                 gap_offset_ms=0))
    sched = RoundRobinScheduler(cfg)
    sched.add_ue(0x50, mcs=4)
    rng = np.random.default_rng(7)
    granted = []
    # mu=1: period 40 slots, gap covers slots 0..11 of each period.
    for i in range(48):
        _dl, _tx, _ul, grants = sched.run_slot(_slot(i), rng)
        granted.append(bool(grants))
    assert not any(granted[0:12]), "granted inside the gap"
    assert any(granted[12:40]), "never granted outside the gap"
    assert not any(granted[40:48]), "granted inside the second gap"
