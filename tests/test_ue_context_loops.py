"""Scheduler UE-context loops (l2sim/ue_context_loops): TA maintenance
closes estimator-TA -> TA-command MAC CE on a delayed channel, DRX gates
scheduling, SRS SNR drives UL link adaptation."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from srsran_project_tpu.fapi import messages as fapi
from srsran_project_tpu.l2sim import ue_context_loops as ucl
from srsran_project_tpu.l2sim.link_adaptation import ul_mcs_from_snr
from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler, SchedulerConfig
from srsran_project_tpu.ops.modulation import Modulation
from srsran_project_tpu.phy import pusch as pusch_mod
from srsran_project_tpu.phy.allocation import Allocation
from srsran_project_tpu.ran.constants import SubcarrierSpacing
from srsran_project_tpu.ran.slot_point import SlotPoint


def _slot(count):
    return SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, count // 20,
                                   count % 20)


# ---------------------------------------------------------------------------
# TA manager
# ---------------------------------------------------------------------------

def test_ta_manager_command_value():
    """1 us of delay at mu=1 -> new_t_a = round(1e-6/T_C * 2 / 1024) + 31."""
    tm = ucl.TaManager(ucl.TaManagerConfig(measurement_period=4), mu=1)
    tau = 1e-6
    expect = round((tau / ucl.T_C_S) * 2 / 1024.0) + 31
    cmd = None
    for s in range(12):
        tm.handle_ta_seconds(tau, ul_sinr_db=20.0)
        cmd = tm.slot_indication(s)
        if cmd is not None:
            break
    assert cmd == expect, (cmd, expect)


def test_ta_manager_outlier_rejection_and_gate():
    tm = ucl.TaManager(ucl.TaManagerConfig(measurement_period=4,
                                           sinr_threshold_db=10.0), mu=1)
    tm.slot_indication(0)  # idle -> measure
    good = 2000.0  # T_C units
    for _ in range(10):
        tm.handle_ul_n_ta_update(good, ul_sinr_db=20.0)
    tm.handle_ul_n_ta_update(1e6, ul_sinr_db=20.0)   # outlier, filtered
    tm.handle_ul_n_ta_update(1e7, ul_sinr_db=5.0)    # below SINR gate
    cmd = None
    for s in range(1, 8):
        cmd = tm.slot_indication(s)
        if cmd is not None:
            break
    assert cmd == round(good * 2 / 1024.0) + 31


def test_ta_closed_loop_converges_on_delayed_channel():
    """PUSCH through a delayed channel: the estimator TA (compute_ta) flows
    through the CRC indication into the TA manager, which emits the
    correcting command; with the delay removed (UE applied the command)
    the next window emits nothing."""
    rb = 12
    cfg = pusch_mod.PuschConfig(
        tbs=1024, target_code_rate=0.3, modulation=Modulation.QPSK,
        alloc=Allocation(rb_start=0, rb_count=rb, sym_start=0, sym_count=14,
                         dmrs_symbols=(2, 11)),
        nof_grid_sc=rb * 12, compute_ta=True)
    rng = np.random.default_rng(5)
    tb = jnp.asarray(rng.integers(0, 2, size=(1024,), dtype=np.uint8))
    grid = pusch_mod.transmit(tb, jnp.uint32(0x4601), cfg)
    tau = 0.5e-6  # seconds of propagation delay
    k = np.arange(rb * 12)
    ramp = np.exp(-2j * np.pi * k * 30e3 * tau).astype(np.complex64)
    delayed = grid * jnp.asarray(ramp)[None, None, :]
    noise = (rng.standard_normal(delayed.shape)
             + 1j * rng.standard_normal(delayed.shape)).astype(np.complex64)
    out = pusch_mod.process(delayed + 0.01 * jnp.asarray(noise),
                            jnp.uint32(0x4601), cfg)
    ta_est = float(np.asarray(out["ta_s"]))
    assert abs(ta_est - tau) < 0.15e-6, ta_est

    sched = RoundRobinScheduler(SchedulerConfig(
        nof_rb=rb, use_ta_manager=True,
        ta_manager_cfg=ucl.TaManagerConfig(measurement_period=4)))
    ue = sched.add_ue(0x4601)

    rng2 = np.random.default_rng(1)

    def feed(ta_s, start):
        cmds = []
        for s in range(start, start + 10):
            sched.run_slot(_slot(s), rng2)  # ticks the TA manager
            res = fapi.SlotResults(slot=_slot(s))
            res.crc.append(fapi.CrcIndicationPdu(0x4601, 0, True,
                                                 snr_db=25.0, ta_s=ta_s))
            sched.handle_results(res)
            cmds += sched.pop_ta_cmds(0x4601)
            if cmds:
                break
        return cmds

    cmds = feed(ta_est, 0)
    expect = round((tau / ucl.T_C_S) * 2 / 1024.0) + 31
    assert cmds and abs(cmds[0] - expect) <= 1, (cmds, expect)
    # UE applied the command -> residual ~0 -> no further command.
    cmds2 = feed(0.0, 100)
    assert not cmds2, cmds2


# ---------------------------------------------------------------------------
# DRX
# ---------------------------------------------------------------------------

def test_drx_gates_scheduling():
    """With a 8 ms cycle / 1 ms onDuration and no traffic-driven
    extension, grants only appear in the onDuration windows."""
    drx = ucl.DrxConfig(long_cycle_ms=8, long_start_offset_ms=0,
                        on_duration_ms=1, inactivity_ms=0)
    sched = RoundRobinScheduler(SchedulerConfig(nof_rb=12, max_ues_per_slot=1,
                                                drx=drx))
    sched.add_ue(0x4601)
    rng = np.random.default_rng(0)
    granted = []
    for s in range(32):
        dl, _tx, _ul, _g = sched.run_slot(_slot(s), rng)
        if dl.pdsch:
            granted.append(s)
    # mu=1: period 16 slots, window slots {0, 1} of each period.
    assert granted, "DRX never opened"
    assert all(s % 16 in (0, 1) for s in granted), granted


def test_drx_inactivity_extends_active_time():
    drx = ucl.DrxConfig(long_cycle_ms=8, long_start_offset_ms=0,
                        on_duration_ms=1, inactivity_ms=3)
    c = ucl.DrxController(drx, scs_mu=1)
    c.slot_indication(0)
    assert c.is_pdcch_enabled()
    c.on_new_tx_pdcch(1)  # restart inactivity at slot 1 -> active to 7
    for s in range(2, 7):
        c.slot_indication(s)
        assert c.is_pdcch_enabled(), s
    c.slot_indication(7)
    assert not c.is_pdcch_enabled()


def test_drx_sr_keeps_active():
    drx = ucl.DrxConfig(long_cycle_ms=8, on_duration_ms=1, inactivity_ms=0)
    c = ucl.DrxController(drx, scs_mu=1)
    c.slot_indication(5)  # outside the window
    assert not c.is_pdcch_enabled()
    c.sr_pending = True
    assert c.is_pdcch_enabled()


# ---------------------------------------------------------------------------
# SRS-driven channel state
# ---------------------------------------------------------------------------

def test_ul_mcs_from_snr_monotone():
    mcs = [ul_mcs_from_snr(s) for s in (-5, 0, 5, 10, 15, 20, 25, 30)]
    assert mcs == sorted(mcs)
    assert mcs[0] == 0 and mcs[-1] >= 25


def test_srs_snr_drives_ul_mcs_in_scheduler():
    sched = RoundRobinScheduler(SchedulerConfig(
        nof_rb=12, use_srs=True, srs_link_adaptation=True))
    ue = sched.add_ue(0x4601, mcs=10)
    h = np.zeros((1, 8), np.complex64)  # unused by the SNR path
    res = fapi.SlotResults(slot=_slot(0))
    res.srs.append(fapi.SrsIndicationPdu(0x4601, snr_db=28.0,
                                         phase_slope=0.0, h=h))
    sched.handle_results(res)
    high = ue.ul_mcs  # SRS drives the UL-dedicated MCS, not the shared one
    assert ue.mcs == 10  # DL MCS untouched
    res2 = fapi.SlotResults(slot=_slot(1))
    res2.srs.append(fapi.SrsIndicationPdu(0x4601, snr_db=3.0,
                                          phase_slope=0.0, h=h))
    sched.handle_results(res2)
    low = ue.ul_mcs
    assert high > 20 and low < 8, (high, low)
    # The UL grant config follows the UL MCS.
    _dl, ul_cfg, _t, _ut = sched._grant_configs(ue, 12, 0)
    from srsran_project_tpu.ran.tbs import mcs_to_qm_rate
    assert int(ul_cfg.modulation) == mcs_to_qm_rate(low, "qam64")[0]


def test_srs_channel_matrix_rank_selection():
    st = ucl.SrsChannelState(max_rank=2)
    st.update_srs_channel_matrix(np.eye(2, dtype=np.complex128))
    assert st.rank == 2
    st2 = ucl.SrsChannelState(max_rank=2)
    # Rank-1 channel: both rows identical -> rank 1 selected.
    st2.update_srs_channel_matrix(np.asarray([[1.0, 1.0], [1.0, 1.0]],
                                             np.complex128))
    assert st2.rank == 1


def test_drx_on_duration_wrapping_cycle_boundary():
    """An onDuration window crossing the long-cycle boundary ends at the
    WRAPPED end — the unwrapped arithmetic kept the UE active for almost
    a full extra cycle (review r4 finding)."""
    drx = ucl.DrxConfig(long_cycle_ms=8, long_start_offset_ms=7,
                        on_duration_ms=2, inactivity_ms=0)
    c = ucl.DrxController(drx, scs_mu=0)  # period 8, window (7, 9) wraps
    active = []
    for s in range(20):
        c.slot_indication(s)
        if c.is_pdcch_enabled():
            active.append(s)
    # Slot 0 sits in the PREVIOUS cycle's wrapped tail (window
    # slots {-1, 0}) — part of the periodic pattern.
    assert active == [0, 7, 8, 15, 16], active
