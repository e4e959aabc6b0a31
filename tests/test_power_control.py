"""Closed-loop UL power control (the reference's enterprise-stubbed
pusch_power_controller, implemented for real): TPC toward target SINR with
prohibit window, PHR capping, and PHR-driven PRB shrink."""

from srsran_project_tpu.l2sim.power_control import (
    TPC_STEPS_DB,
    PowerControlConfig,
    PuschPowerController,
)


def test_tpc_drives_sinr_toward_target():
    pc = PuschPowerController(PowerControlConfig(target_sinr_db=20.0,
                                                 prohibit_slots=10))
    sinr = 12.0
    slot = 0
    # Simulated plant: each commanded dB shows up in the next measurement.
    for _ in range(40):
        pc.handle_pusch_snr(0x4601, slot, sinr)
        tpc = pc.compute_tpc(0x4601, slot)
        sinr += TPC_STEPS_DB[tpc]
        slot += 10
    assert abs(sinr - 20.0) <= 1.5
    assert pc.closed_loop_db(0x4601) >= 7.0  # accumulated up-commands


def test_prohibit_window_blocks_rapid_commands():
    pc = PuschPowerController(PowerControlConfig(prohibit_slots=80))
    pc.handle_pusch_snr(1, 0, 10.0)
    assert pc.compute_tpc(1, 0) == 3  # big error -> +3 dB
    pc.handle_pusch_snr(1, 10, 10.0)
    assert pc.compute_tpc(1, 10) == 1  # prohibited: 0 dB
    assert pc.compute_tpc(1, 100) != 1  # window expired


def test_phr_caps_up_commands_and_shrinks_prbs():
    pc = PuschPowerController(PowerControlConfig(prohibit_slots=0))
    pc.handle_pusch_snr(2, 0, 5.0)
    pc.handle_phr(2, ph_db=-4.0)
    # Power-limited UE: no up-command despite being far below target.
    assert pc.compute_tpc(2, 0) == 1
    # And the grant shrinks: -4 dB deficit needs two halvings (3 dB each).
    assert pc.adapt_prbs_to_phr(2, 48) == 12
    pc.handle_phr(2, ph_db=10.0)
    assert pc.adapt_prbs_to_phr(2, 48) == 48
    assert pc.compute_tpc(2, 1) == 3


def test_down_commands_above_target():
    pc = PuschPowerController(PowerControlConfig(target_sinr_db=20.0,
                                                 prohibit_slots=0))
    pc.handle_pusch_snr(3, 0, 26.0)
    tpc = pc.compute_tpc(3, 0)
    assert TPC_STEPS_DB[tpc] == -1.0
    assert pc.closed_loop_db(3) == -1.0


def test_scheduler_feeds_power_control_from_crc_snr():
    import numpy as np

    from srsran_project_tpu.fapi import messages as fapi
    from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler, SchedulerConfig
    from srsran_project_tpu.ran.constants import SubcarrierSpacing
    from srsran_project_tpu.ran.slot_point import SlotPoint

    sched = RoundRobinScheduler(SchedulerConfig(nof_rb=24, max_ues_per_slot=1))
    sched.add_ue(0x4601, mcs=10)
    slot = SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, 0, 0)
    res = fapi.SlotResults(slot=slot, crc=[
        fapi.CrcIndicationPdu(0x4601, 0, True, snr_db=9.0)])
    sched.handle_results(res)
    # Far below the 20 dB default target: a +3 dB command follows.
    assert sched.power_control.compute_tpc(0x4601, slot.count) == 3


def test_pucch_controller_uses_its_own_target():
    from srsran_project_tpu.l2sim.power_control import PucchPowerController

    pc = PucchPowerController()
    pc.handle_pusch_snr(5, 0, 4.0)   # 6 dB under the 10 dB PUCCH target
    assert pc.compute_tpc(5, 0) == 3
    pc2 = PucchPowerController()
    pc2.handle_pusch_snr(5, 0, 10.5)
    assert pc2.compute_tpc(5, 0) == 1
