"""Link adaptation: CQI->MCS mapping, OLLA convergence, scheduler integration."""

import numpy as np

from srsran_project_tpu.l2sim.link_adaptation import CQI_TABLE, LinkAdaptor, cqi_to_mcs
from srsran_project_tpu.ran.tbs import mcs_to_qm_rate


def test_cqi_to_mcs_monotone_and_bounded():
    prev = 0
    for cqi in range(1, 16):
        mcs = cqi_to_mcs(cqi, "qam64")
        assert mcs >= prev
        # selected MCS efficiency never exceeds the CQI's efficiency
        # (except the MCS-0 floor, which cannot go lower)
        qm_c, r_c = CQI_TABLE[cqi]
        qm_m, r_m = mcs_to_qm_rate(mcs, "qam64")
        assert mcs == 0 or qm_m * r_m <= qm_c * r_c / 1024.0 + 1e-9
        prev = mcs
    assert cqi_to_mcs(0) == 0 and cqi_to_mcs(15, "qam256") > cqi_to_mcs(15, "qam64") - 28


def test_olla_steps_and_saturation():
    la = LinkAdaptor(target_bler=0.1, step_db=0.5)
    la.handle_csi(1, 10)
    base = la.select_mcs(1)
    for _ in range(8):
        la.handle_crc(1, ok=False)  # repeated NACKs push MCS down
    assert la.select_mcs(1) < base
    for _ in range(500):
        la.handle_crc(1, ok=True)
    assert la.olla[1].offset_db <= la.max_offset  # saturates
    assert la.select_mcs(1) >= base


def test_olla_converges_to_target_bler():
    """Simulated channel: NACK iff MCS > threshold; the loop must settle
    so the NACK rate ~ target."""
    rng = np.random.default_rng(0)
    la = LinkAdaptor(target_bler=0.1, step_db=0.25)
    la.handle_csi(1, 12)  # optimistic CQI
    nacks = trials = 0
    for k in range(4000):
        mcs = la.select_mcs(1)
        # channel truth: mcs <= 15 always OK; 16..19 fails 50%; >19 fails
        if mcs > 19:
            ok = False
        elif mcs > 15:
            ok = rng.random() > 0.5
        else:
            ok = True
        la.handle_crc(1, ok)
        if k > 1000:
            trials += 1
            nacks += not ok
    rate = nacks / trials
    assert 0.02 < rate < 0.25, f"long-run BLER {rate} not near target 0.1"


def test_scheduler_uses_adapted_mcs():
    from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler, SchedulerConfig

    sched = RoundRobinScheduler(SchedulerConfig(nof_rb=24, max_ues_per_slot=1))
    ue = sched.add_ue(0x10, mcs=4)
    la = LinkAdaptor()
    la.handle_csi(0x10, 14)
    ue.mcs = la.select_mcs(0x10)
    assert ue.mcs > 4  # CQI 14 raises the grant MCS


def test_scheduler_closes_csi_to_mcs_loop():
    """CSI part-1 UCI indications drive the UE's MCS through the link
    adaptor (CQI -> MCS + OLLA), closing the reporting loop end-to-end."""
    import numpy as np

    from srsran_project_tpu.fapi import messages as fapi
    from srsran_project_tpu.l2sim.link_adaptation import LinkAdaptor
    from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler, SchedulerConfig
    from srsran_project_tpu.ran import csi as csi_mod
    from srsran_project_tpu.ran.constants import SubcarrierSpacing
    from srsran_project_tpu.ran.slot_point import SlotPoint

    report = csi_mod.CsiReportConfig(nof_csi_rs_ports=4)
    sched = RoundRobinScheduler(SchedulerConfig(nof_rb=24, max_ues_per_slot=1))
    sched.link_adaptor = LinkAdaptor()
    sched.csi_report_cfg = report
    sched.add_ue(0x4601, mcs=10)

    n1 = csi_mod.part1_bitwidth(report)
    bits = np.zeros(n1, np.uint8)
    csi_mod._deposit(bits, n1 - 4, 4, 14)  # wideband CQI 14 (last field)
    slot = SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, 0, 0)
    res = fapi.SlotResults(slot=slot, uci=[
        fapi.UciIndicationPdu(0x4601, bits, True, 20.0)])
    sched.handle_results(res)
    high = sched.ues[0x4601].mcs
    assert high > 10  # CQI 14 pushes above the starting MCS

    bits2 = np.zeros(n1, np.uint8)
    csi_mod._deposit(bits2, n1 - 4, 4, 3)  # CQI 3
    sched.handle_results(fapi.SlotResults(slot=slot, uci=[
        fapi.UciIndicationPdu(0x4601, bits2, True, 20.0)]))
    assert sched.ues[0x4601].mcs < high
