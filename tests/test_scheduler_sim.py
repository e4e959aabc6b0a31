"""Scheduler simulator driving the upper PHY end-to-end: multi-UE slots,
HARQ retransmission lifecycle, round-robin fairness."""

import jax
import numpy as np

from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler, SchedulerConfig
from srsran_project_tpu.phy import channel_emulator as chem
from srsran_project_tpu.phy.upper_phy import UpperPhy, UpperPhyConfig
from srsran_project_tpu.ran.constants import SubcarrierSpacing
from srsran_project_tpu.ran.slot_point import SlotPoint


def _slot(i):
    return SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, i // 20, i % 20)


def test_multi_ue_slots_end_to_end():
    cfg = SchedulerConfig(nof_rb=48, max_ues_per_slot=2)
    sched = RoundRobinScheduler(cfg)
    for r in (0x10, 0x11, 0x12):
        sched.add_ue(r, mcs=4)
    phy = UpperPhy(UpperPhyConfig(nof_ports=1))
    ch = chem.ChannelConfig(profile="single", sinr_db=25.0, nof_sc=624)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    served = set()
    for i in range(6):
        dl, tx, ul, grants = sched.run_slot(_slot(i), rng)
        assert len(grants) == 2
        grid = phy.process_dl_tti(dl, tx)
        key, sub = jax.random.split(key)
        rx, _, _ = chem.apply_channel(grid, sub, ch)
        res = phy.process_ul_tti(ul, rx)
        sched.handle_results(res)
        served.update(r for r, _, _ in grants)
    # Round robin reaches every UE.
    assert served == {0x10, 0x11, 0x12}
    rep = sched.report()
    assert all(v["ul_bits_ok"] > 0 for v in rep.values())


def test_harq_retransmission_lifecycle():
    cfg = SchedulerConfig(nof_rb=24, max_ues_per_slot=1)
    sched = RoundRobinScheduler(cfg)
    ue = sched.add_ue(0x20, mcs=8)
    phy = UpperPhy(UpperPhyConfig(nof_ports=1))
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(1)

    # Slot 0: terrible SNR -> NACK; same HARQ retransmits 8 slots later at
    # good SNR and must combine to an ACK.
    snrs = [-10.0] + [30.0] * 2
    harq_hist = []
    for i in range(3):
        slot = SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, 0, (i * 8) % 20)
        dl, tx, ul, grants = sched.run_slot(slot, rng)
        harq_hist.append((grants[0][1], ul.pusch[0].new_data))
        grid = phy.process_dl_tti(dl, tx)
        ch = chem.ChannelConfig(profile="single", sinr_db=snrs[i], nof_sc=624)
        key, sub = jax.random.split(key)
        rx, _, _ = chem.apply_channel(grid, sub, ch)
        res = phy.process_ul_tti(ul, rx)
        sched.handle_results(res)
    # Same HARQ process id, first new_data then retransmission.
    assert harq_hist[0][0] == harq_hist[1][0]
    assert harq_hist[0][1] is True and harq_hist[1][1] is False
    assert ue.ul_bits_ok > 0


def test_tdd_pattern_gates_directions():
    from srsran_project_tpu.ran.tdd import PATTERN_7D2U, SlotDirection, TddPattern

    p = PATTERN_7D2U
    dirs = [p.direction(i).value for i in range(10)]
    assert dirs == ["dl"] * 7 + ["special"] + ["ul"] * 2
    assert p.is_dl_symbol(7, 2) and not p.is_dl_symbol(7, 10)
    assert p.is_ul_symbol(7, 12) and not p.is_ul_symbol(7, 5)

    cfg = SchedulerConfig(nof_rb=24, max_ues_per_slot=1, tdd_pattern=p)
    sched = RoundRobinScheduler(cfg)
    sched.add_ue(0x30, mcs=4)
    rng = np.random.default_rng(0)
    dl, tx, ul, grants = sched.run_slot(_slot(0), rng)  # DL slot
    assert dl.pdsch and not ul.pusch
    dl, tx, ul, grants = sched.run_slot(_slot(8), rng)  # UL slot
    assert ul.pusch and not dl.pdsch
    dl, tx, ul, grants = sched.run_slot(_slot(7), rng)  # special
    assert not dl.pdsch and not ul.pusch


def test_qos_policy_prefers_weighted_ue():
    from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler, SchedulerConfig

    cfg = SchedulerConfig(nof_rb=24, max_ues_per_slot=1, policy="qos")
    sched = RoundRobinScheduler(cfg)
    sched.add_ue(0x1, mcs=4, qos_weight=1.0)
    heavy = sched.add_ue(0x2, mcs=4, qos_weight=4.0)
    rng = np.random.default_rng(0)
    served = {0x1: 0, 0x2: 0}
    for i in range(40):
        _, _, ul, grants = sched.run_slot(_slot(i % 20), rng)
        for rnti, _, _ in grants:
            served[rnti] += 1
        # Clear HARQ state so every slot grants fresh data.
        for ue in sched.ues.values():
            for h in ue.harqs:
                h.active, h.tb, h.nof_tx = False, None, 0
    # The 4x-weighted UE gets roughly 4x the grants (PF with equal rates).
    assert served[0x2] > served[0x1] * 2
    assert served[0x1] > 0  # starvation-free


def test_sr_triggers_demand_driven_ul_grant():
    """PUCCH F0 SR through the PHY -> UCI indication -> UL grant appears."""
    import jax.numpy as jnp

    from srsran_project_tpu.fapi import messages as fapi
    from srsran_project_tpu.phy import pucch as pucch_mod

    cfg = SchedulerConfig(nof_rb=24, max_ues_per_slot=1, ul_demand_driven=True)
    sched = RoundRobinScheduler(cfg)
    ue = sched.add_ue(0x44, mcs=4)
    rng = np.random.default_rng(0)

    # without SR/BSR: DL only, no UL grant
    dl, tx, ul, grants = sched.run_slot(_slot(0), rng)
    assert dl.pdsch and not ul.pusch and not grants

    # the UE signals SR on a PUCCH F0 occasion (cyclic-shift candidate set)
    phy = UpperPhy(UpperPhyConfig(nof_ports=1))
    f0 = pucch_mod.PucchFormat0Config(prb=0, start_symbol=13, nof_symbols=1,
                                      initial_cyclic_shift=0, n_id=17,
                                      nof_harq_bits=1, sr_opportunity=True)
    sig = pucch_mod.format0_generate(f0, 1, sr=True)
    grid = np.zeros((1, 14, 624), np.complex64)
    grid[0, 13, :12] = np.asarray(sig)[-1]
    req = fapi.UlTtiRequest(slot=_slot(1), pucch=[fapi.UlPucchPdu(f0, 0x44)])
    res = phy.process_ul_tti(req, jnp.asarray(grid))
    assert res.uci and res.uci[0].valid
    bits = np.asarray(res.uci[0].uci_bits)
    assert bits[-1] == 1  # SR positive (trailing bit)
    sched.handle_sr(res.uci[0].rnti)

    # next slot: UL grant present; after serving, demand clears again
    dl, tx, ul, grants = sched.run_slot(_slot(2), rng)
    assert ul.pusch and grants and grants[0][0] == 0x44
    # BSR keeps UL flowing while backlog remains
    sched.handle_bsr(0x44, 10_000)
    dl, tx, ul, grants = sched.run_slot(_slot(3), rng)
    assert ul.pusch
    assert ue.ul_buffer_bytes < 10_000  # grant consumed part of the backlog
