"""RAN slicing: quota partitioning, idle-slice donation, PHY integration."""

import jax
import numpy as np

from srsran_project_tpu.l2sim.scheduler import SchedulerConfig
from srsran_project_tpu.l2sim.slicing import SliceConfig, SliceScheduler
from srsran_project_tpu.phy import channel_emulator as chem
from srsran_project_tpu.phy.upper_phy import UpperPhy, UpperPhyConfig
from srsran_project_tpu.ran.constants import SubcarrierSpacing
from srsran_project_tpu.ran.slot_point import SlotPoint


def _slot(i):
    return SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, i // 20, i % 20)


def make(slices, nof_rb=48):
    return SliceScheduler(SchedulerConfig(nof_rb=nof_rb, max_ues_per_slot=2), slices)


def test_quota_respects_min_and_cap():
    ss = make([SliceConfig(1, min_ratio=0.5, max_ratio=0.75),
               SliceConfig(2, min_ratio=0.25, max_ratio=1.0)])
    ss.add_ue(1, 0x10)
    ss.add_ue(2, 0x20)
    rng = np.random.default_rng(0)
    ss.run_slot(_slot(0), rng)
    q = ss.last_quotas
    assert q[1] >= 24 and q[1] <= 36  # min 50%, cap 75% of 48
    assert q[1] + q[2] == 48


def test_idle_slice_donates_band():
    ss = make([SliceConfig(1, min_ratio=0.5), SliceConfig(2, min_ratio=0.5)])
    ss.add_ue(1, 0x10)
    rng = np.random.default_rng(0)
    dl, tx, ul, grants = ss.run_slot(_slot(0), rng)
    assert ss.last_quotas[1] == 48 and ss.last_quotas[2] == 0
    assert [g[1] for g in grants] == [0x10]  # (slice, rnti, harq, tbs)


def test_slices_disjoint_in_frequency_and_decode():
    ss = make([SliceConfig(1, min_ratio=0.5, max_ratio=0.5),
               SliceConfig(2, min_ratio=0.5, max_ratio=0.5)])
    ss.add_ue(1, 0x10, mcs=4)
    ss.add_ue(2, 0x20, mcs=4)
    rng = np.random.default_rng(1)
    dl, tx, ul, grants = ss.run_slot(_slot(0), rng)
    rbs = sorted((p.first_rb, p.first_rb + p.config.alloc.rb_count) for p in dl.pdsch)
    assert rbs[0][1] <= rbs[1][0]  # no overlap
    # both slices' grants decode through the PHY
    phy = UpperPhy(UpperPhyConfig(nof_ports=1))
    grid = phy.process_dl_tti(dl, tx)
    rx, _, _ = chem.apply_channel(grid, jax.random.PRNGKey(0),
                                  chem.ChannelConfig(profile="single", sinr_db=25.0, nof_sc=624))
    res = phy.process_ul_tti(ul, rx)
    ss.handle_results(res)
    assert all(c.tb_crc_ok for c in res.crc) and len(res.crc) == 2
    rep = ss.report()
    assert rep[1][0x10]["ul_bits_ok"] > 0 and rep[2][0x20]["ul_bits_ok"] > 0
