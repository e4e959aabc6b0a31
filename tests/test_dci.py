"""DCI formats 0_0/1_0: packing round trips, RIV, and the full control
path: scheduler DCI -> PDCCH encode -> UE-side receive -> unpack -> the
grant parameters match."""

import numpy as np
import pytest

from srsran_project_tpu.ran import dci


@pytest.mark.parametrize("bwp", [24, 48, 52, 273])
def test_riv_roundtrip(bwp):
    for rb_start in (0, 1, bwp // 2, bwp - 1):
        for rb_count in (1, 2, bwp - rb_start):
            if rb_start + rb_count > bwp:
                continue  # not a valid allocation
            riv = dci.riv_encode(rb_start, rb_count, bwp)
            assert dci.riv_decode(riv, bwp) == (rb_start, rb_count)


def test_dci_1_0_pack_unpack():
    d = dci.Dci10(rb_start=12, rb_count=24, time_domain_assignment=3, mcs=17,
                  new_data=False, rv=2, harq_id=7, dai=1, tpc=2,
                  pucch_resource=5, harq_feedback_timing=4)
    bits = dci.pack_dci_1_0(d, 48)
    assert len(bits) == dci.dci_1_0_size(48)
    assert dci.unpack_dci_1_0(bits, 48) == d


def test_dci_0_0_size_aligned_to_1_0():
    d = dci.Dci00(rb_start=0, rb_count=48, mcs=9, harq_id=3)
    bits = dci.pack_dci_0_0(d, 48)
    assert len(bits) == dci.dci_1_0_size(48)
    out = dci.unpack_dci_0_0(bits, 48)
    assert (out.rb_start, out.rb_count, out.mcs, out.harq_id) == (0, 48, 9, 3)


def test_scheduler_dci_through_pdcch_to_ue():
    import jax.numpy as jnp

    from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler, SchedulerConfig
    from srsran_project_tpu.phy import pdcch
    from srsran_project_tpu.phy.upper_phy import UpperPhy, UpperPhyConfig
    from srsran_project_tpu.ran.constants import SubcarrierSpacing
    from srsran_project_tpu.ran.slot_point import SlotPoint

    cfg = SchedulerConfig(nof_rb=48, max_ues_per_slot=1, emit_dci=True)
    sched = RoundRobinScheduler(cfg)
    sched.add_ue(0x4601, mcs=10)
    rng = np.random.default_rng(0)
    slot = SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, 0, 0)
    dl, tx, ul, grants = sched.run_slot(slot, rng)
    assert dl.pdcch and dl.pdcch[0].rnti == 0x4601

    phy = UpperPhy(UpperPhyConfig(nof_ports=1))
    grid = np.asarray(phy.process_dl_tti(dl, tx))
    # UE: blind-decode the candidate with its RNTI and read the grant
    pc = dl.pdcch[0].config
    bits, ok = pdcch.receive(jnp.asarray(grid[0]), jnp.uint32(0x4601), pc)
    assert bool(ok)
    d = dci.unpack_dci_1_0(np.asarray(bits), cfg.nof_rb)
    assert (d.rb_start, d.rb_count) == (0, 48)
    assert d.mcs == 10 and d.new_data and d.rv == 0
    # another RNTI's candidate check fails (CRC mask)
    _, bad = pdcch.receive(jnp.asarray(grid[0]), jnp.uint32(0x9999), pc)
    assert not bool(bad)
