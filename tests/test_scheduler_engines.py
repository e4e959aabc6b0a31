"""Scheduler engines: CCE-level PDCCH allocation, PUCCH resource
allocation + UCI multiplexing (mirrors the reference's
tests/unittests/scheduler/{pdcch,pucch,uci} patterns)."""

import numpy as np
import pytest

from srsran_project_tpu.l2sim import pdcch_alloc as pa
from srsran_project_tpu.l2sim import pucch_alloc as pua
from srsran_project_tpu.l2sim import uci_alloc as ua
from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler, SchedulerConfig
from srsran_project_tpu.ran.constants import SubcarrierSpacing
from srsran_project_tpu.ran.slot_point import SlotPoint


# ------------------------------------------------------------- PDCCH ----


def _coresets():
    return {1: pa.CoresetConfig(id=1, rb_start=0, nof_rbs=48, duration=1)}  # 8 CCEs


def _search_spaces():
    return {
        1: pa.SearchSpaceConfig(id=1, coreset_id=1, is_common=True,
                                nof_candidates=(0, 0, 2, 1, 0)),
        2: pa.SearchSpaceConfig(id=2, coreset_id=1, is_common=False,
                                nof_candidates=(0, 4, 2, 1, 0)),
    }


def test_pdcch_candidates_golden():
    """Candidate lowest-CCE formulas bit-exact vs the reference
    (tests/golden/pdcch_candidates, lib/ran/pdcch/pdcch_candidates.cpp)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "golden", "pdcch_candidates",
                        "manifest.json")
    if not os.path.exists(path):
        pytest.skip("golden suite not generated")
    cases = json.load(open(path))
    assert len(cases) > 200
    for case in cases:
        ref = tuple(int(x) for x in case["candidates"].split(",") if x != "")
        got = pa.candidates_lowest_cce(
            case["al"], case["nof_candidates"], case["nof_cces"],
            is_common=case["kind"] == "common",
            coreset_id=case.get("coreset_id", 0),
            rnti=case.get("rnti", 0),
            slot_index=case.get("slot_index", 0),
        )
        assert got == ref, case


def test_pdcch_allocation_and_collisions():
    alloc = pa.PdcchSlotAllocator(_coresets(), _search_spaces())
    g1 = alloc.alloc_dci(0x4601, 1, 8)  # AL8 in an 8-CCE CORESET: full
    assert g1 is not None and g1.cce_index == 0
    # Nothing else fits now.
    assert alloc.alloc_dci(0x4602, 1, 4) is None
    assert alloc.alloc_dci(0x4603, 2, 2) is None
    alloc.cancel(g1)
    assert alloc.nof_used_cces(1) == 0
    # Two AL4 common candidates fit (candidates at 0 and 4).
    a = alloc.alloc_dci(0x4601, 1, 4)
    b = alloc.alloc_dci(0x4602, 1, 4)
    assert a is not None and b is not None
    assert {a.cce_index, b.cce_index} == {0, 4}
    # Third AL4: both candidates taken.
    assert alloc.alloc_dci(0x4603, 1, 4) is None
    # AL2 UE-SS may still find a hole only if its hashed candidates miss
    # the used CCEs — with the CORESET full, it cannot.
    assert alloc.nof_used_cces(1) == 8
    assert alloc.alloc_dci(0x4604, 2, 2) is None


def test_pdcch_ue_candidates_vary_with_slot_and_rnti():
    cands_a = pa.candidates_lowest_cce(4, 2, 48, False, 1, 0x4601, 0)
    cands_b = pa.candidates_lowest_cce(4, 2, 48, False, 1, 0x4601, 7)
    cands_c = pa.candidates_lowest_cce(4, 2, 48, False, 1, 0x4702, 0)
    assert len({cands_a, cands_b, cands_c}) >= 2  # hashing spreads


# ------------------------------------------------------------- PUCCH ----


def _pucch_cfg():
    return pua.default_pucch_cell_config(52)


def test_pucch_harq_ack_via_pri_and_growth_to_f2():
    al = pua.PucchSlotAllocator(_pucch_cfg())
    g = al.alloc_harq_ack(0x4601, pri=3)
    assert g is not None and g.resource.format == 1
    assert g.resource.id == 3
    g2 = al.alloc_harq_ack(0x4601, pri=3)  # second ACK bit stays on F1
    assert g2 is not None and g2.resource.format == 1 and g2.nof_harq_bits == 2
    g3 = al.alloc_harq_ack(0x4601, pri=3)  # third bit: move to F2
    assert g3 is not None and g3.resource.format == 2 and g3.nof_harq_bits == 3
    assert len(al.grants) == 1  # one PUCCH per UE


def test_pucch_code_multiplexing_and_collision():
    al = pua.PucchSlotAllocator(_pucch_cfg())
    # Different PRIs -> different cyclic shifts on the same PRB: both fit.
    assert al.alloc_harq_ack(0x4601, pri=0) is not None
    assert al.alloc_harq_ack(0x4602, pri=1) is not None
    # Same PRI from a third UE collides on the identical code resource.
    assert al.alloc_harq_ack(0x4603, pri=0) is None


def test_pucch_f2_collision_blocking():
    cfg = _pucch_cfg()
    al = pua.PucchSlotAllocator(cfg)
    # Fill a UE onto each F2 resource via >2-bit payloads.
    ues = [0x4601, 0x4602, 0x4603, 0x4604]
    for i, rnti in enumerate(ues):
        for _ in range(3):
            g = al.alloc_harq_ack(rnti, pri=i)
        assert al.grants[rnti].resource.format == 2
    # All 4 F2 resources taken: a fifth UE cannot move to F2.
    for _ in range(2):
        assert al.alloc_harq_ack(0x4605, pri=4) is not None
    assert al.alloc_harq_ack(0x4605, pri=4) is None  # needs F2, none free


def test_pucch_sr_and_csi_multiplexing():
    al = pua.PucchSlotAllocator(_pucch_cfg())
    g = al.alloc_sr(0x4601)
    assert g is not None and g.sr and g.resource.format == 1
    g = al.alloc_harq_ack(0x4601, pri=2)
    assert g is not None and g.sr and g.nof_harq_bits == 1
    g = al.alloc_csi(0x4601, 4)
    assert g is not None and g.resource.format == 2 and g.uci_bits == 6


# --------------------------------------------------------------- UCI ----


def test_uci_moves_onto_pusch():
    al = pua.PucchSlotAllocator(_pucch_cfg())
    uci = ua.UciSlotAllocator(al, pusch_rntis={0x4601})
    assert uci.alloc_harq_ack(0x4601, pri=0)
    assert 0x4601 not in al.grants  # no PUCCH: it rides the PUSCH
    assert uci.on_pusch[0x4601].nof_harq_ack_bits == 1
    assert uci.alloc_csi(0x4601, 4)
    assert uci.on_pusch[0x4601].nof_csi_part1_bits == 4
    # A UE without PUSCH still gets a PUCCH.
    assert uci.alloc_harq_ack(0x4602, pri=1)
    assert 0x4602 in al.grants


def test_uci_existing_pucch_folds_into_pusch():
    al = pua.PucchSlotAllocator(_pucch_cfg())
    al.alloc_harq_ack(0x4601, pri=0)
    uci = ua.UciSlotAllocator(al, pusch_rntis={0x4601})
    assert uci.alloc_harq_ack(0x4601, pri=0, nof_bits=1)
    assert 0x4601 not in al.grants
    assert uci.on_pusch[0x4601].nof_harq_ack_bits == 2  # folded + new


# -------------------------------------------- scheduler integration ----


def test_scheduler_with_engines_end_to_end():
    cfg = SchedulerConfig(nof_rb=52, nof_grid_sc=624, max_ues_per_slot=4,
                          use_pdcch_alloc=True, use_pucch_alloc=True, k1=4)
    sched = RoundRobinScheduler(cfg)
    for i in range(6):
        sched.add_ue(0x4601 + i, mcs=10)
    rng = np.random.default_rng(0)
    total_pucch = 0
    for n in range(12):
        slot = SlotPoint(scs=SubcarrierSpacing.KHZ30, count=n)
        dl, tx, ul, grants = sched.run_slot(slot, rng)
        # Every scheduled UE got a PDCCH candidate (engines on).
        assert len(dl.pdsch) <= 4
        total_pucch += len(ul.pucch)
        for pdu in ul.pucch:
            assert pdu.config.nof_grid_sc == 624
    # ACKs booked at slot n appear as PUCCH at slot n+k1.
    assert total_pucch > 0
    assert sched.nof_pucch_blocked == 0


def test_periodic_srs_scheduling():
    """Periodic SRS slot wheel: each UE sounds once per period at its own
    offset; PDUs land on UL slots only (reference srs_scheduler_impl)."""
    import numpy as np

    from srsran_project_tpu.l2sim import scheduler as sched_mod
    from srsran_project_tpu.ran.constants import SubcarrierSpacing
    from srsran_project_tpu.ran.slot_point import SlotPoint

    cfg = sched_mod.SchedulerConfig(use_srs=True)
    s = sched_mod.RoundRobinScheduler(cfg)
    for i in range(3):
        ue = s.add_ue(0x4601 + i)
        ue.dl_backlog = 10_000
    rng = np.random.default_rng(0)
    seen = {}
    for count in range(40):
        slot = SlotPoint(scs=SubcarrierSpacing.KHZ30, count=count)
        _, _, ul, _ = s.run_slot(slot, rng)
        for pdu in ul.srs:
            seen.setdefault(pdu.rnti, []).append(count)
            assert pdu.config.nof_symbols in (1, 2, 4)
    # 3 UEs, period 20, offsets 0/1/2: two soundings each over 40 slots.
    assert sorted(seen) == [0x4601, 0x4602, 0x4603]
    for i, rnti in enumerate(sorted(seen)):
        assert seen[rnti] == [i, 20 + i], (rnti, seen[rnti])
    # Distinct comb offsets / cyclic shifts avoid intra-slot collisions.
    cfgs = [s.srs_sched._ues[r] for r in sorted(seen)]
    assert len({(c.comb_offset, c.cyclic_shift) for c in cfgs}) == 3
