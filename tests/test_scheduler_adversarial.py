"""Adversarial scheduler-engine tests (VERDICT r2 weak #6): collision and
exhaustion behavior of the PUCCH/PDCCH allocators and the fallback stage
at loads the happy-path tests never reach — the shape of the reference's
hundreds of unittests/scheduler cases."""

import numpy as np
import pytest

from srsran_project_tpu.l2sim import pdcch_alloc as pa
from srsran_project_tpu.l2sim import pucch_alloc as pua
from srsran_project_tpu.ran.constants import SubcarrierSpacing
from srsran_project_tpu.ran.slot_point import SlotPoint

SCS = SubcarrierSpacing.KHZ30


def _slot(i):
    return SlotPoint.from_sfn_slot(SCS, (i // 20) % 1024, i % 20)


# --------------------------------------------------------------- PDCCH ----

def test_pdcch_exhaustion_never_double_books_cces():
    """Hammer one small CORESET with far more DCIs than CCEs: every grant's
    CCE span must be disjoint, the allocator must refuse once full, and a
    fresh slot must fully recover."""
    coresets = {1: pa.CoresetConfig(id=1, rb_start=0, nof_rbs=24, duration=2)}
    sss = {2: pa.SearchSpaceConfig(id=2, coreset_id=1, is_common=False,
                                   nof_candidates=(4, 4, 2, 1, 0))}
    nof_cces = 24 * 2 // 6
    for slot_index in range(10):
        alloc = pa.PdcchSlotAllocator(coresets, sss)
        used = set()
        granted = refused = 0
        for rnti in range(0x100, 0x100 + 50):
            for al in (8, 4, 2, 1):
                g = alloc.alloc_dci(rnti, 2, al, slot_index=slot_index)
                if g is None:
                    refused += 1
                    continue
                span = set(range(g.cce_index, g.cce_index + g.aggregation_level))
                assert not (span & used), (slot_index, rnti, al, span, used)
                assert max(span) < nof_cces
                used |= span
                granted += 1
        assert granted >= 1 and refused > 0
        # The coreset can never over-fill.
        assert len(used) <= nof_cces


def test_pdcch_candidate_hashing_varies_by_slot_and_rnti():
    """UE-specific candidates must move with slot and rnti (Y_p recursion):
    a static allocator would starve the same UEs every slot."""
    coresets = {1: pa.CoresetConfig(id=1, rb_start=0, nof_rbs=48, duration=1)}
    sss = {2: pa.SearchSpaceConfig(id=2, coreset_id=1, is_common=False,
                                   nof_candidates=(0, 0, 2, 0, 0))}
    seen = set()
    for slot_index in range(8):
        alloc = pa.PdcchSlotAllocator(coresets, sss)
        g = alloc.alloc_dci(0x4601, 2, 4, slot_index=slot_index)
        seen.add(g.cce_index)
    assert len(seen) > 1


# --------------------------------------------------------------- PUCCH ----

def _cell_cfg():
    return pua.default_pucch_cell_config(52)


def test_pucch_f1_code_multiplexing_capacity_and_exhaustion():
    """Fill resource set 0 past its code-multiplexing capacity: every
    accepted grant must be unique in (prb, ics, occ), and the allocator
    must refuse beyond capacity instead of colliding."""
    alloc = pua.PucchSlotAllocator(_cell_cfg())
    taken = set()
    accepted = refused = 0
    for i in range(200):
        rnti = 0x200 + i
        g = alloc.alloc_harq_ack(rnti, pri=i % 8, nof_bits=1)
        if g is None:
            refused += 1
            continue
        accepted += 1
        r = g.resource
        key = (r.prb, getattr(r, "initial_cyclic_shift", None),
               getattr(r, "occ_index", None), getattr(r, "start_symbol", 0))
        assert key not in taken, key
        taken.add(key)
    assert accepted >= 8  # at least the PRI-addressable set
    assert refused > 0    # and the allocator said no at some point


def test_pucch_f2_collision_blocks_not_corrupts():
    """F2 (CSI) resources are frequency-exclusive: a second UE on the same
    PRBs must be refused, and after the set is exhausted every further CSI
    alloc fails cleanly."""
    alloc = pua.PucchSlotAllocator(_cell_cfg())
    got, refused = [], 0
    for i in range(100):
        g = alloc.alloc_csi(0x300 + i, nof_bits=6)
        if g is None:
            refused += 1
        else:
            got.append(g)
    prbs = [(g.resource.prb, g.resource.start_symbol) for g in got]
    assert len(prbs) == len(set(prbs)), "two CSI grants share a resource"
    assert refused > 0


def test_fallback_never_exceeds_band_under_pressure():
    """Dozens of queued SRB payloads against a narrow band: grants must
    stay inside [rb_start, nof_rb) and never overlap each other."""
    from srsran_project_tpu.l2sim import fallback

    fb = fallback.FallbackScheduler(
        {0: pa.CoresetConfig(id=0, rb_start=0, nof_rbs=48, duration=2)},
        {0: pa.SearchSpaceConfig(id=0, coreset_id=0, is_common=True,
                                 nof_candidates=(0, 0, 8, 4, 0))},
        nof_rb=24, srb_rb_count=6)
    for i in range(12):
        fb.add_ue(0x500 + i, conres_id=bytes([i] * 6))
        fb.handle_dl_buffer_state(0x500 + i, b"\x11" * 16, is_srb0=True)
    for slot in range(4):
        grants = fb.run_slot(slot, rb_start=6)
        spans = [(g.rb_start, g.rb_start + g.rb_count) for g in grants]
        for a, b in spans:
            assert 6 <= a and b <= 24, spans
        for i, (a, b) in enumerate(spans):
            for c, d in spans[i + 1:]:
                assert b <= c or d <= a, spans
        # ACK everything granted so the queue drains across slots.
        for g in grants:
            fb.handle_ack(g.rnti, g.harq_id, True)


def test_qos_policy_starvation_resistance_with_extreme_weights():
    """A 1000:1 QoS weight spread must not starve the light UEs: the PF
    denominator (avg_rate) guarantees eventual service."""
    from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler, SchedulerConfig

    sched = RoundRobinScheduler(SchedulerConfig(
        nof_rb=48, max_ues_per_slot=2, policy="qos"))
    for i in range(8):
        sched.add_ue(0x600 + i, mcs=10,
                     qos_weight=1000.0 if i == 0 else 1.0)
    rng = np.random.default_rng(0)
    served = {0x600 + i: 0 for i in range(8)}
    for k in range(400):
        dl, _, _, _ = sched.run_slot(_slot(k), rng)
        for p in dl.pdsch:
            served[p.rnti] += 1
    assert all(v > 0 for v in served.values()), served
    assert served[0x600] >= max(served[r] for r in served if r != 0x600)
