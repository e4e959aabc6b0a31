"""Fallback scheduler: SRB0/SRB1 grants on common PDCCH candidates with
ConRes CE and HARQ retx (reference ue_fallback_scheduler semantics)."""

import numpy as np

from srsran_project_tpu.l2 import mac_pdu
from srsran_project_tpu.l2sim import fallback, pdcch_alloc


def build(nof_candidates=(0, 0, 2, 2, 0)):
    coresets = {0: pdcch_alloc.CoresetConfig(id=0, rb_start=0, nof_rbs=48, duration=1)}
    sss = {0: pdcch_alloc.SearchSpaceConfig(id=0, coreset_id=0, is_common=True,
                                            nof_candidates=nof_candidates)}
    return fallback.FallbackScheduler(coresets, sss, nof_rb=52)


def test_srb0_carries_conres_ce_then_acks():
    fb = build()
    ccch = bytes(range(6))
    fb.add_ue(0x4601, conres_id=ccch)
    rrc_setup = b"\x20" * 40
    fb.handle_dl_buffer_state(0x4601, rrc_setup, is_srb0=True)

    grants = fb.run_slot(0)
    assert len(grants) == 1
    g = grants[0]
    assert g.is_srb0 and not g.is_retx
    # ConRes CE (6 bytes of the CCCH SDU) precedes the SRB0 payload.
    assert g.payload[:6] == mac_pdu.ce_con_res_id(ccch)
    assert g.payload[6:] == rrc_setup
    # In flight: nothing more scheduled until HARQ feedback.
    assert fb.run_slot(1) == []
    fb.handle_ack(0x4601, g.harq_id, ack=True)
    assert fb.pending(0x4601) == 0


def test_nack_triggers_retx_until_budget_exhausted():
    fb = build()
    fb.add_ue(0x4601, conres_id=b"abcdef")
    fb.handle_dl_buffer_state(0x4601, b"\x01" * 20, is_srb0=True)
    g0 = fb.run_slot(0)[0]
    fb.handle_ack(0x4601, g0.harq_id, ack=False)
    g1 = fb.run_slot(1)[0]
    assert g1.is_retx and g1.harq_id == g0.harq_id
    fb.handle_ack(0x4601, g1.harq_id, ack=False)
    g2 = fb.run_slot(2)[0]
    assert g2.is_retx
    # Third NACK exhausts the retx budget; the PDU is dropped.
    fb.handle_ack(0x4601, g2.harq_id, ack=False)
    assert fb.run_slot(3) == []
    assert fb.pending(0x4601) == 0


def test_srb1_after_fallback_exit_is_not_scheduled():
    fb = build()
    fb.add_ue(0x17, conres_id=None)
    fb.handle_dl_buffer_state(0x17, b"\x02" * 10)  # SRB1
    assert len(fb.run_slot(0)) == 1
    fb.exit_fallback(0x17)
    fb.handle_dl_buffer_state(0x17, b"\x03" * 10)
    assert fb.run_slot(1) == []  # main UE scheduler owns the UE now


def test_cce_congestion_defers_to_next_slot():
    # A single AL4 candidate and no AL8: two UEs collide if they hash to
    # the same CCEs; the second one must retry next slot.
    fb = build(nof_candidates=(0, 0, 1, 0, 0))
    fb.add_ue(1, conres_id=b"\0" * 6)
    fb.add_ue(2, conres_id=b"\1" * 6)
    fb.handle_dl_buffer_state(1, b"a" * 8, is_srb0=True)
    fb.handle_dl_buffer_state(2, b"b" * 8, is_srb0=True)
    got = {}
    for slot in range(4):
        for g in fb.run_slot(slot):
            got[g.rnti] = slot
            fb.handle_ack(g.rnti, g.harq_id, ack=True)
        if len(got) == 2:
            break
    assert set(got) == {1, 2}


def test_shared_pdcch_allocator_exposes_cce_usage():
    fb = build()
    fb.add_ue(0x4601, conres_id=b"\0" * 6)
    fb.handle_dl_buffer_state(0x4601, b"x" * 8, is_srb0=True)
    shared = pdcch_alloc.PdcchSlotAllocator(fb.coresets, fb.search_spaces)
    grants = fb.run_slot(0, pdcch=shared)
    assert grants and shared.nof_used_cces(0) == grants[0].aggregation_level
