"""Pipelined slot-deadline model (phy/slot_pipeline.py): the depth-D
pipeline implements the reference's max_processing_delay_slots budget —
a slot's results may arrive up to D slot durations after its start
(du_low_config.h:39, lower_phy_baseband_processor.cpp dispatch
discipline).  The test drives a paced slot clock with a producer stall
and shows deadline accounting: a depth that covers the stall absorbs it
(zero misses), a depth that does not records the miss + the FAPI error
indication.  CPU timing is made deterministic by sizing the slot clock
from the measured service time."""

import time

import jax.numpy as jnp
import numpy as np

from srsran_project_tpu.fapi import messages as fapi
from srsran_project_tpu.phy import pusch as pusch_mod
from srsran_project_tpu.phy.allocation import Allocation
from srsran_project_tpu.phy.slot_pipeline import SlotPipeline
from srsran_project_tpu.phy.upper_phy import UpperPhy, UpperPhyConfig
from srsran_project_tpu.ops.modulation import Modulation
from srsran_project_tpu.ran.constants import SubcarrierSpacing
from srsran_project_tpu.ran.slot_point import SlotPoint


def _setup():
    rb = 12
    cfg = pusch_mod.PuschConfig(
        tbs=1024, target_code_rate=0.3, modulation=Modulation.QPSK,
        alloc=Allocation(rb_start=0, rb_count=rb, sym_start=0, sym_count=14,
                         dmrs_symbols=(2, 11)),
        nof_grid_sc=rb * 12)
    phy = UpperPhy(UpperPhyConfig(nof_ports=1, nof_grid_sc=rb * 12))
    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, size=(1024,), dtype=np.uint8))
    grid = pusch_mod.transmit(tb, jnp.uint32(0x4601), cfg)
    noise = (rng.standard_normal(grid.shape)
             + 1j * rng.standard_normal(grid.shape)).astype(np.complex64)
    rx = grid + 0.01 * jnp.asarray(noise)

    def req(count):
        slot = SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30,
                                       count // 20, count % 20)
        return fapi.UlTtiRequest(slot=slot, pusch=[
            fapi.UlPuschPdu(cfg, 0x4601, 0, True)])

    return phy, req, rx


def _measure_service_s(phy, req, rx, n=5):
    # Warmup (compiles) then measured steady-state service time.
    import jax

    phy.process_ul_tti(req(0), rx)
    t0 = time.monotonic()
    for i in range(n):
        phy.process_ul_tti(req(1 + i), rx)
    return (time.monotonic() - t0) / n


def _run(depth, slot_dur_s, stall_at, stall_s, phy, req, rx, n_slots=12):
    pipe = SlotPipeline(phy, slot_duration_s=slot_dur_s, depth=depth)
    t0 = time.monotonic()
    for s in range(n_slots):
        target = t0 + s * slot_dur_s
        now = time.monotonic()
        if target > now:
            time.sleep(target - now)
        if s == stall_at:
            time.sleep(stall_s)  # producer stall (jitter spike)
        # Budget anchored at the slot START: complete within depth slots.
        pipe.push_ul_slot(req(100 + s), rx, deadline_s=target + depth * slot_dur_s)
    pipe.flush()
    return pipe


def test_depth_absorbs_producer_stall_and_shallow_depth_misses():
    phy, req, rx = _setup()
    svc = _measure_service_s(phy, req, rx)
    # Slot clock: 2x the service time so the steady state is comfortably
    # schedulable; the stall is 2.5 slot durations of jitter.
    dur = max(2.0 * svc, 0.02)
    stall = 2.5 * dur

    deep = _run(depth=4, slot_dur_s=dur, stall_at=5, stall_s=stall,
                phy=phy, req=req, rx=rx)
    rep = deep.report()
    assert rep["slots"] == 12
    assert rep["late"] == 0, rep  # depth 4 covers a 2.5-slot stall

    shallow = _run(depth=1, slot_dur_s=dur, stall_at=5, stall_s=stall,
                   phy=phy, req=req, rx=rx)
    rep1 = shallow.report()
    assert rep1["late"] >= 1, rep1  # depth 1 cannot absorb the stall
    # Misses surface as FAPI-style error indications with the lateness.
    assert shallow.errors and "late by" in shallow.errors[0].message


def test_steady_state_meets_deadlines_at_all_depths():
    phy, req, rx = _setup()
    svc = _measure_service_s(phy, req, rx)
    dur = max(2.0 * svc, 0.02)
    for depth in (2, 3, 5):
        pipe = _run(depth=depth, slot_dur_s=dur, stall_at=-1, stall_s=0.0,
                    phy=phy, req=req, rx=rx)
        assert pipe.report()["late"] == 0, (depth, pipe.report())
