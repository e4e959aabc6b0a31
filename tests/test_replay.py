"""Golden-replay determinism harness (SURVEY §5.2): the host pipeline is
re-run and every slot's tapped arrays must hash identically — races or
nondeterministic reductions surface as digest mismatches with a (kind,
slot) coordinate."""

import threading

import numpy as np
import pytest

from srsran_project_tpu.fapi import messages as fapi
from srsran_project_tpu.ops.modulation import Modulation
from srsran_project_tpu.phy import pdsch as pdsch_mod
from srsran_project_tpu.phy import pusch as pusch_mod
from srsran_project_tpu.phy.allocation import Allocation
from srsran_project_tpu.phy.upper_phy import UpperPhy, UpperPhyConfig
from srsran_project_tpu.ran.constants import SubcarrierSpacing
from srsran_project_tpu.ran.slot_point import SlotPoint
from srsran_project_tpu.support import replay


def _cfgs():
    alloc = Allocation(rb_start=0, rb_count=12, sym_start=1, sym_count=12,
                       dmrs_symbols=(2,))
    common = dict(tbs=600, target_code_rate=0.3, modulation=Modulation.QPSK,
                  alloc=alloc, nof_layers=1, nof_grid_symbols=14, nof_grid_sc=144)
    return (pdsch_mod.PdschConfig(nof_ports=1, **common),
            pusch_mod.PuschConfig(nof_rx_ports=1, **common))


def _run_slots(recorder, nof_slots=4, threaded=False):
    """Drive UpperPhy over several UL slots, optionally from worker
    threads (one per slot), recording grid/result taps."""
    phy = UpperPhy(UpperPhyConfig(nof_ports=1))
    phy.add_tap(recorder.tap)
    tx_cfg, rx_cfg = _cfgs()

    def one_slot(i):
        rng = np.random.default_rng(100 + i)  # per-slot seed => deterministic
        tb = rng.integers(0, 2, size=(tx_cfg.tbs,), dtype=np.uint8)
        grid = np.asarray(pdsch_mod.process(
            tb, np.uint32(0x41 + i), np.eye(1, dtype=np.complex64), tx_cfg))
        slot = SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, 0, i)
        req = fapi.UlTtiRequest(
            slot=slot, pusch=[fapi.UlPuschPdu(rx_cfg, 0x41 + i, harq_id=0)])
        phy.process_ul_tti(req, grid + 1e-3)

    if threaded:
        threads = [threading.Thread(target=one_slot, args=(i,))
                   for i in range(nof_slots)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    else:
        for i in range(nof_slots):
            one_slot(i)


def test_sequential_replay_is_deterministic():
    golden = replay.assert_replay_deterministic(
        lambda rec: _run_slots(rec), n_runs=2)
    assert golden.entries  # the taps really fired


def test_threaded_run_matches_sequential_golden():
    """A thread-per-slot run must produce the same per-slot digests as the
    sequential golden — the actual race check."""
    g = replay.SlotRecorder()
    _run_slots(g, threaded=False)
    c = replay.SlotRecorder()
    _run_slots(c, threaded=True)
    problems = replay.diff_traces(g, c)
    assert not problems, problems


def test_diff_pinpoints_corruption():
    g = replay.SlotRecorder()
    _run_slots(g, nof_slots=2)
    c = replay.SlotRecorder()
    _run_slots(c, nof_slots=2)
    # Corrupt one digest: the diff names the exact (kind, slot).
    e = c.entries[3]
    c.entries[3] = replay.TraceEntry(e.kind, e.slot, ("deadbeef",) * len(e.digests))
    problems = replay.diff_traces(g, c)
    assert problems and f"slot {e.slot}" in problems[0]


def test_trace_roundtrips_through_file(tmp_path):
    g = replay.SlotRecorder()
    _run_slots(g, nof_slots=2)
    path = str(tmp_path / "golden_trace.npz")
    g.save(path)
    loaded = replay.SlotRecorder.load(path)
    assert not replay.diff_traces(g, loaded)
    # And a fresh identical run still matches yesterday's golden file.
    c = replay.SlotRecorder()
    _run_slots(c, nof_slots=2)
    assert not replay.diff_traces(loaded, c)
