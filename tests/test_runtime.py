"""Config system, metrics, tracing, slot pipeline."""

import json
import time

import numpy as np
import pytest

from srsran_project_tpu.fapi import messages as fapi
from srsran_project_tpu.ops.modulation import Modulation
from srsran_project_tpu.phy import pdsch as pdsch_mod
from srsran_project_tpu.phy.allocation import Allocation
from srsran_project_tpu.phy.slot_pipeline import SlotPipeline
from srsran_project_tpu.phy.upper_phy import UpperPhy, UpperPhyConfig
from srsran_project_tpu.ran.constants import SubcarrierSpacing
from srsran_project_tpu.ran.slot_point import SlotPoint
from srsran_project_tpu.support import config as cfg_mod
from srsran_project_tpu.support.metrics import MetricsCollector
from srsran_project_tpu.support.tracing import EventTracer


def test_config_defaults_and_overrides(tmp_path):
    cfg = cfg_mod.load_config(None, {"cell.nof_rb": 52, "expert_phy.pusch_max_nof_ldpc_iterations": 8})
    assert cfg.cell.nof_rb == 52
    assert cfg.expert_phy.pusch_max_nof_ldpc_iterations == 8
    y = cfg_mod.dump_config(cfg)
    p = tmp_path / "c.yml"
    p.write_text(y)
    back = cfg_mod.load_config(str(p))
    assert back.cell.nof_rb == 52


def test_config_validation():
    with pytest.raises(ValueError):
        cfg_mod.load_config(None, {"cell.nof_rb": 999})
    with pytest.raises(ValueError):
        cfg_mod.load_config(None, {"cell.modulation": "qam1024"})
    with pytest.raises(KeyError):
        cfg_mod.load_config(None, {"cell.not_a_knob": 1})


def test_to_cell_config():
    cfg = cfg_mod.load_config(None, {"cell.nof_rb": 24, "cell.nof_ports": 2, "cell.nof_layers": 2,
                                     "cell.modulation": "qpsk", "cell.target_code_rate": 0.3})
    cell = cfg_mod.to_cell_config(cfg)
    assert cell.nof_rb == 24 and cell.nof_ports == 2
    assert cell.tbs > 0


def test_metrics_collector():
    m = MetricsCollector()

    @m.timed("op", units_fn=lambda r: 100.0)
    def op():
        time.sleep(0.001)
        return 1

    for _ in range(3):
        op()
    rep = m.report()["op"]
    assert rep["count"] == 3
    assert rep["mean_us"] >= 1000
    assert rep["rate_per_s"] > 0
    json.loads(m.report_json())


def test_tracer(tmp_path):
    t = EventTracer(enabled=True)
    with t.span("work", "L1"):
        time.sleep(0.001)
    t.instant("marker")
    p = tmp_path / "trace.json"
    t.write(str(p))
    data = json.loads(p.read_text())
    names = [e["name"] for e in data["traceEvents"]]
    assert "work" in names and "marker" in names
    dur = [e for e in data["traceEvents"] if e["name"] == "work"][0]["dur"]
    assert dur >= 1000


def test_slot_pipeline_deadlines():
    phy = UpperPhy(UpperPhyConfig(nof_ports=1))
    alloc = Allocation(rb_start=0, rb_count=6, sym_start=1, sym_count=12, dmrs_symbols=(2,))
    tx_cfg = pdsch_mod.PdschConfig(
        tbs=304, target_code_rate=0.3, modulation=Modulation.QPSK, alloc=alloc,
        nof_layers=1, nof_ports=1, nof_grid_symbols=14, nof_grid_sc=624)
    pipe = SlotPipeline(phy, depth=2)
    rng = np.random.default_rng(0)
    now = time.monotonic()
    for i in range(5):
        slot = SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, 0, i % 20)
        tb = rng.integers(0, 2, size=(304,), dtype=np.uint8)
        req = fapi.DlTtiRequest(slot=slot, pdsch=[
            fapi.DlPdschPdu(tx_cfg, 0x11, np.eye(1, dtype=np.complex64), 0)])
        pipe.push_dl_slot(req, fapi.TxDataRequest(slot=slot, payloads=[tb]), deadline_s=now + 30.0)
    grids = pipe.flush()
    assert len(grids) == 5
    rep = pipe.report()
    assert rep["slots"] == 5 and rep["late"] == 0

    # Impossible deadline -> late slot recorded.
    slot = SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, 0, 5)
    tb = rng.integers(0, 2, size=(304,), dtype=np.uint8)
    req = fapi.DlTtiRequest(slot=slot, pdsch=[
        fapi.DlPdschPdu(tx_cfg, 0x11, np.eye(1, dtype=np.complex64), 0)])
    pipe.push_dl_slot(req, fapi.TxDataRequest(slot=slot, payloads=[tb]), deadline_s=now - 1.0)
    pipe.flush()
    assert pipe.report()["late"] == 1
    assert pipe.errors


def test_ntn_config_and_koffset():
    """NTN cell config loads; the scheduler shifts UL grants by koffset."""
    from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler, SchedulerConfig
    from srsran_project_tpu.ran.constants import SubcarrierSpacing
    from srsran_project_tpu.ran.slot_point import SlotPoint
    from srsran_project_tpu.support import config as cfg_mod

    cfg = cfg_mod.load_config("configs/ntn_geo.yml")
    assert cfg.ntn.enabled and cfg.ntn.cell_specific_koffset == 478
    assert cfg.ntn.ta_common_ms > 200

    sched = RoundRobinScheduler(SchedulerConfig(
        nof_rb=24, max_ues_per_slot=1, ntn_koffset=cfg.ntn.cell_specific_koffset))
    sched.add_ue(0x10)
    slot = SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ15, 0, 0)
    dl, tx, ul, grants = sched.run_slot(slot, np.random.default_rng(0))
    assert dl.slot.count == 0
    assert ul.slot.count == 478  # PUSCH arrives koffset slots later


def test_all_config_profiles_load():
    """Every YAML profile in configs/ loads, validates, and maps to runtime
    cell + scheduler configs."""
    import glob
    import os

    from srsran_project_tpu.support import config as cfg_mod

    profiles = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                             "configs", "*.yml")))
    assert len(profiles) >= 10
    for path in profiles:
        cfg = cfg_mod.load_config(path)
        cell = cfg_mod.to_cell_config(cfg)
        sched = cfg_mod.to_scheduler_config(cfg)
        assert cell.nof_rb == cfg.cell.nof_rb
        assert sched.nof_rb == cfg.cell.nof_rb


def test_parity_profile_selects_reference_kernels():
    import os

    from srsran_project_tpu.support import config as cfg_mod

    path = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "conformance_parity.yml")
    cfg = cfg_mod.load_config(path)
    cell = cfg_mod.to_cell_config(cfg)
    pc = cell.pusch_cfg
    assert pc.demapper == "reference"
    assert pc.ldpc_decoder == "reference_i8"
    assert pc.equalizer == "mmse_ref"
