"""Conformance of the port channel estimator oracle against reference
goldens.  Tolerances follow the reference's own estimator vector suite
(float CE compare; TA within one 4096-grid sample,
port_channel_estimator_test.cpp:189-198)."""

import numpy as np
import pytest

from srsran_project_tpu.ops import estimator_ref
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest

PATTERNS = {
    1: tuple(range(0, 12, 2)),
    3: (1, 4, 7, 10),
    4: tuple(range(12)),
}


def _run_case(case):
    nof_subc = case["nof_prb"] * 12
    layers = case["layers"]
    pattern = PATTERNS[case["dmrs_type"]]
    nof_dmrs_syms = bin(case["symbol_mask"]).count("1")
    nof_pilots = case["nof_prb"] * len(pattern)
    grid = read_vector(suite_path("estimator", f"grid{case['idx']}.dat"), "cf32").reshape(
        14, nof_subc
    )
    pilots = read_vector(suite_path("estimator", f"pilots{case['idx']}.dat"), "cf32").reshape(
        layers, nof_dmrs_syms, nof_pilots
    )
    cfg = estimator_ref.EstimatorConfig(
        scs_khz=30,
        nof_prb=case["nof_prb"],
        first_symbol=0,
        nof_symbols=14,
        dmrs_symbol_mask=case["symbol_mask"],
        re_pattern=pattern,
        nof_layers=layers,
        smoothing=case["smoothing"],
        td_strategy=case["td"],
        compensate_cfo=case["cfo_comp"] == 1,
    )
    return estimator_ref.estimate_port(grid, pilots, cfg), case


def test_estimator_scalars_golden():
    cases = load_suite("estimator")
    assert len(cases) >= 8
    for case in cases:
        res, _ = _run_case(case)
        assert np.isclose(res.epre, case["epre"], rtol=2e-3), (case, res.epre)
        assert np.isclose(res.rsrp, case["rsrp"], rtol=5e-3), (case, res.rsrp)
        assert np.isclose(res.noise_var, case["noise_var"], rtol=2e-2), (case, res.noise_var)
        assert np.isclose(res.snr, case["snr_est"], rtol=3e-2), (case, res.snr)
        # TA within one sample of the correlator grid (fs >= 123 MHz here).
        assert abs(res.time_alignment_s * 1e6 - case["ta_us"]) < 0.02, (
            case,
            res.time_alignment_s * 1e6,
        )
        if case["cfo_comp"]:
            assert abs((res.cfo_hz or 0.0) - case["cfo_hz"]) < 1.0, (case, res.cfo_hz)


def test_estimator_channel_golden():
    cases = load_suite("estimator")
    for case in cases:
        res, _ = _run_case(case)
        nof_subc = case["nof_prb"] * 12
        ref_ce = read_vector(suite_path("estimator", f"ce{case['idx']}.dat"), "cf32").reshape(
            case["layers"], 14, nof_subc
        )
        err = np.abs(res.ce - ref_ce)
        scale = max(1.0, float(np.abs(ref_ce).max()))
        assert err.max() < 0.02 * scale, (
            case,
            float(err.max()),
            float(np.abs(ref_ce).max()),
        )
