"""Conformance of the reference-parity PRACH detector (phy/prach.detect_ref)
against the reference prach_detector_generic_impl on injected preambles +
AWGN and on noise-only occasions (false-alarm check)."""

import numpy as np
import pytest

from srsran_project_tpu.phy import prach
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest


def test_prach_detector_golden():
    cases = load_suite("prach_detector")
    assert len(cases) >= 9
    for case in cases:
        l_ra = case["l_ra"]
        rx = read_vector(suite_path("prach_detector", case["rx"]), "cf32").reshape(
            case["ports"], case["nof_symbols"], l_ra
        )
        res = prach.detect_ref(
            rx,
            fmt=case["format"],
            root_sequence_index=case["root"],
            zero_correlation_zone=case["zcz"],
            dft_size=1024,
        )
        got_pre = sorted(r["preamble_index"] for r in res)
        ref_pre = sorted(int(x) for x in case["det_preambles"].split(",") if x)
        assert got_pre == ref_pre, (case, res)
        if not ref_pre:
            continue
        ref_met = {int(p): float(m) for p, m in zip(
            case["det_preambles"].split(","), case["det_metrics"].split(","))}
        ref_ta = {int(p): float(t) for p, t in zip(
            case["det_preambles"].split(","), case["det_ta_us"].split(","))}
        for r in res:
            pi = r["preamble_index"]
            assert np.isclose(r["metric"], ref_met[pi], rtol=0.02), (case, r, ref_met)
            assert abs(r["ta_s"] * 1e6 - ref_ta[pi]) < 0.4, (case, r, ref_ta)
