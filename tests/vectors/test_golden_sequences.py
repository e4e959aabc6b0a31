"""Conformance of low-PAPR (Zadoff-Chu / phi-table) sequence generation
against reference goldens (low_papr_sequence_generator_impl.cpp)."""

import numpy as np
import pytest

from srsran_project_tpu.ops import sequences
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest


def test_low_papr_golden():
    cases = load_suite("low_papr")
    for case in cases:
        ref = read_vector(suite_path("low_papr", case["seq"]), "cf32")
        alpha = 2.0 * np.pi * case["alpha_num"] / case["alpha_den"]
        got = np.asarray(sequences.generate(case["u"], case["v"], case["m"], alpha))
        np.testing.assert_allclose(
            got,
            ref,
            atol=5e-5,  # reference accumulates alpha*n in float32; error grows with m
            err_msg=f"m={case['m']} u={case['u']} v={case['v']} alpha_num={case['alpha_num']}",
        )
