"""PRACH OFDM demodulator conformance: the reference demodulator's output
buffers over random baseband (tools/refgen gen_phy.cpp prach_demodulator
suite) against our prach_window_params + prach_demodulate — pins the
16-kappa CP extensions, occasion offsets, preamble-SCS DFT sizing and the
DC-centred frequency mapping."""

import numpy as np
import pytest

from srsran_project_tpu.ops import lower_phy
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest


def test_prach_demodulator_golden():
    cases = load_suite("prach_demodulator")
    assert len(cases) == 5
    for case in cases:
        inp = read_vector(suite_path("prach_demodulator", f"input{case['idx']}.dat"), "cf32")
        ref = read_vector(suite_path("prach_demodulator", f"buffer{case['idx']}.dat"), "cf32")
        nof_sym = case["nof_symbols"]
        ref = ref.reshape(case["nof_td"], case["nof_fd"], nof_sym, case["l_ra"])

        for td in range(case["nof_td"]):
            for fd in range(case["nof_fd"]):
                p = lower_phy.prach_window_params(
                    fmt=case["fmt"], pusch_scs_hz=30000,
                    slot_in_subframe=case["slot_idx"],
                    start_symbol=case["start_symbol"], td_occasion=td,
                    srate_hz=case["srate_hz"], rb_offset=case["rb_offset"],
                    fd_occasion=fd, nof_prb_ul_grid=case["nof_prb_ul"],
                    l_ra=case["l_ra"])
                assert p["nof_symbols"] == nof_sym, (case, p)
                window = inp[p["sample_offset"]:]
                for s in range(nof_sym):
                    got = np.asarray(lower_phy.prach_demodulate(
                        window, l_ra=case["l_ra"], dft_size=p["dft_size"],
                        nof_symbols=1,
                        cp_samples=p["cp_samples"] + s * p["dft_size"],
                        k_offset=p["k_offset"]))
                    err = np.abs(got - ref[td, fd, s])
                    # cbf16 storage quantization at unit-power noise input.
                    assert err.max() < 2e-2, (case, td, fd, s, float(err.max()))
                    # And the content is genuinely matched, not just small.
                    corr = np.abs(np.vdot(got, ref[td, fd, s])) / (
                        np.linalg.norm(got) * np.linalg.norm(ref[td, fd, s]) + 1e-12)
                    assert corr > 0.999, (case, td, fd, s, corr)
