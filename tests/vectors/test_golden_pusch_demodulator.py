"""PUSCH demodulator conformance: equalize (MMSE 1-layer / ZF multi-layer)
-> int8 soft demap -> descramble, against the reference
pusch_demodulator_impl's codeword LLRs."""

import numpy as np
import pytest

from srsran_project_tpu.ops import scrambling
from srsran_project_tpu.ops.equalizer import equalize_ref
from srsran_project_tpu.ops.modulation import Modulation
from srsran_project_tpu.ops.modulation.demapper_i8 import demap_llr_i8
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest

MODS = {2: Modulation.QPSK, 4: Modulation.QAM16, 6: Modulation.QAM64, 8: Modulation.QAM256}


def test_pusch_demodulator_golden():
    import jax.numpy as jnp

    cases = load_suite("pusch_demodulator")
    assert len(cases) == 4
    for case in cases:
        nof_subc = case["nof_prb"] * 12
        P, L, qm = case["ports"], case["layers"], case["qm"]
        grid = read_vector(suite_path("pusch_demodulator", f"grid{case['idx']}.dat"),
                           "cf32").reshape(P, 14, nof_subc)
        est = read_vector(suite_path("pusch_demodulator", f"est{case['idx']}.dat"),
                          "cf32").reshape(P, L, 14, nof_subc)
        ref_llrs = read_vector(suite_path("pusch_demodulator", f"llrs{case['idx']}.dat"), "i8")
        scr_ref = read_vector(suite_path("pusch_demodulator", f"scr{case['idx']}.dat"), "u8")

        dmrs_syms = {s for s in range(14) if (case["dmrs_mask"] >> s) & 1}
        data_syms = [s for s in range(case["start_sym"], case["start_sym"] + case["nof_syms"])
                     if s not in dmrs_syms]
        # (nre, P) observations and (nre, P, L) estimates, symbol-major.
        y = np.concatenate([grid[:, s, :].T for s in data_syms])  # (nre, P)
        h = np.concatenate(
            [np.moveaxis(est[:, :, s, :], [0, 1, 2], [1, 2, 0]) for s in data_syms]
        )  # (nre, P, L)
        nv = np.full(P, case["noise_var"], np.float32)
        method = "mmse" if L == 1 else "zf"
        x, eq_nv = equalize_ref(jnp.asarray(y), jnp.asarray(h), jnp.asarray(nv), 1.0, method)
        llr = demap_llr_i8(jnp.asarray(np.asarray(x).reshape(-1)),
                           jnp.asarray(np.asarray(eq_nv).reshape(-1)), MODS[qm])
        # Descramble: c_init = rnti * 2^15 + n_id (TS 38.211 6.3.1.1).
        c_init = (case["rnti"] << 15) + case["n_id"]
        c = scrambling.gold_ref(c_init, len(ref_llrs))
        np.testing.assert_array_equal(c, scr_ref, err_msg="scrambling seq mismatch")
        got = np.where(c == 1, -np.asarray(llr).astype(np.int32), np.asarray(llr))
        assert got.shape == ref_llrs.shape
        diff = np.abs(got - ref_llrs.astype(np.int32))
        exact = float((diff == 0).mean())
        # Equalizer float ordering differs from the reference SIMD kernels;
        # allow +-1 LLR flips on a small fraction of quantization boundaries.
        # The 2-layer ZF adjugate solve additionally amplifies float-order
        # noise at near-singular REs (cond(H)~5e3 on the synthetic channel);
        # those produce low-confidence LLRs (|ref|<=4) with diffs up to ~3 on
        # <0.1% of positions.
        big = diff > 1
        assert exact > 0.99, (case, exact)
        assert float(big.mean()) < 2e-3, (case, float(big.mean()))
        assert np.all(np.abs(ref_llrs[big]) <= 4), case
        assert diff.max() <= 8, (case, int(diff.max()))
