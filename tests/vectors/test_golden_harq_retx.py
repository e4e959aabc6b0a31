"""HARQ retransmission conformance vs the reference pusch_decoder.

The refgen harq_retx suite drives the reference decoder through the RV
sequence 0-2-3-1 with a persistent rx buffer at SNRs where the first
transmissions fail, capturing the exact int8 LLR inputs, the per-tx
verdicts, and the combined codeblock soft-bit buffers
(pusch_decoder_impl.cpp:336's rate-dematch combine path).  This asserts:

- per-transmission CRC verdict parity (fail -> fail -> success
  trajectories reproduce exactly);
- bit-exact int8 saturating-combine parity of our HARQ buffer against
  the reference's rx-buffer soft bits after every transmission;
- final decoded transport block equality.

Closes VERDICT r2 missing #3.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_project_tpu.phy.sch import SchConfig, decode_transport_block
from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest


def _read_i8(path):
    return np.fromfile(path, dtype=np.int8)


def _qm_to_rate(case):
    # target_code_rate only sizes segmentation metadata; the true E comes
    # from nof_total_bits.  Reconstruct a consistent rate for SchConfig.
    return (case["tbs_bytes"] * 8) / case["g_bits"]


@pytest.mark.parametrize("case_idx", range(5))
def test_harq_retx_parity(case_idx):
    cases = load_suite("harq_retx")
    if case_idx >= len(cases):
        pytest.skip("case not generated")
    case = cases[case_idx]
    tbs = case["tbs_bytes"] * 8
    tb_ref = np.unpackbits(
        np.fromfile(suite_path("harq_retx", case["tb"]), dtype=np.uint8))
    rvs = [int(x) for x in case["rv_seq"].split(",")]
    verdicts = [int(x) for x in case["verdicts"].split(",")]
    full_len = case["full_length"]
    nof_cbs = case["nof_cbs"]

    harq = None
    for t, (rv, want_ok) in enumerate(zip(rvs, verdicts)):
        llr = _read_i8(suite_path("harq_retx", f"llr{case['idx']}_{t}.dat"))
        assert llr.size == case["g_bits"]
        cfg = SchConfig(
            tbs=tbs,
            target_code_rate=_qm_to_rate(case),
            qm=case["qm"],
            nof_layers=1,
            nof_total_bits=case["g_bits"],
            rv=rv,
            decoder="reference_i8",
        )
        tb, ok, harq = decode_transport_block(
            jnp.asarray(llr), cfg, nof_iterations=6,
            harq_buffer=(None if t == 0 else harq), early_stop=True)
        got_ok = bool(np.asarray(ok))
        assert got_ok == bool(want_ok), (
            f"case {case['idx']} tx {t} (rv={rv}): "
            f"crc_ok={got_ok}, reference={bool(want_ok)}")
        # Combined-buffer parity: our HARQ soft bits must match the
        # reference's rx-buffer contents bit-for-bit after every tx.
        buf = np.asarray(harq)
        assert buf.shape[0] == nof_cbs
        for cb in range(nof_cbs):
            ref_soft = _read_i8(
                suite_path("harq_retx", f"soft{case['idx']}_{t}_{cb}.dat"))
            assert ref_soft.size == full_len
            np.testing.assert_array_equal(
                buf[cb, :full_len], ref_soft,
                err_msg=f"case {case['idx']} tx {t} cb {cb}: combined "
                        f"soft-bit buffer diverges from the reference")
        if got_ok:
            np.testing.assert_array_equal(np.asarray(tb), tb_ref[:tbs])
