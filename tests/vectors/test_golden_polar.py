"""Conformance of the polar chain (code construction, encoder, rate
matcher, rate dematcher, SSC decoder) and the short-block codec against
reference goldens — bit-exact."""

import numpy as np
import pytest

from srsran_project_tpu.ops import short_block
from srsran_project_tpu.ops.polar import code as polar_code
from srsran_project_tpu.ops.polar import decoder as polar_decoder
from srsran_project_tpu.ops.polar import encoder as polar_encoder
from srsran_project_tpu.ops.polar import tables as polar_tables
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest


def _construct(case):
    k, e = case["k"], case["e"]
    n_pc = case["n_pc"]
    n_pc_wm = 1 if (k <= 25 and e > k + 189) else 0
    return polar_code.construct(k, e, n_max=case["n_max"], n_pc=n_pc, n_pc_wm=n_pc_wm)


def test_polar_code_construction_golden():
    cases = load_suite("polar")
    for case in cases:
        code = _construct(case)
        assert code.nval == case["n"], case
        kset = read_vector(suite_path("polar", f"kset{case['idx']}.dat"), "u16")
        pcset = read_vector(suite_path("polar", f"pcset{case['idx']}.dat"), "u16")
        # The reference's get_PC_set() span carries an NMAX sentinel and, when
        # nPC = 0, stale values from a previous set() call — trust n_pc.
        pcset = pcset[pcset < case["n"]][: case["n_pc"]]
        got_k = np.sort(np.concatenate([np.array(code.info_set, int), np.array(code.pc_set, int)]))
        np.testing.assert_array_equal(got_k, np.sort(kset), err_msg=f"K_set {case}")
        np.testing.assert_array_equal(np.sort(np.array(code.pc_set, int)), np.sort(pcset),
                                      err_msg=f"PC_set {case}")


def test_polar_encode_golden():
    import jax.numpy as jnp

    cases = load_suite("polar")
    for case in cases:
        code = _construct(case)
        msg = read_vector(suite_path("polar", f"msg{case['idx']}.dat"), "u8")
        ref_matched = read_vector(suite_path("polar", f"matched{case['idx']}.dat"), "u8")
        use_iil = case["n_max"] == 9
        got = np.asarray(
            polar_encoder.encode(jnp.asarray(msg)[None], code, interleave_input=use_iil)
        )[0]
        if case["ibil"]:
            perm = polar_code.channel_interleaver_pattern(case["e"])
            got = got[perm]
        np.testing.assert_array_equal(got, ref_matched, err_msg=str(case))


def test_polar_decode_golden():
    import jax.numpy as jnp

    cases = load_suite("polar")
    for case in cases:
        code = _construct(case)
        dematched = read_vector(suite_path("polar", f"dematched{case['idx']}.dat"), "i8")
        ref_decoded = read_vector(suite_path("polar", f"decoded{case['idx']}.dat"), "u8")
        bits = np.asarray(
            polar_decoder.decode(jnp.asarray(dematched.astype(np.float32))[None], code)
        )[0]
        if case["n_max"] == 9:
            # Undo the input interleaver to recover the original message order.
            pi = polar_tables.input_interleaver(case["k"])
            out = np.zeros_like(bits)
            out[pi] = bits
            bits = out
        np.testing.assert_array_equal(bits, ref_decoded, err_msg=str(case))


def test_short_block_golden():
    import jax.numpy as jnp

    cases = load_suite("short_block")
    for case in cases:
        msg = read_vector(suite_path("short_block", f"msg{case['idx']}.dat"), "u8")
        ref_enc = read_vector(suite_path("short_block", f"enc{case['idx']}.dat"), "u8")
        got = np.asarray(
            short_block.encode(jnp.asarray(msg)[None], case["e"], placeholders=True)
        )[0]
        np.testing.assert_array_equal(got, ref_enc, err_msg=f"encode {case}")

        llrs = read_vector(suite_path("short_block", f"llrs{case['idx']}.dat"), "i8")
        ref_det = read_vector(suite_path("short_block", f"det{case['idx']}.dat"), "u8")
        det_bits, ok = short_block.detect_ref(
            jnp.asarray(llrs)[None], case["k"], case["e"], case["qm"]
        )
        np.testing.assert_array_equal(np.asarray(det_bits)[0], ref_det, err_msg=f"detect {case}")
        assert int(np.asarray(ok)[0]) == case["detect_ok"], f"detect_ok {case}"
