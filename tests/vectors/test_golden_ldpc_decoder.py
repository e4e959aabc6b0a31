"""Bit-exact conformance of the int8 LDPC decoder mode against the
reference generic decoder (ldpc_decoder_generic.cpp) on noisy inputs."""

import numpy as np
import pytest

from srsran_project_tpu.ops.ldpc import decoder as ldpc_decoder
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest


def test_ldpc_decoder_i8_golden():
    import jax.numpy as jnp

    cases = load_suite("ldpc_decoder")
    assert len(cases) == 32
    for case in cases:
        llrs = read_vector(suite_path("ldpc_decoder", case["llrs"]), "i8")
        ref_bits = read_vector(suite_path("ldpc_decoder", case["output"]), "u8")
        bits, _ = ldpc_decoder.decode_i8(
            jnp.asarray(llrs)[None], case["bg"], case["ls"], nof_iterations=case["max_iter"]
        )
        got = np.asarray(bits)[0]
        diff = int(np.sum(got != ref_bits))
        assert diff == 0, (
            f"bg={case['bg']} z={case['ls']} snr={case['snr_db']} iters={case['max_iter']}: "
            f"{diff}/{ref_bits.size} bit mismatches"
        )


def test_ldpc_decoder_i8_recovers_message():
    """At 6 dB the decoder must also recover the true transmitted message."""
    import jax.numpy as jnp

    cases = [c for c in load_suite("ldpc_decoder") if c["snr_db"] >= 6.0]
    assert cases
    for case in cases:
        llrs = read_vector(suite_path("ldpc_decoder", case["llrs"]), "i8")
        msg = read_vector(suite_path("ldpc_decoder", case["message"]), "u8")
        bits, _ = ldpc_decoder.decode_i8(
            jnp.asarray(llrs)[None], case["bg"], case["ls"], nof_iterations=case["max_iter"]
        )
        np.testing.assert_array_equal(np.asarray(bits)[0], msg)
