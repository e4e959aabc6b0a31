"""Conformance of modulation mapper (float, tight tolerance) and soft
demapper (int8, bit-exact) against reference-generated goldens."""

import numpy as np
import pytest

from srsran_project_tpu.ops.modulation import demapper_i8
from srsran_project_tpu.ops.modulation.mapper import Modulation, map_bits
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest

MODS = {
    "pi2bpsk": Modulation.PI_2_BPSK,
    "bpsk": Modulation.BPSK,
    "qpsk": Modulation.QPSK,
    "qam16": Modulation.QAM16,
    "qam64": Modulation.QAM64,
    "qam256": Modulation.QAM256,
}


def test_mod_mapper_golden():
    import jax.numpy as jnp

    cases = load_suite("mod_mapper")
    for case in cases:
        bits = read_vector(suite_path("mod_mapper", case["bits"]), "u8")
        ref = read_vector(suite_path("mod_mapper", case["symbols"]), "cf32")
        got = np.asarray(map_bits(jnp.asarray(bits), MODS[case["mod"]]))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-6, err_msg=case["mod"])


def test_demod_mapper_golden_bit_exact():
    import jax.numpy as jnp

    cases = load_suite("demod_mapper")
    for case in cases:
        syms = read_vector(suite_path("demod_mapper", case["symbols"]), "cf32")
        nvar = read_vector(suite_path("demod_mapper", case["noise_vars"]), "f32")
        ref = read_vector(suite_path("demod_mapper", case["llrs"]), "i8")
        got = np.asarray(
            demapper_i8.demap_llr_i8(jnp.asarray(syms), jnp.asarray(nvar), MODS[case["mod"]])
        )
        mismatches = np.flatnonzero(got != ref)
        assert mismatches.size == 0, (
            f"{case['mod']}: {mismatches.size}/{ref.size} LLR mismatches, "
            f"first at {mismatches[:5]}: got {got[mismatches[:5]]} ref {ref[mismatches[:5]]}"
        )
