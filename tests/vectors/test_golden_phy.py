"""Conformance of DFT, OFDM modulator/demodulator, equalizer, and PRACH
sequence generation against reference goldens (float-domain tolerances;
the equalizer uses the reference test's 0.008/RE bound,
channel_equalizer_test.cpp:106)."""

import numpy as np
import pytest

from srsran_project_tpu.ops import equalizer as eq_mod
from srsran_project_tpu.ops import ofdm
from srsran_project_tpu.phy import prach as prach_mod
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest

SCS = {
    0: ofdm.SubcarrierSpacing.KHZ15,
    1: ofdm.SubcarrierSpacing.KHZ30,
    2: ofdm.SubcarrierSpacing.KHZ60,
}


def test_dft_golden():
    import jax.numpy as jnp

    cases = load_suite("dft")
    for case in cases:
        x = read_vector(suite_path("dft", case["input"]), "cf32")
        ref = read_vector(suite_path("dft", case["output"]), "cf32")
        if case["dir"] == "direct":
            got = np.asarray(jnp.fft.fft(jnp.asarray(x)))
        else:
            got = np.asarray(jnp.fft.ifft(jnp.asarray(x))) * case["size"]
        scale = np.sqrt(case["size"])
        np.testing.assert_allclose(got, ref, atol=2e-3 * scale, err_msg=str(case))


def test_ofdm_modulator_golden():
    import jax.numpy as jnp

    cases = load_suite("ofdm_modulator")
    for case in cases:
        mu = case["numerology"]
        nsym_slot = 14
        nsc = case["bw_rb"] * 12
        grid = read_vector(suite_path("ofdm_modulator", case["grid"]), "cf32").reshape(
            nsym_slot, nsc
        )
        ref = read_vector(suite_path("ofdm_modulator", case["output"]), "cf32")
        sizes = read_vector(suite_path("ofdm_modulator", case["symsizes"]), "u32")
        outs = []
        for slot in range(1 << mu):
            outs.append(
                np.asarray(
                    ofdm.modulate_slot(
                        jnp.asarray(grid),
                        scs=SCS[mu],
                        dft_size=case["dft_size"],
                        slot_in_subframe=slot,
                        f_center_hz=case["center_freq_hz"],
                        scale=1.0,
                    )
                )
            )
        got = np.concatenate(outs)
        assert got.shape == ref.shape, (got.shape, ref.shape, sizes.sum())
        # Generic-DFT float error grows with N; grid amplitude ~1/sqrt2.
        np.testing.assert_allclose(got, ref, atol=2e-3 * np.sqrt(case["dft_size"]),
                                   err_msg=str(case))


def test_ofdm_demodulator_golden():
    import jax.numpy as jnp

    cases = load_suite("ofdm_demodulator")
    for case in cases:
        mu = case["numerology"]
        nsc = case["bw_rb"] * 12
        samples = read_vector(suite_path("ofdm_demodulator", case["input"]), "cf32")
        ref = read_vector(suite_path("ofdm_demodulator", case["grid"]), "cf32").reshape(14, nsc)
        got = np.asarray(
            ofdm.demodulate_slot(
                jnp.asarray(samples),
                nof_rb=case["bw_rb"],
                scs=SCS[mu],
                dft_size=case["dft_size"],
                slot_in_subframe=0,
                f_center_hz=case["center_freq_hz"],
                scale=1.0 / case["dft_size"],
                window_offset_samples=case["window_offset"] or None,
            )
        )
        # The reference writes the grid in cbf16 — compare at bf16 resolution.
        # Demod output magnitude ~ sqrt(N)*0.3.
        tol = max(4e-3 * np.sqrt(case["dft_size"]), 0.02 * np.sqrt(case["dft_size"]) * 0.3)
        np.testing.assert_allclose(got, ref, atol=tol, err_msg=str(case))


def test_equalizer_golden():
    import jax.numpy as jnp

    cases = load_suite("equalizer")
    for case in cases:
        ports, layers, nof_re = case["ports"], case["layers"], case["nof_re"]
        base = str(case["idx"])
        syms = read_vector(suite_path("equalizer", f"syms{base}.dat"), "cf32").reshape(
            ports, nof_re
        )
        est = read_vector(suite_path("equalizer", f"est{base}.dat"), "cf32").reshape(
            ports, layers, nof_re
        )
        nvar = read_vector(suite_path("equalizer", f"nvar{base}.dat"), "f32")
        ref_eq = read_vector(suite_path("equalizer", f"eq{base}.dat"), "cf32").reshape(
            nof_re, layers
        )
        ref_nv = read_vector(suite_path("equalizer", f"eqnvar{base}.dat"), "f32").reshape(
            nof_re, layers
        )
        y = jnp.asarray(syms.T)  # (nre, P)
        h = jnp.asarray(np.moveaxis(est, [0, 1, 2], [1, 2, 0]))  # (nre, P, L)
        x, nv_out = eq_mod.equalize_ref(y, h, jnp.asarray(nvar), 1.0, case["alg"])
        np.testing.assert_allclose(np.asarray(x), ref_eq, atol=0.008, err_msg=str(case))
        np.testing.assert_allclose(
            np.asarray(nv_out), ref_nv, rtol=5e-3, atol=1e-5, err_msg=str(case)
        )


def test_prach_generator_golden():
    cases = load_suite("prach_generator")
    for case in cases:
        ref = read_vector(suite_path("prach_generator", case["seq"]), "cf32")
        got = prach_mod.generate_preamble_ref(
            fmt=case["format"],
            root_sequence_index=case["root"],
            preamble_index=case["preamble"],
            zero_correlation_zone=case["zcz"],
        )
        assert got.shape[0] == case["len"], case
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=str(case))
