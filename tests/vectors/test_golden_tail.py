"""Golden-suite tail (SURVEY Appendix A): standalone uci_decoder,
transform_precoder, and dmrs_pusch estimator conformance against
reference-generated vectors (tools/refgen/gen_tail.cpp)."""

import numpy as np
import pytest

from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest


def _c64(path):
    f = read_vector(path, "f32")
    return (f[0::2] + 1j * f[1::2]).astype(np.complex64)


def test_uci_decoder_golden():
    """Reference uci_decoder_impl parity: short block (A<=11) bit-exact via
    the reference-exact detector; polar path (A>=12) bit-exact through the
    polar chain, including the segmented (2-codeblock) regime."""
    import jax.numpy as jnp

    from srsran_project_tpu.ops import short_block, uci as uci_mod

    cases = load_suite("uci_decoder")
    assert len(cases) >= 16
    for case in cases:
        a, e = case["a"], case["e"]
        llrs = read_vector(suite_path("uci_decoder", f"llrs{case['idx']}.dat"), "i8")
        ref_msg = read_vector(suite_path("uci_decoder", f"message{case['idx']}.dat"), "u8")
        payload = read_vector(suite_path("uci_decoder", f"payload{case['idx']}.dat"), "u8")
        if a <= 11:
            qm = {"qpsk": 2, "qam16": 4, "qam64": 6, "qam256": 8}[case["mod"]]
            bits, ok = short_block.detect_ref(jnp.asarray(llrs)[None], a, e, qm)
            np.testing.assert_array_equal(np.asarray(bits)[0], ref_msg,
                                          err_msg=f"short {case}")
            # detect_ref's GLRT verdict mirrors the reference's status.
            assert (bool(np.asarray(ok)[0])) == (case["status"] == "valid"), case
        else:
            bits, ok = uci_mod.decode_uci(jnp.asarray(llrs, jnp.float32), a)
            np.testing.assert_array_equal(np.asarray(bits), ref_msg,
                                          err_msg=f"polar {case}")
            assert bool(np.asarray(ok)) == (case["status"] == "valid"), case
        # At 8 dB every reference decode recovered the payload; ours must too.
        if case["status"] == "valid":
            np.testing.assert_array_equal(ref_msg, payload)


def test_transform_precoder_golden():
    """transform_precoder_dft_impl parity: deprecode (IDFT/sqrt(M)) of data
    symbols and the noise-variance averaging, every valid RB size."""
    import jax.numpy as jnp

    from srsran_project_tpu.ops import transform_precoding as tp

    cases = load_suite("transform_precoder")
    assert len(cases) >= 9
    for case in cases:
        m_sc = case["m_sc"]
        x = _c64(suite_path("transform_precoder", f"in{case['idx']}.dat"))
        y_ref = _c64(suite_path("transform_precoder", f"out{case['idx']}.dat"))
        y = np.asarray(tp.deprecode(jnp.asarray(x)))
        np.testing.assert_allclose(y, y_ref, atol=2e-4, err_msg=f"{case}")
        nv_in = read_vector(
            suite_path("transform_precoder", f"nvar_in{case['idx']}.dat"), "f32")
        nv_ref = read_vector(
            suite_path("transform_precoder", f"nvar_out{case['idx']}.dat"), "f32")
        nv = np.asarray(tp.deprecode_noise_var(jnp.asarray(nv_in), m_sc))
        np.testing.assert_allclose(np.broadcast_to(nv, nv_ref.shape), nv_ref,
                                   rtol=2e-3, err_msg=f"nvar {case}")


def test_dmrs_pusch_golden():
    """dmrs_pusch_estimator_impl parity: the c_init/Gold-sequence draw,
    per-layer type-1 mapping (both CDM groups), beta scaling, and the
    filter/average estimation pipeline — via the reference-parity
    estimator path on the same recorded grid."""
    import dataclasses

    import jax.numpy as jnp

    from srsran_project_tpu.ops.modulation import Modulation
    from srsran_project_tpu.phy import pusch as pusch_mod
    from srsran_project_tpu.phy.allocation import Allocation

    cases = load_suite("dmrs_pusch")
    assert len(cases) >= 6
    for case in cases:
        grid_prbs = case["grid_prbs"]
        nof_sc = grid_prbs * 12
        g = _c64(suite_path("dmrs_pusch", f"grid{case['idx']}.dat"))
        grid = jnp.asarray(g.reshape(1, 14, nof_sc))
        dmrs_symbols = tuple(s for s in range(14)
                             if case["symbol_mask"] & (1 << s))
        cfg = pusch_mod.PuschConfig(
            tbs=2048, target_code_rate=0.5, modulation=Modulation.QAM16,
            # rb_start is absolute within this grid, so it already sets the
            # sequence reference point (seq_idx = (crb_start + rb_start)*6;
            # crb_start repoints COMPACT windows only).
            alloc=Allocation(rb_start=case["rb_start"],
                             rb_count=case["nof_prb"],
                             sym_start=0, sym_count=14,
                             dmrs_symbols=dmrs_symbols),
            nof_layers=case["layers"], nof_rx_ports=1,
            nof_grid_symbols=14, nof_grid_sc=nof_sc, scs_khz=30,
            slot_in_frame=case["slot_idx"],
            dmrs_scrambling_id=case["scrambling_id"],
            n_scid=case["n_scid"], estimator="reference")
        est = pusch_mod._estimate_stage(grid, cfg)
        h = np.asarray(est[1])  # (1, alloc_sc, nl)
        ce_ref = _c64(suite_path("dmrs_pusch", f"ce{case['idx']}.dat"))
        ce_ref = ce_ref.reshape(case["layers"], nof_sc)
        sc0 = case["rb_start"] * 12
        band = slice(sc0, sc0 + case["nof_prb"] * 12)
        for l in range(case["layers"]):
            ref_l = ce_ref[l, band]
            got_l = h[0, :, l]
            # cbf16 storage on the reference side bounds agreement at ~1%
            # of the RMS level.
            scale = np.sqrt(np.mean(np.abs(ref_l) ** 2)) + 1e-12
            err = np.sqrt(np.mean(np.abs(got_l - ref_l) ** 2)) / scale
            assert err < 2e-2, (case, l, err)
        nv = float(np.asarray(est[2]))
        assert np.isclose(nv, case["noise_var"], rtol=0.05), (case, nv)
