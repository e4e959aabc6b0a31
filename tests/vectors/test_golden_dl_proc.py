"""PDCCH + SSB processor conformance: full grid contributions from the
reference pdcch_processor / ssb_processor (tools/refgen/gen_dl.cpp) against
our phy.pdcch / phy.ssb TX chains — placement, DM-RS, and coded payloads
must agree to cbf16 resolution."""

import numpy as np
import pytest

from srsran_project_tpu.phy import pdcch, ssb
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest


def test_pdcch_processor_golden():
    import jax.numpy as jnp

    cases = load_suite("pdcch_processor")
    assert len(cases) == 4
    for case in cases:
        subc = case["bwp_rb"] * 12
        ref = read_vector(suite_path("pdcch_processor", f"grid{case['idx']}.dat"),
                          "cf32").reshape(1, 14, subc)[0]
        payload = read_vector(suite_path("pdcch_processor", f"payload{case['idx']}.dat"), "u8")
        cfg = pdcch.PdcchConfig(
            payload_bits=case["payload_bits"],
            aggregation_level=case["aggregation_level"],
            cce_index=case["cce_index"],
            coreset_rb_start=case["coreset_rb_start"],
            coreset_rb_count=case["coreset_rb_count"],
            symbol=case["start_sym"], duration=case["duration"],
            interleaved=bool(case["interleaved"]),
            reg_bundle_size=case["reg_bundle"],
            interleaver_rows=case["interleaver_rows"],
            shift_index=case["shift_index"],
            n_id=case["n_id"], n_rnti=case["n_rnti"],
            nof_grid_symbols=14, nof_grid_sc=subc,
            slot_in_frame=case["slot_idx"])
        got = np.asarray(pdcch.process(jnp.asarray(payload), jnp.uint32(case["rnti"]), cfg))
        err = np.abs(got - ref)
        assert err.max() < 8e-3, (case, float(err.max()))
        # Energy where expected, silence elsewhere.
        assert np.abs(ref).max() > 0.5, case


def test_ssb_processor_golden():
    import jax.numpy as jnp

    cases = load_suite("ssb_processor")
    assert len(cases) == 4
    for case in cases:
        subc = case["grid_rb"] * 12
        ref = read_vector(suite_path("ssb_processor", f"grid{case['idx']}.dat"),
                          "cf32").reshape(1, 14, subc)[0]
        mib = read_vector(suite_path("ssb_processor", f"mib{case['idx']}.dat"), "u8")
        cfg = ssb.SsbConfig(
            pci=case["pci"], ssb_index=case["ssb_idx"], l_max=case["L_max"],
            sfn_2lsb=2 * ((case["sfn"] >> 2) & 1) + ((case["sfn"] >> 1) & 1),
            hrf=case["hrf"])
        payload = ssb.pbch_pack_payload(
            mib, sfn=case["sfn"], hrf=case["hrf"], ssb_index=case["ssb_idx"],
            l_max=case["L_max"], k_ssb=case["subcarrier_offset"])
        block = np.asarray(ssb.assemble_ssb(jnp.asarray(payload), cfg))
        l0, k0 = case["l_start"], case["k_start"]
        got_block = ref[l0 : l0 + 4, k0 : k0 + 240]
        err = np.abs(block - got_block)
        assert err.max() < 8e-3, (case, float(err.max()))
        # Everything outside the SSB block is untouched.
        mask = np.ones_like(ref, bool)
        mask[l0 : l0 + 4, k0 : k0 + 240] = False
        assert np.abs(ref[mask]).max() == 0.0, case


def test_csi_rs_generator_golden():
    from srsran_project_tpu.phy import csi_rs

    cases = load_suite("csi_rs_generator")
    assert len(cases) == 5
    for case in cases:
        subc = case["bwp_rb"] * 12
        ports = case["nof_ports"]
        ref = read_vector(suite_path("csi_rs_generator", f"grid{case['idx']}.dat"),
                          "cf32").reshape(ports, 14, subc)
        ki = tuple(case["ki"])
        cfg = csi_rs.CsiRsConfig(
            rb_start=case["rb_start"], rb_count=case["rb_count"],
            symbol=case["l0"], scrambling_id=case["scrambling_id"],
            row=case["row"], k0=ki[0], ki=ki if len(ki) > 1 else (),
            symbol2=case["l1"] if case["l1"] else None,
            slot_in_frame=case["slot_idx"],
            nof_grid_symbols=14, nof_grid_sc=subc)
        # The golden grids include the reference's make_identity precoding
        # normalization (1/sqrt(nof_ports), precoding_codebooks.cpp:76).
        got = np.asarray(csi_rs.generate(cfg)) / np.sqrt(ports)
        if got.ndim == 2:
            got = got[None]
        err = np.abs(got - ref)
        assert err.max() < 8e-3, (case, float(err.max()))
        # 4-port rows carry 1/sqrt(4)-scaled pilots (~0.35 amplitude).
        assert np.abs(ref).max() > 0.3, case


def test_prs_generator_golden():
    from srsran_project_tpu.phy import ptrs_prs

    cases = load_suite("prs_generator")
    assert len(cases) == 5
    for case in cases:
        subc = case["bwp_rb"] * 12
        ref = read_vector(suite_path("prs_generator", f"grid{case['idx']}.dat"),
                          "cf32").reshape(14, subc)
        cfg = ptrs_prs.PrsConfig(
            rb_start=case["rb_start"], rb_count=case["rb_count"],
            start_symbol=case["start_symbol"], nof_symbols=case["nof_symbols"],
            comb_size=case["comb_size"], comb_offset=case["comb_offset"],
            n_id_prs=case["n_id_prs"], slot_in_frame=case["slot_idx"],
            nof_grid_sc=subc, nof_grid_symbols=14)
        got = np.asarray(ptrs_prs.generate_prs(cfg))
        err = np.abs(got - ref)
        assert err.max() < 8e-3, (case, float(err.max()))
        assert np.abs(ref).max() > 0.5, case
