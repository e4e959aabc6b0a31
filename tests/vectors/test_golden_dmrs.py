"""Conformance of PDSCH/PDCCH DM-RS generation (sequence values, per-port
OCC, grid placement) against reference-generated grids
(dmrs_pdsch_processor_impl / dmrs_pdcch_processor_impl)."""

import numpy as np
import pytest

from srsran_project_tpu.ops import scrambling
from srsran_project_tpu.ran import dmrs as dmrs_mod
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest


def _r_values(c_init: int, nof_vals: int, offset: int = 0) -> np.ndarray:
    c = scrambling.gold_ref(c_init, 2 * (offset + nof_vals))
    c = c[2 * offset:]
    return ((1 - 2 * c[0::2].astype(float)) + 1j * (1 - 2 * c[1::2].astype(float))) / np.sqrt(2)


def test_dmrs_pdsch_golden():
    cases = load_suite("dmrs_pdsch")
    for case in cases:
        nof_prb, layers, ctype = case["nof_prb"], case["nof_layers"], case["dmrs_type"]
        nof_subc = nof_prb * 12
        ref = read_vector(suite_path("dmrs_pdsch", case["grid"]), "cf32").reshape(
            layers, 14, nof_subc
        )
        dmrs_syms = [s for s in range(14) if (case["symbol_mask"] >> s) & 1]
        pilots_per_prb = dmrs_mod.pilots_per_prb(ctype)
        expected = np.zeros_like(ref)
        for port in range(layers):
            ks, wf = dmrs_mod.pilot_subcarriers(ctype, port, nof_prb)
            for sym in dmrs_syms:
                c_init = dmrs_mod.dmrs_c_init(
                    case["slot_in_frame"], sym, case["scrambling_id"], case["n_scid"]
                )
                r = _r_values(c_init, nof_prb * pilots_per_prb)
                # make_identity precoding normalizes by 1/sqrt(nof_layers)
                # (reference lib/ran/precoding/precoding_codebooks.cpp).
                expected[port, sym, ks] = r * wf / np.sqrt(layers)
        err = np.abs(expected - ref)
        assert err.max() < 2e-3, (case, float(err.max()))
        # And nothing outside the DM-RS REs.
        mask = expected != 0
        assert np.abs(ref[~mask]).max() < 1e-6, case


def test_dmrs_pdcch_golden():
    cases = load_suite("dmrs_pdcch")
    for case in cases:
        nof_subc = case["nof_prb"] * 12
        ref = read_vector(suite_path("dmrs_pdcch", case["grid"]), "cf32").reshape(
            14, nof_subc
        )
        expected = np.zeros_like(ref)
        for li in range(case["duration"]):
            sym = case["start_symbol"] + li
            # TS 38.211 §7.4.1.3.1: c_init = (2^17 (14 n_s + l + 1)(2 N_id + 1)
            # + 2 N_id) mod 2^31.
            n_id = case["n_id"]
            c_init = ((1 << 17) * (14 * case["slot_in_frame"] + sym + 1) * (2 * n_id + 1)
                      + 2 * n_id) % (1 << 31)
            # 3 pilots/PRB at k = 4n + 1.
            nof_vals = case["coreset_prbs"] * 3
            r = _r_values(c_init, nof_vals)
            ks = np.concatenate(
                [rb * 12 + np.array([1, 5, 9]) for rb in range(case["coreset_prbs"])]
            )
            expected[sym, ks] = r
        err = np.abs(expected - ref)
        assert err.max() < 2e-3, (case, float(err.max()))
        mask = expected != 0
        assert np.abs(ref[~mask]).max() < 1e-6, case
