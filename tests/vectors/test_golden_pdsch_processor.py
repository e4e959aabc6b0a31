"""Processor-level PDSCH conformance: my full DL chain (segment -> LDPC ->
rate match -> scramble -> modulate -> layer map/precode -> grid + DM-RS)
against the reference pdsch_processor's resource grids (SURVEY App. A
pdsch_processor_test_data shape), incl. the flagship 273-PRB 4-layer
256QAM case."""

import numpy as np
import pytest

from srsran_project_tpu.ops.modulation import Modulation
from srsran_project_tpu.phy import pdsch
from srsran_project_tpu.phy.allocation import Allocation
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest

MODS = {2: Modulation.QPSK, 4: Modulation.QAM16, 6: Modulation.QAM64, 8: Modulation.QAM256}


def test_pdsch_processor_golden():
    import jax.numpy as jnp

    cases = load_suite("pdsch_processor")
    assert len(cases) == 5
    for case in cases:
        nof_subc = case["bwp_rb"] * 12
        layers = case["layers"]
        ref = read_vector(suite_path("pdsch_processor", f"grid{case['idx']}.dat"),
                          "cf32").reshape(layers, 14, nof_subc)
        tb_bytes = read_vector(suite_path("pdsch_processor", f"tb{case['idx']}.dat"), "u8")
        tb_bits = np.unpackbits(tb_bytes)
        assert tb_bits.size == case["tbs_bits"]

        dmrs_syms = tuple(s for s in range(14) if (case["dmrs_mask"] >> s) & 1)
        alloc = Allocation(
            rb_start=case["rb_start"], rb_count=case["rb_count"],
            sym_start=case["start_sym"], sym_count=case["nof_syms"],
            dmrs_symbols=dmrs_syms, dmrs_config_type=1,
            nof_cdm_groups_without_data=case["cdm_groups"],
        )
        ndata = alloc.rb_count * 12 * (case["nof_syms"] - len(dmrs_syms))
        if case["cdm_groups"] < 2:
            # CDM group 1's REs still carry data on DM-RS symbols.
            ndata += alloc.rb_count * 6 * len(dmrs_syms)
        g = ndata * case["qm"] * layers
        rate = case["tbs_bits"] / g
        cfg = pdsch.PdschConfig(
            tbs=case["tbs_bits"], target_code_rate=rate, modulation=MODS[case["qm"]],
            alloc=alloc, nof_layers=layers, nof_ports=layers,
            nof_grid_symbols=14, nof_grid_sc=nof_subc,
            n_id=case["n_id"], rv=case["rv"], slot_in_frame=case["slot_in_frame"],
            dmrs_scrambling_id=case["scrambling_id"], n_scid=0,
        )
        assert cfg.sch.seg.base_graph == case["bg"], case
        w = jnp.eye(layers, layers, dtype=jnp.complex64) / np.sqrt(layers)
        grid = np.asarray(pdsch.process(jnp.asarray(tb_bits), jnp.uint32(case["rnti"]), w, cfg))
        assert grid.shape == ref.shape
        err = np.abs(grid - ref)
        # cbf16 grid rounding is ~0.004 at unit amplitude.
        assert err.max() < 8e-3, (case, float(err.max()))
        # Sanity: the grids genuinely carry energy.
        assert np.abs(ref).max() > 0.2, case
