"""UL-SCH demultiplexer conformance: bit-exact routing of SCH / HARQ-ACK /
CSI1 streams incl. reserved-ACK puncturing (per-symbol stride-within-
reserved selection) and 1-2 bit ACK placeholder descrambling, against the
reference ulsch_demultiplex_impl."""

import numpy as np
import pytest

from srsran_project_tpu.phy import ulsch_demux as ud
from srsran_project_tpu.phy.allocation import Allocation
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest


def test_ulsch_demux_golden():
    import jax.numpy as jnp

    cases = load_suite("ulsch_demux")
    assert len(cases) == 8
    for case in cases:
        cw = read_vector(suite_path("ulsch_demux", f"cw{case['idx']}.dat"), "i8").astype(np.int32)
        scr = read_vector(suite_path("ulsch_demux", f"scr{case['idx']}.dat"), "u8")
        ref_sch = read_vector(suite_path("ulsch_demux", f"sch{case['idx']}.dat"), "i8")
        ref_ack = read_vector(suite_path("ulsch_demux", f"ack{case['idx']}.dat"), "i8")
        ref_csi1 = read_vector(suite_path("ulsch_demux", f"csi1_{case['idx']}.dat"), "i8")
        dmrs_syms = tuple(s for s in range(14) if (case["dmrs_mask"] >> s) & 1)
        alloc = Allocation(
            rb_start=0, rb_count=case["nof_prb"], sym_start=case["start_sym"],
            sym_count=case["nof_symbols"], dmrs_symbols=dmrs_syms,
            nof_cdm_groups_without_data=case["cdm_groups"],
        )
        # The reference routes CSI2 in a second pass (after CSI1 decoding),
        # so at this stage CSI2 REs stay in the SCH stream: model g_csi2=0.
        cfg = ud.UlschMuxConfig(
            alloc=alloc, qm=case["qm"], nof_layers=case["layers"],
            nof_grid_symbols=14, nof_grid_sc=case["nof_prb"] * 12,
            g_ack=case["g_ack"], g_csi1=case["g_csi1"], g_csi2=0,
            nof_ack_bits=case["ack"], g_ack_rvd=case["g_ack_rvd"],
        )
        ack_pos, _, _, _ = ud._layout(cfg)
        data, ack, csi1, _ = ud.demultiplex(jnp.asarray(cw), cfg)
        np.testing.assert_array_equal(np.asarray(data), ref_sch, err_msg=f"sch {case}")
        if case["g_ack"]:
            corrected = ud.ack_placeholder_descramble(
                jnp.asarray(np.asarray(ack)), jnp.asarray(scr[ack_pos]),
                case["qm"], case["ack"],
            )
            np.testing.assert_array_equal(np.asarray(corrected), ref_ack,
                                          err_msg=f"ack {case}")
        if case["g_csi1"]:
            np.testing.assert_array_equal(np.asarray(csi1), ref_csi1,
                                          err_msg=f"csi1 {case}")
