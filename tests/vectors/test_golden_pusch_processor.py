"""Processor-level PUSCH conformance: the reference pusch_processor_impl's
full RX chain (DM-RS estimation -> MMSE -> demod -> LDPC decode -> TB CRC)
decoded these grids with CRC OK; our production pusch.process must recover
the same transport blocks from the same grids."""

import numpy as np
import pytest

from srsran_project_tpu.ops.modulation import Modulation
from srsran_project_tpu.phy import pusch
from srsran_project_tpu.phy.allocation import Allocation
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest

MODS = {1: Modulation.PI_2_BPSK, 2: Modulation.QPSK, 4: Modulation.QAM16, 6: Modulation.QAM64, 8: Modulation.QAM256}


def test_pusch_processor_golden():
    cases = load_suite("pusch_processor_rx")
    assert len(cases) == 6
    for case in cases:
        nof_subc = case["nof_prb"] * 12
        grid = read_vector(suite_path("pusch_processor_rx", f"grid{case['idx']}.dat"),
                           "cf32").reshape(case["ports"], 14, nof_subc)
        tb_bytes = read_vector(suite_path("pusch_processor_rx", f"tb{case['idx']}.dat"), "u8")
        tb_bits = np.unpackbits(tb_bytes)  # MSB-first, reference bit order

        dmrs_syms = tuple(s for s in range(14) if (case["dmrs_mask"] >> s) & 1)
        cfg = pusch.PuschConfig(
            tbs=case["tbs_bytes"] * 8,
            target_code_rate=case["rate"],
            modulation=MODS[case["qm"]],
            alloc=Allocation(rb_start=0, rb_count=case["nof_prb"], sym_start=0,
                             sym_count=14, dmrs_symbols=dmrs_syms,
                             nof_cdm_groups_without_data=2),
            nof_layers=1,
            nof_rx_ports=case["ports"],
            nof_grid_symbols=14,
            nof_grid_sc=nof_subc,
            n_id=case["n_id"],
            slot_in_frame=case["slot_idx"],
            dmrs_scrambling_id=case["scrambling_id"],
            transform_precoding=bool(case.get("transform_precoding", 0)),
            n_rs_id=case.get("n_rs_id", 0),
        )
        out = pusch.process(np.asarray(grid, np.complex64),
                            np.uint32(case["rnti"]), cfg)
        assert bool(np.asarray(out["tb_crc_ok"])), case
        np.testing.assert_array_equal(np.asarray(out["tb_bits"]), tb_bits,
                                      err_msg=str(case))
        assert case["ref_crc_ok"] == 1
