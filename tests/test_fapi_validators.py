"""FAPI request validators."""

import numpy as np
import pytest

from srsran_project_tpu.fapi import messages as fapi
from srsran_project_tpu.fapi.validators import ValidationError, validate_dl_tti, validate_ul_tti
from srsran_project_tpu.ops.modulation import Modulation
from srsran_project_tpu.phy.allocation import Allocation
from srsran_project_tpu.phy.pdsch import PdschConfig
from srsran_project_tpu.phy.pusch import PuschConfig
from srsran_project_tpu.ran.constants import SubcarrierSpacing
from srsran_project_tpu.ran.slot_point import SlotPoint


def _slot():
    return SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, 0, 0)


def _pdsch_cfg(rb_start=0, rb=12, tbs=304):
    alloc = Allocation(rb_start=rb_start, rb_count=rb, sym_start=1, sym_count=12, dmrs_symbols=(2,))
    return PdschConfig(tbs=tbs, target_code_rate=0.3, modulation=Modulation.QPSK,
                       alloc=alloc, nof_grid_sc=624)


def test_valid_request_passes():
    cfg = _pdsch_cfg()
    tb = np.zeros(cfg.tbs, np.uint8)
    req = fapi.DlTtiRequest(slot=_slot(), pdsch=[fapi.DlPdschPdu(cfg, 1, np.eye(1, dtype=np.complex64), 0)])
    validate_dl_tti(req, fapi.TxDataRequest(slot=_slot(), payloads=[tb]), 624)


def test_payload_size_mismatch():
    cfg = _pdsch_cfg()
    req = fapi.DlTtiRequest(slot=_slot(), pdsch=[fapi.DlPdschPdu(cfg, 1, np.eye(1, dtype=np.complex64), 0)])
    with pytest.raises(ValidationError, match="payload"):
        validate_dl_tti(req, fapi.TxDataRequest(slot=_slot(), payloads=[np.zeros(10, np.uint8)]), 624)


def test_overlapping_pdsch_rejected():
    a = _pdsch_cfg(rb_start=0, rb=12)
    b = _pdsch_cfg(rb_start=6, rb=12)
    tb = np.zeros(a.tbs, np.uint8)
    req = fapi.DlTtiRequest(slot=_slot(), pdsch=[
        fapi.DlPdschPdu(a, 1, np.eye(1, dtype=np.complex64), 0),
        fapi.DlPdschPdu(b, 2, np.eye(1, dtype=np.complex64), 1)])
    with pytest.raises(ValidationError, match="overlaps"):
        validate_dl_tti(req, fapi.TxDataRequest(slot=_slot(), payloads=[tb, tb]), 624)


def test_out_of_grid_rejected():
    cfg = _pdsch_cfg(rb_start=48, rb=12)
    tb = np.zeros(cfg.tbs, np.uint8)
    req = fapi.DlTtiRequest(slot=_slot(), pdsch=[fapi.DlPdschPdu(cfg, 1, np.eye(1, dtype=np.complex64), 0)])
    with pytest.raises(ValidationError, match="exceeds"):
        validate_dl_tti(req, fapi.TxDataRequest(slot=_slot(), payloads=[tb]), 624)


def test_ul_harq_range():
    alloc = Allocation(rb_start=0, rb_count=12, sym_start=1, sym_count=12, dmrs_symbols=(2,))
    cfg = PuschConfig(tbs=304, target_code_rate=0.3, modulation=Modulation.QPSK,
                      alloc=alloc, nof_grid_sc=624)
    req = fapi.UlTtiRequest(slot=_slot(), pusch=[fapi.UlPuschPdu(cfg, 1, harq_id=99)])
    with pytest.raises(ValidationError, match="harq"):
        validate_ul_tti(req, 624)


def test_validate_ul_tti_full_pucch_prach_srs():
    """Full-breadth validators: per-format PUCCH + PRACH + SRS + CONFIG
    (lib/fapi/validators coverage model)."""
    import pytest

    from srsran_project_tpu.fapi import messages as fapi
    from srsran_project_tpu.fapi import validators as val
    from srsran_project_tpu.phy.prach import PrachConfig
    from srsran_project_tpu.phy.pucch import PucchFormat0Config
    from srsran_project_tpu.phy.pucch_f2 import PucchFormat2Config
    from srsran_project_tpu.ran.constants import SubcarrierSpacing
    from srsran_project_tpu.ran.slot_point import SlotPoint

    slot = SlotPoint(scs=SubcarrierSpacing.KHZ30, count=0)

    ok_f0 = PucchFormat0Config(prb=3, start_symbol=12, nof_symbols=2,
                               initial_cyclic_shift=5, n_id=1)
    ok_f2 = PucchFormat2Config(rb_start=0, rb_count=4, start_symbol=12,
                               nof_symbols=2, nof_uci_bits=6, rnti=0x4601)
    req = fapi.UlTtiRequest(slot=slot, pucch=[
        fapi.UlPucchPdu(config=ok_f0, rnti=0x4601),
        fapi.UlPucchPdu(config=ok_f2, rnti=0x4601),
    ], prach=[fapi.UlPrachPdu(config=PrachConfig(l_ra=839, zero_correlation_zone=1))])
    val.validate_ul_tti_full(req, nof_grid_sc=624)  # no raise

    bad_f0 = PucchFormat0Config(prb=60, start_symbol=12, nof_symbols=2,
                                initial_cyclic_shift=5, n_id=1)
    with pytest.raises(val.ValidationError, match="outside grid"):
        val.validate_ul_tti_full(
            fapi.UlTtiRequest(slot=slot, pucch=[fapi.UlPucchPdu(config=bad_f0, rnti=1)]),
            nof_grid_sc=624)

    bad_shift = PucchFormat0Config(prb=0, start_symbol=0, nof_symbols=1,
                                   initial_cyclic_shift=12, n_id=1)
    with pytest.raises(val.ValidationError, match="cyclic shift"):
        val.validate_ul_tti_full(
            fapi.UlTtiRequest(slot=slot, pucch=[fapi.UlPucchPdu(config=bad_shift, rnti=1)]),
            nof_grid_sc=624)

    with pytest.raises(val.ValidationError, match="zeroCorrelationZone"):
        val.validate_ul_tti_full(
            fapi.UlTtiRequest(slot=slot, prach=[
                fapi.UlPrachPdu(config=PrachConfig(l_ra=839, zero_correlation_zone=17))]),
            nof_grid_sc=624)

    val.validate_config_request(
        fapi.ConfigRequest(scs_khz=30, nof_prb=273, nof_tx_ports=4, nof_rx_ports=4))
    with pytest.raises(val.ValidationError, match="SCS"):
        val.validate_config_request(
            fapi.ConfigRequest(scs_khz=25, nof_prb=273, nof_tx_ports=4, nof_rx_ports=4))
