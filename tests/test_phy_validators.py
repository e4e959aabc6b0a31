"""PHY PDU validators (reference *_pdu_validator parity): valid configs
pass, each invariant violation is reported with a readable message."""

import dataclasses

import pytest

from srsran_project_tpu.ops.modulation import Modulation
from srsran_project_tpu.phy import pdsch, pusch, pucch, pucch_f2, pucch_f34, validators
from srsran_project_tpu.phy.allocation import Allocation


def _alloc(**kw):
    base = dict(rb_start=0, rb_count=12, sym_start=1, sym_count=12, dmrs_symbols=(2,))
    base.update(kw)
    return Allocation(**base)


def _pdsch(**kw):
    base = dict(tbs=800, target_code_rate=0.3, modulation=Modulation.QPSK,
                alloc=_alloc(), nof_layers=1, nof_ports=1,
                nof_grid_symbols=14, nof_grid_sc=624)
    base.update(kw)
    return pdsch.PdschConfig(**base)


def test_pdsch_valid_and_violations():
    assert validators.validate_pdsch(_pdsch()) is None
    assert "outside" in validators.validate_pdsch(
        _pdsch(alloc=_alloc(rb_start=50, rb_count=12), nof_grid_sc=624))
    assert "layers" in validators.validate_pdsch(_pdsch(nof_layers=5, nof_ports=8))
    assert "exceed" in validators.validate_pdsch(_pdsch(nof_layers=2, nof_ports=1))
    assert "redundancy" in validators.validate_pdsch(_pdsch(rv=4))
    assert "code rate" in validators.validate_pdsch(_pdsch(target_code_rate=1.5))
    assert "transform" in validators.validate_pdsch(
        _pdsch(transform_precoding=True, nof_layers=2, nof_ports=2))
    assert "K_PTRS" in validators.validate_pdsch(_pdsch(ptrs_enabled=True, ptrs_k=3))


def test_pusch_valid_and_violations():
    cfg = pusch.PuschConfig(tbs=800, target_code_rate=0.3, modulation=Modulation.QPSK,
                            alloc=_alloc(), nof_layers=1, nof_rx_ports=1,
                            nof_grid_symbols=14, nof_grid_sc=624)
    assert validators.validate_pusch(cfg) is None
    bad = dataclasses.replace(cfg, alloc=_alloc(dmrs_symbols=(0,)))
    assert "DM-RS" in validators.validate_pusch(bad)


def test_pucch_f0_f1_violations():
    f0 = pucch.PucchFormat0Config(prb=3, start_symbol=13, nof_symbols=1,
                                  initial_cyclic_shift=0, n_id=1, nof_harq_bits=1)
    assert validators.validate_pucch_f0(f0) is None
    assert "1-2 symbols" in validators.validate_pucch_f0(
        dataclasses.replace(f0, nof_symbols=3))
    assert "hopping" in validators.validate_pucch_f0(
        dataclasses.replace(f0, second_hop_prb=10))
    assert "SR opportunity" in validators.validate_pucch_f0(
        dataclasses.replace(f0, nof_harq_bits=0))

    f1 = pucch.PucchFormat1Config(prb=3, start_symbol=0, nof_symbols=14,
                                  initial_cyclic_shift=0, occ_index=0, n_id=1)
    assert validators.validate_pucch_f1(f1) is None
    assert "4-14" in validators.validate_pucch_f1(
        dataclasses.replace(f1, nof_symbols=2))
    assert "OCC" in validators.validate_pucch_f1(
        dataclasses.replace(f1, occ_index=7))


def test_pucch_f2_f34_violations():
    f2 = pucch_f2.PucchFormat2Config(rb_start=0, rb_count=2, start_symbol=12,
                                     nof_symbols=2, nof_uci_bits=6, rnti=1)
    assert validators.validate_pucch_f2(f2) is None
    assert "1-16 PRB" in validators.validate_pucch_f2(
        dataclasses.replace(f2, rb_count=20))
    assert "at least 3" in validators.validate_pucch_f2(
        dataclasses.replace(f2, nof_uci_bits=2))

    f3 = pucch_f34.PucchFormat34Config(prb_start=0, nof_prb=2, start_symbol=0,
                                       nof_symbols=14, nof_uci_bits=8, rnti=1)
    assert validators.validate_pucch_f34(f3) is None
    assert "DFT size" in validators.validate_pucch_f34(
        dataclasses.replace(f3, nof_prb=7))
    f4 = dataclasses.replace(f3, occ_length=2, nof_prb=1)
    assert validators.validate_pucch_f34(f4) is None
    assert "one PRB" in validators.validate_pucch_f34(
        dataclasses.replace(f4, nof_prb=2))
