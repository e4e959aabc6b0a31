"""FAPI request validators (counterpart of the reference's lib/fapi
message_validators): structural checks on DL_TTI/UL_TTI requests before they
reach the PHY — allocation bounds, PDU overlaps, payload sizing.
"""

from __future__ import annotations

from . import messages as fapi


class ValidationError(ValueError):
    pass


def _check_alloc_bounds(alloc, nof_grid_sc: int, what: str, first_rb=None):
    rb0 = (first_rb if first_rb is not None else alloc.rb_start)
    sc_hi = (rb0 + alloc.rb_count) * 12
    grid_sc = nof_grid_sc
    if sc_hi > grid_sc:
        raise ValidationError(f"{what}: allocation [{rb0}, +{alloc.rb_count}) PRB exceeds grid")
    if not 0 <= alloc.sym_start and alloc.sym_start + alloc.sym_count <= 14:
        raise ValidationError(f"{what}: symbols out of range")
    for s in alloc.dmrs_symbols:
        if not alloc.sym_start <= s < alloc.sym_start + alloc.sym_count:
            raise ValidationError(f"{what}: DM-RS symbol {s} outside allocation")


def validate_dl_tti(req: fapi.DlTtiRequest, tx_data: fapi.TxDataRequest, nof_grid_sc: int) -> None:
    if req.slot != tx_data.slot:
        raise ValidationError("DL_TTI and TX_Data slots differ")
    occupied = []
    for pdu in req.pdsch:
        cfg = pdu.config
        grid_sc = nof_grid_sc if pdu.first_rb is not None else cfg.nof_grid_sc
        _check_alloc_bounds(cfg.alloc, grid_sc, f"PDSCH rnti={pdu.rnti:#x}", pdu.first_rb)
        if pdu.tb_index >= len(tx_data.payloads):
            raise ValidationError(f"PDSCH rnti={pdu.rnti:#x}: tb_index out of range")
        if len(tx_data.payloads[pdu.tb_index]) != cfg.tbs:
            raise ValidationError(
                f"PDSCH rnti={pdu.rnti:#x}: payload {len(tx_data.payloads[pdu.tb_index])} != tbs {cfg.tbs}"
            )
        rb0 = pdu.first_rb if pdu.first_rb is not None else cfg.alloc.rb_start
        span = (rb0, rb0 + cfg.alloc.rb_count, cfg.alloc.sym_start,
                cfg.alloc.sym_start + cfg.alloc.sym_count)
        for other in occupied:
            if span[0] < other[1] and other[0] < span[1] and span[2] < other[3] and other[2] < span[3]:
                raise ValidationError(f"PDSCH rnti={pdu.rnti:#x}: overlaps another PDSCH PDU")
        occupied.append(span)
    for pdu in req.pdcch:
        cfg = pdu.config
        if (cfg.coreset_rb_start + cfg.coreset_rb_count) * 12 > cfg.nof_grid_sc:
            raise ValidationError("PDCCH: CORESET exceeds grid")
        if len(pdu.payload) != cfg.payload_bits:
            raise ValidationError("PDCCH: payload size mismatch")
        need = (cfg.cce_index + cfg.aggregation_level) * 6
        if need > cfg.nof_regs:
            raise ValidationError("PDCCH: CCEs exceed CORESET REGs")
    for pdu in req.ssb:
        if pdu.first_subcarrier + 240 > nof_grid_sc or pdu.first_symbol + 4 > 14:
            raise ValidationError("SSB: placement out of grid")
        if len(pdu.payload) != 32:
            raise ValidationError("SSB: payload must be 32 bits")


def validate_ul_tti(req: fapi.UlTtiRequest, nof_grid_sc: int) -> None:
    occupied = []
    for pdu in req.pusch:
        cfg = pdu.config
        grid_sc = nof_grid_sc if pdu.first_rb is not None else cfg.nof_grid_sc
        _check_alloc_bounds(cfg.alloc, grid_sc, f"PUSCH rnti={pdu.rnti:#x}", pdu.first_rb)
        rb0 = pdu.first_rb if pdu.first_rb is not None else cfg.alloc.rb_start
        span = (rb0, rb0 + cfg.alloc.rb_count, cfg.alloc.sym_start,
                cfg.alloc.sym_start + cfg.alloc.sym_count)
        for other in occupied:
            if span[0] < other[1] and other[0] < span[1] and span[2] < other[3] and other[2] < span[3]:
                raise ValidationError(f"PUSCH rnti={pdu.rnti:#x}: overlaps another PUSCH PDU")
        occupied.append(span)
        if not 0 <= pdu.harq_id < 16:
            raise ValidationError("PUSCH: harq_id out of range")
