"""FAPI message bufferer: early-cache / on-time-forward / late-reject
semantics (reference message_bufferer_slot_gateway_impl.cpp)."""

from srsran_project_tpu.fapi import bufferer as buf_mod
from srsran_project_tpu.fapi import messages as fapi
from srsran_project_tpu.ran.slot_point import SlotPoint


from srsran_project_tpu.ran.constants import SubcarrierSpacing


def _slot(n):
    return SlotPoint(scs=SubcarrierSpacing.KHZ30, count=n)


def _req(n):
    return fapi.UlTtiRequest(slot=_slot(n))


def test_on_time_messages_forward_immediately():
    sent = []
    b = buf_mod.MessageBufferer(sent.append, l2_nof_slots_ahead=2)
    b.on_slot_indication(_slot(10))
    assert b.handle_message(_req(10))
    assert len(sent) == 1 and sent[0].slot.count == 10
    assert b.stats.nof_forwarded == 1


def test_early_messages_cached_until_their_slot():
    sent = []
    b = buf_mod.MessageBufferer(sent.append, l2_nof_slots_ahead=2)
    b.on_slot_indication(_slot(10))
    assert b.handle_message(_req(12))
    assert not sent
    b.on_slot_indication(_slot(11))
    assert not sent
    b.on_slot_indication(_slot(12))
    assert len(sent) == 1 and sent[0].slot.count == 12
    assert b.stats.nof_cached == 1 and b.stats.nof_forwarded == 1


def test_late_and_too_early_rejected_with_error_indication():
    sent, errors = [], []
    b = buf_mod.MessageBufferer(sent.append, l2_nof_slots_ahead=2, on_error=errors.append)
    b.on_slot_indication(_slot(10))
    assert not b.handle_message(_req(9))  # late
    assert not b.handle_message(_req(13))  # 3 > 2 ahead
    assert not sent
    assert b.stats.nof_late == 1 and b.stats.nof_too_early == 1
    assert errors[0].error_code == fapi.ErrorCode.MSG_SLOT_ERR
    assert errors[1].error_code == fapi.ErrorCode.MSG_INVALID_SFN


def test_config_message_round_trip():
    """PARAM/CONFIG/START message dataclasses exist and carry the SCF-222
    shape (config_messages.h)."""
    presp = fapi.ParamResponse()
    assert presp.error_code == fapi.ErrorCode.MSG_OK
    assert 30 in presp.supported_scs_khz
    creq = fapi.ConfigRequest(scs_khz=30, nof_prb=273, nof_tx_ports=4, nof_rx_ports=4)
    assert creq.cp_normal
    fapi.StartRequest(), fapi.StopRequest(), fapi.StopIndication()
    resp = fapi.DlTtiResponse(slot=_slot(1), pdus=[fapi.DlTtiResponsePdu(handle=0, status=0)])
    assert resp.pdus[0].status == fapi.ErrorCode.MSG_OK
