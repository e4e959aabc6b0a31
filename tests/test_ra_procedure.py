"""4-step random access through the PHY PRACH detector + MAC RA manager."""

import numpy as np

from srsran_project_tpu.fapi import messages as fapi
from srsran_project_tpu.l2 import mac_pdu
from srsran_project_tpu.l2sim.ra import RaManager
from srsran_project_tpu.phy import prach as prach_mod
from srsran_project_tpu.phy.upper_phy import UpperPhy, UpperPhyConfig
from srsran_project_tpu.ran.constants import SubcarrierSpacing
from srsran_project_tpu.ran.slot_point import SlotPoint


def _slot(i=0):
    return SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, 0, i)


def test_four_step_ra_through_phy():
    phy = UpperPhy(UpperPhyConfig(nof_ports=1))
    ra = RaManager()

    # Msg1: UE transmits preamble 23; gNB detects it via the real detector
    cfg = prach_mod.PrachConfig(l_ra=839, zero_correlation_zone=1)
    fd = prach_mod.generate_preamble(cfg, 23)[None, :].astype(np.complex64)
    req = fapi.UlTtiRequest(slot=_slot(0), prach=[fapi.UlPrachPdu(cfg)])
    res = phy.process_ul_tti(req, np.zeros((1, 14, 624), np.complex64), prach_fd=fd)
    assert len(res.rach) == 1 and res.rach[0].preamble_index == 23

    ctx = ra.handle_rach_indication(0, res.rach[0])
    assert ctx.tc_rnti == 0x4601

    # Msg2: RAR TB addressed to RA-RNTI; the UE parses it
    rar_tb = ra.build_rar_tb(slot_count=2, tbs_bits=256)
    assert rar_tb is not None
    backoff, grants = mac_pdu.decode_rar_pdu(np.packbits(rar_tb).tobytes())
    assert backoff is None and grants[0].rapid == 23
    assert grants[0].tc_rnti == 0x4601
    assert grants[0].ta == ctx.ta_cmd

    # Msg3: UE sends its 48-bit identity on CCCH over the granted PUSCH
    ue_id = bytes.fromhex("a1b2c3d4e5f6")
    msg3 = mac_pdu.encode_mac_pdu(
        [mac_pdu.MacSubPdu(int(mac_pdu.UlLcid.CCCH48), ue_id)], tb_size=32, uplink=True)
    got = ra.handle_msg3(4, np.unpackbits(np.frombuffer(msg3, np.uint8)))
    assert got is ctx and ctx.state == "msg3_received"

    # Msg4: contention resolution echoes the identity; UE matches it
    subpdus = ra.build_msg4_subpdus(ctx)
    msg4 = mac_pdu.encode_mac_pdu(subpdus, tb_size=16)
    rx = mac_pdu.decode_mac_pdu(msg4)
    assert rx[0].lcid == int(mac_pdu.DlLcid.CON_RES_ID)
    assert rx[0].payload == ue_id  # UE: contention resolved, TC-RNTI -> C-RNTI
    assert ra.resolved == [ctx] and not ra.pending


def test_ra_window_expiry():
    ra = RaManager()
    ra.handle_rach_indication(0, fapi.RachIndicationPdu(preamble_index=5, metric=10.0,
                                                        ta_samples=32.0))
    assert ra.build_rar_tb(1, 128) is not None
    ra.expire(20)  # Msg3 never arrived
    assert not ra.pending


def test_ta_command_quantization():
    ra = RaManager()
    ctx = ra.handle_rach_indication(0, fapi.RachIndicationPdu(preamble_index=1, metric=9.0,
                                                              ta_samples=100.0))
    assert ctx.ta_cmd == round(100.0 / 16)
