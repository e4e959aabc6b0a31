"""L2 stack tests: MAC PDU codecs, RLC TM/UM/AM, security engines.

Security known-answer data are the published 3GPP conformance test sets
(TS 33.401 Annex C / TS 33.501 D.4, SAGE implementor's test data) — the
same sets the reference asserts in tests/unittests/security/*_test_set.h.
"""

import random

import pytest

from srsran_project_tpu.l2 import mac_pdu, rlc, security


# ---------------------------------------------------------------------------
# MAC PDU
# ---------------------------------------------------------------------------


def test_mac_pdu_roundtrip_dl():
    subs = [
        mac_pdu.MacSubPdu(int(mac_pdu.DlLcid.TA_CMD), mac_pdu.ce_ta_command(1, 33)),
        mac_pdu.MacSubPdu(int(mac_pdu.DlLcid.CON_RES_ID), mac_pdu.ce_con_res_id(b"abcdef")),
        mac_pdu.MacSubPdu(4, b"x" * 100),
        mac_pdu.MacSubPdu(5, b"y" * 300),  # forces 16-bit L field
    ]
    pdu = mac_pdu.encode_mac_pdu(subs, tb_size=600)
    assert len(pdu) == 600
    out = mac_pdu.decode_mac_pdu(pdu)
    assert out[0].payload == mac_pdu.ce_ta_command(1, 33)
    assert mac_pdu.parse_ta_command(out[0].payload) == (1, 33)
    assert out[1].payload == b"abcdef"
    assert out[2] == subs[2]
    assert out[3] == subs[3]
    assert out[4].is_padding


def test_mac_pdu_roundtrip_ul_ces():
    subs = [
        mac_pdu.MacSubPdu(3, b"data" * 10),
        mac_pdu.MacSubPdu(int(mac_pdu.UlLcid.CRNTI), mac_pdu.ce_crnti(0x4601)),
        mac_pdu.MacSubPdu(int(mac_pdu.UlLcid.SHORT_BSR), mac_pdu.ce_short_bsr(2, 17)),
        mac_pdu.MacSubPdu(int(mac_pdu.UlLcid.LONG_BSR), mac_pdu.ce_long_bsr({0: 5, 3: 200})),
        mac_pdu.MacSubPdu(int(mac_pdu.UlLcid.SINGLE_PHR), mac_pdu.ce_single_phr(40, 20)),
    ]
    out = mac_pdu.decode_mac_pdu(mac_pdu.encode_mac_pdu(subs, uplink=True), uplink=True)
    assert mac_pdu.parse_crnti(out[1].payload) == 0x4601
    assert mac_pdu.parse_short_bsr(out[2].payload) == (2, 17)
    assert mac_pdu.parse_long_bsr(out[3].payload) == {0: 5, 3: 200}
    assert mac_pdu.parse_single_phr(out[4].payload) == (40, 20)


def test_bsr_index():
    assert mac_pdu.bsr_index_from_bytes(0) == 0
    assert mac_pdu.bsr_index_from_bytes(10) == 1
    assert mac_pdu.bsr_index_from_bytes(11) == 2
    assert mac_pdu.bsr_index_from_bytes(10**9) == 31


def test_rar_roundtrip():
    grants = [
        mac_pdu.RarGrant(rapid=7, ta=100, ul_grant=0x123456, tc_rnti=0x4601),
        mac_pdu.RarGrant(rapid=63, ta=4095, ul_grant=(1 << 27) - 1, tc_rnti=0xFFFF),
    ]
    backoff, out = mac_pdu.decode_rar_pdu(mac_pdu.encode_rar_pdu(grants, backoff_ms_index=5))
    assert backoff == 5 and out == grants


# ---------------------------------------------------------------------------
# RLC
# ---------------------------------------------------------------------------


def _pump(tx, rx, max_size, lose=None, n=10_000):
    """Pull PDUs from tx, deliver to rx (dropping indices in lose)."""
    k = 0
    for _ in range(n):
        pdu = tx.pull_pdu(max_size)
        if pdu is None:
            break
        if lose is None or k not in lose:
            rx.rx_pdu(pdu)
        k += 1
    return k


@pytest.mark.parametrize("sn_bits", [6, 12])
def test_rlc_um_segmentation(sn_bits):
    got = []
    rx = rlc.RlcUmEntity(sn_bits=sn_bits, on_rx_sdu=got.append)
    tx = rlc.RlcUmEntity(sn_bits=sn_bits)
    sdus = [bytes([i]) * ln for i, ln in enumerate([3, 50, 700, 1, 1200])]
    for s in sdus:
        tx.tx_sdu(s)
    _pump(tx, rx, 100)
    assert got == sdus


def test_rlc_um_loss_drops_one_sdu():
    got = []
    rx = rlc.RlcUmEntity(sn_bits=12, on_rx_sdu=got.append)
    tx = rlc.RlcUmEntity(sn_bits=12)
    sdus = [bytes([i]) * 500 for i in range(4)]
    for s in sdus:
        tx.tx_sdu(s)
    _pump(tx, rx, 99, lose={7})  # drop one mid segment
    rx.tick(1000)  # expire reassembly
    assert len(got) == 3 and rx.dropped_sdus == 1


@pytest.mark.parametrize("sn_bits", [12, 18])
def test_rlc_am_lossless(sn_bits):
    got = []
    rx = rlc.RlcAmEntity(sn_bits=sn_bits, on_rx_sdu=got.append)
    tx = rlc.RlcAmEntity(sn_bits=sn_bits)
    sdus = [bytes([i]) * ln for i, ln in enumerate([10, 900, 80, 2000, 1])]
    for s in sdus:
        tx.tx_sdu(s)
    _pump(tx, rx, 150)
    assert got == sdus
    tx.rx_status(rlc.decode_status_pdu(rx.build_status(), sn_bits))
    assert tx._tx_next_ack == tx._tx_next  # everything acked


def test_rlc_am_retransmission_recovers_losses():
    rng = random.Random(7)
    got = []
    rx = rlc.RlcAmEntity(sn_bits=12, on_rx_sdu=got.append)
    tx = rlc.RlcAmEntity(sn_bits=12)
    sdus = [bytes([i % 256]) * rng.randrange(1, 1500) for i in range(30)]
    for s in sdus:
        tx.tx_sdu(s)
    # lossy rounds: pull/deliver with 20% loss, then exchange status
    for _ in range(20):
        for _ in range(64):
            pdu = tx.pull_pdu(120)
            if pdu is None:
                break
            if rng.random() > 0.2:
                rx.rx_pdu(pdu)
        tx.rx_status(rlc.decode_status_pdu(rx.build_status(), 12))
        if len(got) == len(sdus):
            break
    # NR RLC AM delivers complete SDUs as reassembled (possibly out of
    # order — in-order delivery is PDCP's job, TS 38.322/38.323)
    assert sorted(got) == sorted(sdus)
    assert not tx.max_retx_reached


def test_rlc_status_pdu_codec():
    for sn_bits in (12, 18):
        st = rlc.AmStatus(ack_sn=1234 % (1 << sn_bits), nacks=((7, None, None), (9, 10, 500), (11, 0, 0xFFFF)))
        assert rlc.decode_status_pdu(rlc.encode_status_pdu(st, sn_bits), sn_bits) == st


def test_rlc_tm_passthrough():
    got = []
    e = rlc.RlcTmEntity(on_rx_sdu=got.append)
    e.tx_sdu(b"hello")
    assert e.pull_pdu(3) is None
    pdu = e.pull_pdu(10)
    e.rx_pdu(pdu)
    assert got == [b"hello"]


# ---------------------------------------------------------------------------
# Security: 3GPP conformance test sets
# ---------------------------------------------------------------------------

H = bytes.fromhex


def test_aes128_fips197():
    key = H("000102030405060708090a0b0c0d0e0f")
    pt = H("00112233445566778899aabbccddeeff")
    assert security.aes128_encrypt_block(key, pt) == H("69c4e0d86a7b0430d8cdb78070b4c55a")


def test_aes_cmac_rfc4493():
    key = H("2b7e151628aed2a6abf7158809cf4f3c")
    assert security.aes_cmac(key, b"") == H("bb1d6929e95937287fa37d129b756746")
    assert security.aes_cmac(key, H("6bc1bee22e409f96e93d7e117393172a")) == H("070a16b46b4d4144f79bdd9dd04a287c")


# (name, fn, key, count, bearer, direction, plaintext, ciphertext) — TS 33.401
# Annex C / SAGE implementor's test data, full-byte cases.
NEA_SETS = [
    ("NEA1_1", 1, 253, "D3C5D592327FB11C4035C6680AF8C6D1", 0x398A59B4, 0x15, 1,
     "981BA6824C1BFB1AB485472029B71D808CE33E2CC3C0B5FC1F3DE8A6DC66B1F0",
     "5D5BFE75EB04F68CE0A12377EA00B37D47C6A0BA06309155086A859C4341B378"),
    ("NEA2_1", 2, 253, "d3c5d592327fb11c4035c6680af8c6d1", 0x398A59B4, 0x15, 1,
     "981ba6824c1bfb1ab485472029b71d808ce33e2cc3c0b5fc1f3de8a6dc66b1f0",
     "e9fed8a63d155304d71df20bf3e82214b20ed7dad2f233dc3c22d7bdeeed8e78"),
    ("NEA3_2", 3, 800, "e5bd3ea0eb55ade866c6ac58bd54302a", 0x56823, 0x18, 1,
     "14a8ef693d678507bbe7270a7f67ff5006c3525b9807e467c4e56000ba338f5d429559036751822246c80d3b38f07f4b"
     "e2d8ff5805f5132229bde93bbbdcaf382bf1ee972fbf9977bada8945847a2a6c9ad34a667554e04d1f7fa2c33241bd8f01ba220d",
     "131d43e0dea1be5c5a1bfd971d852cbf712d7b4f57961fea3208afa8bca433f456ad09c7417e58bc69cf8866d1353f74"
     "865e80781d202dfb3ecff7fcbc3b190fe82a204ed0e350fc0f6f2613b2f2bca6df5a473a57a4a00d985ebad880d6f23864a07b01"),
]


@pytest.mark.parametrize("name,algo,nbits,key,count,bearer,direction,pt,ct", NEA_SETS)
def test_nea_conformance(name, algo, nbits, key, count, bearer, direction, pt, ct):
    fn = security.CIPHERING[algo]
    out = fn(H(key), count, bearer, direction, H(pt), length_bits=nbits)
    assert out == H(ct), name
    # involutive (up to the zeroed tail bits beyond LENGTH)
    back = fn(H(key), count, bearer, direction, out, length_bits=nbits)
    assert back == security._zero_tail(H(pt), nbits)


NIA_SETS = [
    ("NIA1_1", 1, "2bd6459f82c5b300952c49104881ff48", 0x38A6F056, 0x1F, 0, "3332346263393861373479", "731f1165"),
    ("NIA1_4", 1, "83fd23a244a74cf358da3019f1722635", 0x36AF6144, 0x0F, 1,
     "35c68716633c66fb750c266865d53c11ea05b1e9fa49c8398d48e1efa5909d3947902837f5ae96d5a05bc8d61ca8dbef"
     "1b13a4b4abfe4fb1006045b674bb54729304c382be53a5af05556176f6eaa2ef1d05e4b083181ee674cda5a485f74d7a", "bba74492"),
    ("NIA2_1m", 2, "2bd6459f82c5b300952c49104881ff48", 0x38A6F056, 0x18, 0, "3332346263393840", "c28458e9"),
    ("NIA2_2", 2, "d3c5d592327fb11c4035c6680af8c6d1", 0x398A59B4, 0x1A, 1, "484583d5afe082ae", "b93787e6"),
    ("NIA3_1m", 3, "00000000000000000000000000000000", 0x0, 0x0, 0, "00", "390a91b7"),
    ("NIA3_2m", 3, "47054125561eb2dda94059da05097850", 0x561EB2DD, 0x14, 0, "000000000000000000000000", "89a58b47"),
]


@pytest.mark.parametrize("name,algo,ik,count,bearer,direction,msg,mact", NIA_SETS)
def test_nia_conformance(name, algo, ik, count, bearer, direction, msg, mact):
    fn = security.INTEGRITY[algo]
    assert fn(H(ik), count, bearer, direction, H(msg)) == H(mact), name


def test_zuc_keystream_kat():
    """TS 35.222 test vector 1: all-zero key and IV."""
    z = security.Zuc(bytes(16), bytes(16)).keystream(2)
    assert z == [0x27BEDE74, 0x018082DA]


def test_security_engine_protect_roundtrip():
    for nea in (0, 1, 2, 3):
        for nia in (1, 2, 3):
            eng = security.SecurityEngine(nea, nia, bytes(range(16)), bytes(range(16, 32)), bearer=3)
            body = eng.protect(900, security.DIR_DOWNLINK, b"\x80\x01", b"payload-bytes")
            payload, ok = eng.unprotect(900, security.DIR_DOWNLINK, b"\x80\x01", body)
            assert ok and payload == b"payload-bytes"
            # corrupting the body must break integrity
            bad = bytes([body[0] ^ 0xFF]) + body[1:]
            _, ok2 = eng.unprotect(900, security.DIR_DOWNLINK, b"\x80\x01", bad)
            assert not ok2
