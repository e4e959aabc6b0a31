"""Native library: BFP compression, IQ transport, sample ring."""

import numpy as np
import pytest

from srsran_project_tpu.support import native


def test_bfp_roundtrip_lossless_small_values():
    rng = np.random.default_rng(0)
    # Values fitting in width-1 bits compress losslessly (e = 0).
    x = rng.integers(-200, 200, size=24 * 8, dtype=np.int16)
    c = native.bfp_compress(x, width=9)
    back = native.bfp_decompress(c, 8, width=9)
    np.testing.assert_array_equal(back, x)


def test_bfp_large_values_bounded_error():
    rng = np.random.default_rng(1)
    x = rng.integers(-30000, 30000, size=24 * 16, dtype=np.int16)
    c = native.bfp_compress(x, width=9)
    back = native.bfp_decompress(c, 16, width=9)
    # Max error bounded by the quantization step 2^e, e <= 7 for 16-bit in.
    err = np.abs(back.astype(np.int32) - x.astype(np.int32))
    assert err.max() < (1 << 8)
    # Compression ratio: 9-bit mantissas + exponent vs 16-bit raw.
    assert len(c) < x.size * 2 * 0.65


def test_bfp_native_matches_numpy_fallback():
    rng = np.random.default_rng(2)
    x = rng.integers(-5000, 5000, size=24 * 4, dtype=np.int16)
    c_native = native.bfp_compress(x, width=9)
    c_np = native._bfp_compress_np(x, 4, 9)
    np.testing.assert_array_equal(c_native, c_np)
    d_native = native.bfp_decompress(c_native, 4, 9)
    d_np = native._bfp_decompress_np(np.asarray(c_np), 4, 9)
    np.testing.assert_array_equal(d_native, d_np)


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_iq_transport_loopback():
    rx = native.IqSocket.rx(47331)
    tx = native.IqSocket.tx(47331)
    rng = np.random.default_rng(3)
    iq = (rng.standard_normal(3000) + 1j * rng.standard_normal(3000)).astype(np.complex64) * 0.1
    tx.send(slot=7, symbol=3, port_id=1, iq=iq)
    got = []
    while True:
        r = rx.recv(max_samples=4096, timeout_ms=500)
        if r is None:
            break
        slot, symbol, port_id, data = r
        assert (slot, symbol, port_id) == (7, 3, 1)
        got.append(data)
        if sum(g.size for g in got) >= iq.size:
            break
    data = np.concatenate(got)
    assert data.size == iq.size
    np.testing.assert_allclose(data, iq, atol=1e-4)
    tx.close()
    rx.close()


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_sample_ring():
    ring = native.SampleRing(nof_blocks=4, block_samples=128)
    blocks = [np.full(128, i, np.int16) for i in range(4)]
    for b in blocks:
        assert ring.push(b)
    assert not ring.push(blocks[0])  # full
    assert len(ring) == 4
    for i in range(4):
        out = ring.pop()
        np.testing.assert_array_equal(out, blocks[i])
    assert ring.pop() is None
    ring.close()


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_uplane_roundtrip():
    rng = np.random.default_rng(5)
    nof_prb = 16
    iq = rng.integers(-20000, 20000, size=nof_prb * 24, dtype=np.int16)
    msg = native.ofh_uplane_build(iq, pc_id=7, seq_id=42, direction=1, frame_id=99,
                                  subframe_id=3, slot_id=13, symbol_id=11,
                                  start_prb=100, width=9)
    hdr, back = native.ofh_uplane_parse(msg)
    assert hdr == {"pc_id": 7, "seq_id": 42, "direction": 1, "frame_id": 99,
                   "subframe_id": 3, "slot_id": 13, "symbol_id": 11,
                   "start_prb": 100, "width": 9, "nof_prb": nof_prb}
    # BFP at 9-bit mantissas: bounded quantization error.
    err = np.abs(back.astype(np.int32) - iq.astype(np.int32))
    assert err.max() < (1 << 8)
    # eCPRI framing sanity.
    assert msg[0] == 0x10 and msg[1] == 0x00


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_uplane_rejects_garbage():
    with pytest.raises(ValueError):
        native.ofh_uplane_parse(np.zeros(64, np.uint8))


def test_ofh_cplane_type1_roundtrip():
    native = pytest.importorskip("srsran_project_tpu.support.native")
    if native.get_lib() is None:
        pytest.skip("native lib not built")
    secs = [native.CplaneSection(section_id=1, start_prbc=0, num_prbc=48,
                                 re_mask=0xFFF, num_symbol=14, beam_id=7),
            native.CplaneSection(section_id=2, start_prbc=48, num_prbc=0,
                                 re_mask=0x0F0, num_symbol=2, beam_id=0x7FFF)]
    msg = native.ofh_cplane_build(secs, rtc_id=5, seq_id=99, direction=1,
                                  frame_id=200, subframe_id=3, slot_id=13,
                                  start_symbol=2, section_type=1)
    hdr, out = native.ofh_cplane_parse(msg)
    assert hdr["rtc_id"] == 5 and hdr["seq_id"] == 99 and hdr["direction"] == 1
    assert hdr["frame_id"] == 200 and hdr["subframe_id"] == 3
    assert hdr["slot_id"] == 13 and hdr["start_symbol"] == 2
    assert hdr["section_type"] == 1
    assert out == secs


def test_ofh_cplane_type3_prach_with_freq_offset():
    native = pytest.importorskip("srsran_project_tpu.support.native")
    if native.get_lib() is None:
        pytest.skip("native lib not built")
    secs = [native.CplaneSection(section_id=9, start_prbc=10, num_prbc=12,
                                 freq_offset=-5000)]
    msg = native.ofh_cplane_build(secs, section_type=3, time_offset=1234)
    hdr, out = native.ofh_cplane_parse(msg)
    assert hdr["section_type"] == 3 and hdr["time_offset"] == 1234
    assert out[0].freq_offset == -5000


def test_ofh_cplane_malformed_rejected():
    native = pytest.importorskip("srsran_project_tpu.support.native")
    if native.get_lib() is None:
        pytest.skip("native lib not built")
    import numpy as np
    with pytest.raises(ValueError):
        native.ofh_cplane_parse(np.zeros(40, np.uint8))
