"""OFH subsystem: Ethernet/VLAN framing, rx window + seq-id checkers,
full C+U-plane message path over frames."""

import numpy as np

from srsran_project_tpu.ofh import ethernet
from srsran_project_tpu.ofh.receiver import RxWindowChecker, SeqIdChecker
from srsran_project_tpu.support import native


def test_vlan_frame_roundtrip_and_padding():
    dst, src = bytes(range(6)), bytes(range(6, 12))
    f = ethernet.build_frame(dst, src, b"ecpri", vlan_id=564, pcp=7)
    assert len(f) == 64  # min-size padding
    d, s, vlan, payload = ethernet.parse_frame(f)
    assert (d, s, vlan) == (dst, src, 564)
    assert payload.startswith(b"ecpri")
    # untagged
    d, s, vlan, _ = ethernet.parse_frame(ethernet.build_frame(dst, src, b"x"))
    assert vlan is None


def test_rx_window_checker():
    w = RxWindowChecker(window_early_symbols=28, window_late_symbols=2)
    w.tick(ota_symbol=1000)
    sym = 1000
    # on time / slightly future / too early / too late
    def ts(abs_sym):
        slots, symbol = divmod(abs_sym, 14)
        sfslots, slot = divmod(slots, 2)
        frame, subframe = divmod(sfslots, 10)
        return frame % 256, subframe, slot, symbol
    assert w.check(*ts(sym))
    assert w.check(*ts(sym + 20))
    assert not w.check(*ts(sym + 60))   # early (too far ahead)
    assert not w.check(*ts(sym - 10))   # late
    assert (w.stats.on_time, w.stats.early, w.stats.late) == (2, 1, 1)


def test_seq_id_checker_gap_and_duplicate():
    c = SeqIdChecker()
    assert c.check(0, 5) and c.check(0, 6)
    assert c.check(0, 9)  # gap of 2 lost
    assert c.lost == 2
    assert not c.check(0, 9)  # duplicate
    assert c.duplicates == 1
    assert c.check(1, 0)  # independent eAxC


def test_cplane_uplane_over_ethernet():
    if native.get_lib() is None:
        import pytest
        pytest.skip("native lib not built")
    rng = np.random.default_rng(0)
    iq = rng.integers(-2000, 2000, size=(4 * 24,), dtype=np.int16)
    # U-plane message in an eCPRI VLAN frame
    import ctypes
    lib = native.get_lib()
    buf = np.zeros(lib.ofh_uplane_size(4, 9), np.uint8)
    n = lib.ofh_uplane_build(buf.ctypes.data, buf.size, 2, 17, 0, 12, 3, 1, 7,
                             0, 4, 9, iq.ctypes.data)
    assert n == buf.size
    frame = ethernet.build_frame(b"\xff" * 6, b"\x02" + bytes(5), bytes(buf), vlan_id=3)
    _, _, vlan, payload = ethernet.parse_frame(frame)
    assert vlan == 3
    out = np.zeros(4 * 24, np.int16)
    import ctypes as ct
    ints = [ct.c_int() for _ in range(7)]
    pc, seq = ct.c_uint16(), ct.c_uint16()
    payload_arr = np.frombuffer(payload, np.uint8).copy()
    got = lib.ofh_uplane_parse(payload_arr.ctypes.data, payload_arr.size,
                               ct.byref(pc), ct.byref(seq),
                               *[ct.byref(i) for i in ints], out.ctypes.data)
    assert got == 4 and pc.value == 2 and seq.value == 17
    # BFP at width 9 is lossy but close
    assert np.abs(out.astype(np.int32) - iq.astype(np.int32)).max() <= (1 << 3)


def test_realtime_timing_worker_paces_slots():
    import time as _t

    from srsran_project_tpu.ofh.timing import RealtimeTimingWorker
    from srsran_project_tpu.ran.constants import SubcarrierSpacing

    slots = []
    w = RealtimeTimingWorker(SubcarrierSpacing.KHZ30, on_slot=slots.append)
    t0 = _t.monotonic()
    w.run(nof_slots=10)
    elapsed = _t.monotonic() - t0
    assert len(slots) == 10
    # 10 slots at 0.5 ms: ~5 ms wall clock (generous CI bounds)
    assert elapsed < 0.5
    counts = [s.count for s in slots]
    assert counts == sorted(counts)
    # ticking monotonically, no duplicate notifications
    assert len(set(counts)) == len(counts)
