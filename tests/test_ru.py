"""RU abstraction layer: dummy / generic / OFH implementations behind the
common radio_unit interface (reference include/srsran/ru/ru.h family,
lib/ru/{dummy,generic,ofh})."""

import numpy as np
import pytest

from srsran_project_tpu.ran.constants import SubcarrierSpacing
from srsran_project_tpu.ran.slot_point import SlotPoint
from srsran_project_tpu.ru import (
    PrachBufferContext,
    ResourceGridContext,
    RuDummy,
    RuDummyConfig,
    RuGeneric,
    RuGenericConfig,
    RuOfh,
    RuOfhConfig,
    create_ru,
)
from srsran_project_tpu.support import native

SCS = SubcarrierSpacing.KHZ30


class Collector:
    def __init__(self):
        self.symbols = []
        self.prach = []
        self.ttis = []

    def on_new_uplink_symbol(self, context, grid, is_valid):
        self.symbols.append((context, grid, is_valid))

    def on_new_prach_window_data(self, context, buffer):
        self.prach.append((context, buffer))

    def on_tti_boundary(self, slot):
        self.ttis.append(slot)

    def on_ul_half_slot_boundary(self, slot):
        pass

    def on_ul_full_slot_boundary(self, slot):
        pass


class Errors:
    def __init__(self):
        self.dl = []
        self.ul = []
        self.prach = []

    def on_late_downlink_message(self, slot, sector):
        self.dl.append(slot)

    def on_late_uplink_message(self, slot, sector):
        self.ul.append(slot)

    def on_late_prach_message(self, slot, sector):
        self.prach.append(slot)


def test_dummy_ru_on_time_requests_notify():
    col, err = Collector(), Errors()
    cfg = RuDummyConfig(scs=SCS, dl_data_margin=2)
    ru = RuDummy(cfg, col, timing_notifier=col, error_notifier=err)
    dl = ru.get_downlink_plane_handler()
    ul = ru.get_uplink_plane_handler()

    slot = SlotPoint.from_sfn_slot(SCS, 10, 0)
    # DL request arrives margin slots early; UL request for the boundary slot.
    dl.handle_dl_data(ResourceGridContext(slot=slot + cfg.dl_data_margin), np.zeros((1, 14, 12)))
    ul.handle_new_uplink_slot(ResourceGridContext(slot=slot))
    ul.handle_prach_occasion(PrachBufferContext(slot=slot))
    ru.tick(slot)

    m = ru.get_metrics()
    assert m.total_dl_requests == 1 and m.total_ul_requests == 1
    assert m.late_dl_requests == 0 and m.late_ul_requests == 0
    assert len(col.symbols) == 14  # one notification per OFDM symbol
    assert len(col.prach) == 1
    assert col.ttis and col.ttis[0] == slot
    assert not err.dl and not err.ul


def test_dummy_ru_detects_late_requests():
    col, err = Collector(), Errors()
    cfg = RuDummyConfig(scs=SCS, dl_data_margin=2)
    ru = RuDummy(cfg, col, error_notifier=err)
    slot = SlotPoint.from_sfn_slot(SCS, 0, 4)

    # UL request for an old slot left in the ring: boundary of a different
    # slot mapping to the same ring index flags it late
    # (ru_dummy_sector.h:190-199 semantics).
    stale = SlotPoint.from_sfn_slot(SCS, 0, 4)
    ru.handle_new_uplink_slot(ResourceGridContext(slot=stale))
    ring = len(ru.sectors[0]._ul)
    boundary = SlotPoint(SCS, stale.count + ring)  # same index, later slot
    ru.tick(boundary)
    m = ru.get_metrics()
    assert m.late_ul_requests == 1
    assert err.ul == [stale]
    assert not col.symbols


def test_dummy_ru_loopback_returns_dl_grid():
    col = Collector()
    cfg = RuDummyConfig(scs=SCS, dl_data_margin=0, loopback=True)
    ru = RuDummy(cfg, col)
    slot = SlotPoint.from_sfn_slot(SCS, 1, 1)
    grid = np.arange(14 * 12, dtype=np.complex64).reshape(1, 14, 12)
    ru.handle_dl_data(ResourceGridContext(slot=slot), grid)
    ru.handle_new_uplink_slot(ResourceGridContext(slot=slot))
    ru.tick(slot)
    assert len(col.symbols) == 14
    ctx, got, valid = col.symbols[0]
    assert valid and np.array_equal(np.asarray(got), grid)


def test_generic_ru_modulates_and_roundtrips():
    col = Collector()
    cfg = RuGenericConfig(scs=SCS, dft_size=256, nof_rb=12)
    tx = {}
    ru = RuGeneric(cfg, col, transmit_cb=lambda s, x: tx.setdefault(s, x),
                   timing_notifier=col)
    slot = SlotPoint.from_sfn_slot(SCS, 3, 1)
    rng = np.random.default_rng(0)
    grid = (rng.standard_normal((1, 14, 144)) + 1j * rng.standard_normal((1, 14, 144))).astype(np.complex64)

    ru.handle_dl_data(ResourceGridContext(slot=slot), grid)
    ru.handle_new_uplink_slot(ResourceGridContext(slot=slot))
    # No UL baseband yet: advancing a fresh slot must transmit the DL and
    # notify invalid UL symbols.
    ru.advance_slot(slot)
    assert slot in tx
    assert len(col.symbols) == 14 and not col.symbols[0][2]

    # Round-trip: feed the transmitted baseband back as UL.
    col2 = Collector()
    ru2 = RuGeneric(cfg, col2)
    slot2 = slot + 1
    ru2.handle_dl_data(ResourceGridContext(slot=slot2), grid)
    tx2 = {}
    ru2.transmit_cb = lambda s, x: tx2.setdefault(s, x)
    ru2.handle_new_uplink_slot(ResourceGridContext(slot=slot2))
    ru2.advance_slot(slot2)  # transmits
    ru2.push_ul_samples(slot2 + 1, np.asarray(tx2[slot2]))
    ru2.handle_new_uplink_slot(ResourceGridContext(slot=slot2 + 1))
    ru2.advance_slot(slot2 + 1)
    # The last notified grid is the demodulated one.
    ctx, got, valid = col2.symbols[-1]
    assert valid
    got = np.asarray(got)
    # slot_in_subframe differs (phase comp), so compare magnitudes.
    assert np.allclose(np.abs(got), np.abs(grid), atol=2e-3)


def test_generic_ru_counts_stale_requests():
    col = Collector()
    cfg = RuGenericConfig(scs=SCS, dft_size=256, nof_rb=12)
    ru = RuGeneric(cfg, col)
    slot = SlotPoint.from_sfn_slot(SCS, 5, 0)
    ru.handle_new_uplink_slot(ResourceGridContext(slot=slot))
    ru.advance_slot(slot + 3)  # the request's slot is now in the past
    assert ru.get_metrics().late_ul_requests == 1


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_ru_slot_roundtrip():
    """DL grid → OFH frames → (loopback as UL) → notified UL grid."""
    col = Collector()
    cfg = RuOfhConfig(scs=SCS, nof_prb=12, nof_ports=1, dl_pacing="sync")
    frames = []
    ru = RuOfh(cfg, col, send_frame=frames.append)
    slot = SlotPoint.from_sfn_slot(SCS, 7, 3)
    rng = np.random.default_rng(1)
    grid = (rng.standard_normal((1, 14, 144)) + 1j * rng.standard_normal((1, 14, 144))).astype(np.complex64) * 0.1

    ru.ota_tick(slot)
    ru.handle_new_uplink_slot(ResourceGridContext(slot=slot))
    ru.handle_dl_data(ResourceGridContext(slot=slot), grid)
    # 1 C-plane UL req + 1 C-plane DL + 14 U-plane messages
    assert len(frames) == 16

    # Loop the U-plane frames back as the RU's uplink transmission.
    for f in frames:
        # U-plane messages have eCPRI msgtype 0 at byte 1.
        if f[1] == 0x00:
            ru.push_uplane_frame(f)
    assert len(col.symbols) == 14
    ctx, got, valid = col.symbols[0]
    assert valid
    # BFP width 9 → ~1% quantization on these amplitudes.
    assert np.allclose(np.asarray(got), grid, atol=2e-2)


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_ru_drops_out_of_window_frames():
    col = Collector()
    cfg = RuOfhConfig(scs=SCS, nof_prb=12)
    frames = []
    ru = RuOfh(cfg, col, send_frame=frames.append)
    slot = SlotPoint.from_sfn_slot(SCS, 0, 0)
    ru.handle_new_uplink_slot(ResourceGridContext(slot=slot))
    ru.handle_dl_data(ResourceGridContext(slot=slot),
                      np.zeros((1, 14, 144), np.complex64))
    # OTA clock far ahead: everything arrives late and is dropped.
    ru.ota_tick(slot + 100)
    for f in frames:
        if f[1] == 0x00:
            ru.push_uplane_frame(f)
    assert not col.symbols
    assert ru.window.stats.late == 14


def test_factory_dispatch():
    col = Collector()
    ru = create_ru("dummy", RuDummyConfig(), col)
    assert isinstance(ru, RuDummy)
    ru = create_ru("generic", RuGenericConfig(), col)
    assert isinstance(ru, RuGeneric)
    with pytest.raises(ValueError):
        create_ru("uhd", RuDummyConfig(), col)


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_ru_static_compression_roundtrip():
    """Static-compression mode: U-plane sections carry no udCompHdr yet
    round-trip bit-identically when both ends share the configured width."""
    col = Collector()
    cfg = RuOfhConfig(scs=SCS, nof_prb=12, compression_mode="static", dl_pacing="sync")
    frames = []
    ru = RuOfh(cfg, col, send_frame=frames.append)
    slot = SlotPoint.from_sfn_slot(SCS, 2, 2)
    rng = np.random.default_rng(3)
    grid = (rng.standard_normal((1, 14, 144)) + 1j * rng.standard_normal((1, 14, 144))).astype(np.complex64) * 0.1
    ru.ota_tick(slot)
    ru.handle_new_uplink_slot(ResourceGridContext(slot=slot))
    ru.handle_dl_data(ResourceGridContext(slot=slot), grid)
    uplane = [f for f in frames if f[1] == 0x00]
    # Static messages are 2 bytes/section shorter than dynamic ones.
    dyn_len = len(native.ofh_uplane_build(np.zeros(12 * 24, np.int16), width=9))
    assert all(len(f) == dyn_len - 2 for f in uplane)
    for f in uplane:
        ru.push_uplane_frame(f)
    assert len(col.symbols) == 14
    assert np.allclose(np.asarray(col.symbols[0][1]), grid, atol=2e-2)


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_cplane_type0_idle_guard():
    """C-plane section type 0 (idle/guard period) round-trips: timeOffset,
    frameStructure, cpLength and the single section's PRB/symbol range
    (reference build_idle_guard_period_message)."""
    sec = native.CplaneSection(section_id=5, start_prbc=0, num_prbc=106,
                               re_mask=0xFFF, num_symbol=4)
    msg = native.ofh_cplane_build_type0(sec, rtc_id=2, seq_id=77, frame_id=9,
                                        subframe_id=3, slot_id=1, start_symbol=10,
                                        time_offset=480, frame_structure=0x91,
                                        cp_length=352)
    hdr, got = native.ofh_cplane_parse_type0(msg)
    assert hdr["time_offset"] == 480
    assert hdr["frame_structure"] == 0x91
    assert hdr["cp_length"] == 352
    assert hdr["start_symbol"] == 10
    assert got.num_prbc == 106 and got.num_symbol == 4 and got.section_id == 5
    # A type-1 parser must reject it.
    with pytest.raises(ValueError):
        native.ofh_cplane_parse(msg)


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_ru_send_idle_guard():
    col = Collector()
    frames = []
    ru = RuOfh(RuOfhConfig(scs=SCS, nof_prb=24), col, send_frame=frames.append)
    slot = SlotPoint.from_sfn_slot(SCS, 0, 1)
    ru.send_idle_guard(slot, start_symbol=12, nof_symbols=2)
    hdr, sec = native.ofh_cplane_parse_type0(frames[0])
    assert hdr["start_symbol"] == 12 and sec.num_symbol == 2 and sec.num_prbc == 24


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_cplane_ud_comp_hdr_static_vs_dynamic():
    """The type-1 udCompHdr byte follows the reference's rules: static mode
    and downlink encode 0; dynamic uplink encodes iqWidth<<4|compMeth with
    16-bit width mapping to 0 (serialize_compression_header)."""
    assert native.ud_comp_hdr(9, direction=0, mode="dynamic") == 0x91
    assert native.ud_comp_hdr(16, direction=0, mode="dynamic") == 0x01
    assert native.ud_comp_hdr(9, direction=1, mode="dynamic") == 0
    assert native.ud_comp_hdr(9, direction=0, mode="static") == 0
    s = native.CplaneSection(num_prbc=24, num_symbol=14)
    msg = native.ofh_cplane_build_comp(
        [s], direction=0, comp_byte=native.ud_comp_hdr(9, 0, "dynamic"))
    assert native.ofh_cplane_comp_hdr(msg) == 0x91
    hdr, secs = native.ofh_cplane_parse(msg)
    assert hdr["section_type"] == 1 and secs[0].num_prbc == 24


def test_generic_ru_demodulates_prach_occasion():
    """A PRACH occasion request returns the TS 38.211 5.3.2 frequency-
    domain buffer: a preamble synthesized at the window's DFT bins comes
    back at the right buffer indices."""
    from srsran_project_tpu.ops import lower_phy

    col = Collector()
    cfg = RuGenericConfig(scs=SCS, dft_size=2048, nof_rb=51)
    ru = RuGeneric(cfg, col)
    slot = SlotPoint.from_sfn_slot(SCS, 0, 1)
    ctx = PrachBufferContext(slot=slot, start_symbol=0, format="B4")
    wp = lower_phy.prach_window_params(
        fmt="B4", pusch_scs_hz=30000, slot_in_subframe=slot.slot_in_subframe,
        start_symbol=0, td_occasion=0, srate_hz=2048 * 30000,
        rb_offset=0, fd_occasion=0, nof_prb_ul_grid=51, l_ra=139)

    # Synthesize: preamble values on the window's bins, OFDM'd with CP.
    rng = np.random.default_rng(5)
    pre = np.exp(2j * np.pi * rng.random(139)).astype(np.complex64)
    spec = np.zeros(wp["dft_size"], np.complex64)
    spec[(wp["k_offset"] + np.arange(139)) % wp["dft_size"]] = pre
    sym = np.fft.ifft(spec) * np.sqrt(wp["dft_size"])
    body = np.tile(sym, wp["nof_symbols"])
    cp = body[-wp["cp_samples"]:]
    samples = np.zeros(wp["sample_offset"], np.complex64)
    samples = np.concatenate([samples, cp, body]).astype(np.complex64)[None]

    ru.handle_prach_occasion(ctx)
    ru.push_ul_samples(slot, samples)
    ru.advance_slot(slot)
    assert len(col.prach) == 1
    _, buffer = col.prach[0]
    assert buffer.shape[-2:] == (wp["nof_symbols"], 139)
    assert np.allclose(buffer[0, 0], pre, atol=1e-3)


def test_generic_ru_through_time_domain_tdl_channel():
    """Full lower-PHY realism: RU-modulated baseband through a sparse-FIR
    TDL-A channel (true multipath within the CP) decodes CRC-OK."""
    import jax
    import jax.numpy as jnp

    from srsran_project_tpu.ops.modulation import Modulation
    from srsran_project_tpu.phy import channel_emulator as chem
    from srsran_project_tpu.phy import pdsch, pusch
    from srsran_project_tpu.phy.allocation import Allocation

    alloc = Allocation(rb_start=0, rb_count=24, sym_start=0, sym_count=14,
                       dmrs_symbols=(2, 11))
    common = dict(tbs=1200, target_code_rate=0.3, modulation=Modulation.QPSK,
                  alloc=alloc, nof_layers=1, nof_grid_symbols=14, nof_grid_sc=288)
    txc = pdsch.PdschConfig(nof_ports=1, **common)
    rxc = pusch.PuschConfig(nof_rx_ports=1, **common)
    rng = np.random.default_rng(0)
    tb = rng.integers(0, 2, (1200,), np.uint8)
    grid = np.asarray(pdsch.process(jnp.asarray(tb), jnp.uint32(9),
                                    jnp.eye(1, dtype=jnp.complex64), txc))

    col = Collector()
    cfg = RuGenericConfig(scs=SCS, dft_size=512, nof_rb=24)
    tx = {}
    ru = RuGeneric(cfg, col, transmit_cb=lambda s, x: tx.__setitem__(s, x))
    slot = SlotPoint.from_sfn_slot(SCS, 0, 0)
    ru.handle_dl_data(ResourceGridContext(slot=slot), grid)
    ru.advance_slot(slot)
    ch = chem.ChannelConfig(profile="tdla", sinr_db=20.0, nof_tx_ports=1,
                            nof_rx_ports=1, nof_sc=288)
    rx = np.asarray(chem.apply_channel_time(np.asarray(tx[slot]),
                                            jax.random.PRNGKey(3), ch,
                                            srate_hz=512 * 30e3))
    ru.push_ul_samples(slot, rx)
    ru.handle_new_uplink_slot(ResourceGridContext(slot=slot))
    ru.advance_slot(slot)
    out = pusch.process(jnp.asarray(col.symbols[-1][1]), jnp.uint32(9), rxc)
    assert bool(out["tb_crc_ok"])


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_ru_prach_ingress_completes_occasion():
    """Regression (round-3 advice): PRACH-eAxC U-plane frames fill the
    pending occasion buffer and notify on_new_prach_window_data."""
    col = Collector()
    cfg = RuOfhConfig(scs=SCS, nof_prb=12, nof_ports=1, dl_pacing="sync")
    frames = []
    ru = RuOfh(cfg, col, send_frame=frames.append)
    slot = SlotPoint.from_sfn_slot(SCS, 3, 1)
    ru.ota_tick(slot)
    ctx = PrachBufferContext(slot=slot, start_symbol=0, format="B4")
    ru.handle_prach_occasion(ctx)
    assert len(frames) == 1  # type-3 C-plane request went out

    # RU answers with one U-plane frame per occasion symbol on the PRACH
    # eAxC carrying the 139-RE frequency-domain sequence.
    rng = np.random.default_rng(9)
    pre = np.exp(2j * np.pi * rng.random(139)).astype(np.complex64) * 0.4
    frame_id, subframe_id, slot_id = ru._timestamp(slot)
    padded = np.zeros(144, np.complex64)  # 139 REs padded to 12 PRBs
    padded[:139] = pre
    for sym in range(12):
        iq = np.empty(144 * 2, np.int16)
        scaled = padded * cfg.iq_scale
        iq[0::2] = np.round(scaled.real).astype(np.int16)
        iq[1::2] = np.round(scaled.imag).astype(np.int16)
        msg = native.ofh_uplane_build(
            iq, pc_id=cfg.prach_eaxc, seq_id=sym, direction=0,
            frame_id=frame_id, subframe_id=subframe_id, slot_id=slot_id,
            symbol_id=sym, start_prb=0, width=14)
        ru.push_uplane_frame(msg)
    assert len(col.prach) == 1
    got_ctx, buffer = col.prach[0]
    assert got_ctx is ctx
    assert buffer.shape == (1, 12, 139)
    assert np.allclose(buffer[0, 3], pre, atol=2e-2)
    assert not ru._prach_pending


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_ru_evicts_stale_pending_contexts():
    """Regression (round-3 advice): pending UL slots / PRACH occasions whose
    window closed are purged and counted late, so the maps cannot grow
    without bound when frames are lost."""
    col = Collector()
    cfg = RuOfhConfig(scs=SCS, nof_prb=12)
    ru = RuOfh(cfg, col, send_frame=lambda f: None)
    slot = SlotPoint.from_sfn_slot(SCS, 1, 0)
    ru.ota_tick(slot)
    # Requests arrive IN their C-plane windows (one slot ahead of air
    # time) — a request whose C-plane window already closed is dropped
    # and un-registered immediately instead (separate test below).
    air = slot + 1
    ru.handle_new_uplink_slot(ResourceGridContext(slot=air))
    ru.handle_prach_occasion(PrachBufferContext(slot=air, format="B4"))
    assert ru._ul_pending and ru._prach_pending
    # No U-plane ever arrives; OTA time passes beyond the late window.
    ru.ota_tick(air + 3)
    assert not ru._ul_pending and not ru._ul_filled and not ru._prach_pending
    m = ru.get_metrics()
    assert m.late_ul_requests >= 1 and m.late_prach_requests == 1


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_ru_late_cplane_counted_on_its_own_plane():
    """A UL-grant / PRACH C-plane whose window closed is dropped, counted
    on ITS plane's late counter (not late_dl), its pending context is
    removed immediately (no double count at eviction), and the error
    notifier fires for the right plane (review r4 finding)."""
    col, err = Collector(), Errors()
    cfg = RuOfhConfig(scs=SCS, nof_prb=12)
    ru = RuOfh(cfg, col, send_frame=lambda f: None, error_notifier=err)
    slot = SlotPoint.from_sfn_slot(SCS, 2, 0)
    ru.ota_tick(slot)
    # Same-slot requests: the C-plane needs >= 4 symbols of advance.
    ru.handle_new_uplink_slot(ResourceGridContext(slot=slot))
    ru.handle_prach_occasion(PrachBufferContext(slot=slot, format="B4"))
    m = ru.get_metrics()
    assert m.late_ul_requests == 1 and m.late_prach_requests == 1
    assert m.late_dl_requests == 0
    assert not ru._ul_pending and not ru._prach_pending
    assert err.ul == [slot] and err.prach == [slot]
    # OTA progress adds no second count for the same slots.
    ru.ota_tick(slot + 3)
    m2 = ru.get_metrics()
    assert m2.late_ul_requests == 1 and m2.late_prach_requests == 1


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_ru_paced_dl_transmitter():
    """Paced DL (reference OTA symbol dispatcher): U-plane frames leave
    only when the OTA clock enters each symbol's T1a window, in symbol
    order; frames whose window closed un-sent are dropped and counted."""
    col = Collector()
    cfg = RuOfhConfig(scs=SCS, nof_prb=12, dl_pacing="paced",
                      tx_window_t1a_max_symbols=6, tx_window_t1a_min_symbols=2)
    sent = []
    ru = RuOfh(cfg, col, send_frame=sent.append)
    slot = SlotPoint.from_sfn_slot(SCS, 1, 4)
    prev = SlotPoint.from_sfn_slot(SCS, 1, 3)
    ru.ota_tick(prev)  # OTA one slot before the data's slot
    grid = np.full((1, 14, 144), 0.1 + 0.05j, np.complex64)
    ru.handle_dl_data(ResourceGridContext(slot=slot), grid)
    # C-plane goes out immediately; no U-plane yet (windows open later).
    uplane_sent = [f for f in sent if f[1] == 0x00]
    assert len(sent) == 1 and not uplane_sent
    # Tick symbol-by-symbol through the previous slot: each tick opens the
    # windows for symbols within [now+2, now+6].
    for s in range(14):
        ru.ota_tick(prev, symbol=s)
    uplane_sent = [f for f in sent if f[1] == 0x00]
    # At OTA (prev, 13) = abs symbol 13 of that slot, windows open for data
    # symbols <= 13 + 6 - 14 = 5 of the data slot (abs sym+14).
    assert 0 < len(uplane_sent) < 14
    # Frames appear in symbol order.
    import srsran_project_tpu.support.native as nat
    syms = [nat.ofh_uplane_parse(np.asarray(f, np.uint8))[0]["symbol_id"]
            for f in uplane_sent]
    assert syms == sorted(syms)
    # Remaining symbols flush as the OTA clock crosses the data slot.
    for s in range(14):
        ru.ota_tick(slot, symbol=s)
    uplane_sent = [f for f in sent if f[1] == 0x00]
    assert 0 < len(uplane_sent) <= 14
    # Symbols whose min-advance deadline passed were dropped + counted.
    dropped = 14 - len(uplane_sent)
    assert ru.get_metrics().late_dl_requests == dropped


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_ru_paced_dl_whole_slot_late():
    """DL data arriving after its slot's entire T1a window closed is
    rejected outright (late_dl_requests + error notifier)."""
    class Errs:
        def __init__(self):
            self.dl = []
        def on_late_downlink_message(self, slot, sector):
            self.dl.append(slot)
        def on_late_uplink_message(self, slot, sector):
            pass
        def on_late_prach_message(self, slot, sector):
            pass

    col = Collector()
    errs = Errs()
    cfg = RuOfhConfig(scs=SCS, nof_prb=12, dl_pacing="paced")
    sent = []
    ru = RuOfh(cfg, col, send_frame=sent.append, error_notifier=errs)
    slot = SlotPoint.from_sfn_slot(SCS, 0, 1)
    ru.ota_tick(slot + 3)  # OTA far past the data slot
    ru.handle_dl_data(ResourceGridContext(slot=slot),
                      np.zeros((1, 14, 144), np.complex64))
    assert not sent
    assert ru.get_metrics().late_dl_requests == 1
    assert errs.dl == [slot]


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_ru_paced_emulator_roundtrip_decodes():
    """Full paced round trip: a DU-side RuOfh with the symbol-paced DL
    transmitter streams a slot toward an RU emulator (loopback), the
    frames come back as UL within the reception window, and the
    reassembled grid matches the transmitted one (BFP tolerance) — the
    T1a dispatcher, rx-window checker and U-plane serdes exercised
    together in time order."""
    col = Collector()
    cfg = RuOfhConfig(scs=SCS, nof_prb=12, dl_pacing="paced",
                      tx_window_t1a_max_symbols=28,
                      tx_window_t1a_min_symbols=0)
    wire = []
    ru = RuOfh(cfg, col, send_frame=wire.append)
    slot = SlotPoint.from_sfn_slot(SCS, 5, 6)
    prev = slot + (-1)
    rng = np.random.default_rng(4)
    grid = (rng.standard_normal((1, 14, 144))
            + 1j * rng.standard_normal((1, 14, 144))).astype(np.complex64) * 0.1

    ru.ota_tick(prev, symbol=0)
    ru.handle_new_uplink_slot(ResourceGridContext(slot=slot))
    ru.handle_dl_data(ResourceGridContext(slot=slot), grid)
    # Drive the OTA clock through the previous and the data slot, feeding
    # every dispatched U-plane frame straight back as the RU's uplink.
    for s in range(14):
        ru.ota_tick(prev, symbol=s)
        while wire:
            f = wire.pop(0)
            if f[1] == 0x00:
                ru.push_uplane_frame(f)
    for s in range(14):
        ru.ota_tick(slot, symbol=s)
        while wire:
            f = wire.pop(0)
            if f[1] == 0x00:
                ru.push_uplane_frame(f)
    assert len(col.symbols) == 14
    got = np.asarray(col.symbols[0][1])
    assert np.allclose(got, grid, atol=2e-2)
    assert ru.get_metrics().late_dl_requests == 0


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_paced_soak_sustained_slot_rate():
    """RU-emulator soak at sustained slot rate with pacing ON BY DEFAULT:
    100 slots of DL data + UL requests arriving one slot ahead of air
    time, the OTA clock ticking every symbol, every emitted U-plane frame
    looped back as the RU's uplink answer.  All C-plane (DL, UL-grant)
    and U-plane messages dispatch inside their T1a windows: zero late
    frames, zero evictions, every slot's UL grid completes."""
    col, err = Collector(), Errors()
    cfg = RuOfhConfig(scs=SCS, nof_prb=12, nof_ports=2,
                      dl_eaxc=(0, 1), ul_eaxc=(4, 5), prach_eaxc=8)
    assert cfg.dl_pacing == "paced"  # pacing is the default OFH profile
    wire = []
    ru = RuOfh(cfg, col, send_frame=wire.append, error_notifier=err)
    rng = np.random.default_rng(4)
    n_slots = 100
    base = SlotPoint.from_sfn_slot(SCS, 1, 0)
    grids = {}
    ru.ota_tick(base)
    n_cplane = 0
    for s in range(n_slots + 1):
        slot = base + s
        if s < n_slots:
            air = slot + 1
            grid = (rng.standard_normal((2, 14, 144))
                    + 1j * rng.standard_normal((2, 14, 144))
                    ).astype(np.complex64) * 0.1
            grids[air.count] = grid
            ru.handle_new_uplink_slot(ResourceGridContext(slot=air))
            ru.handle_dl_data(ResourceGridContext(slot=air), grid)
        for sym in range(14):
            ru.ota_tick(slot, sym)
            while wire:
                f = wire.pop(0)
                if f[1] == 0x00:  # U-plane: loop back as the RU's uplink.
                    # Retag the DL eAxC onto the UL port map (an RU would
                    # capture on its own antennas; the test reuses the DL
                    # payload bytes with the UL eAxC in the header).
                    f = np.array(f)
                    # pc_id is big-endian at bytes 4-5 (values < 256).
                    if f[5] in cfg.dl_eaxc:
                        f[5] = cfg.ul_eaxc[list(cfg.dl_eaxc).index(f[5])]
                    ru.push_uplane_frame(f)
                else:
                    n_cplane += 1
    m = ru.get_metrics()
    assert m.late_dl_requests == 0, m.late_dl_requests
    assert m.late_ul_requests == 0 and m.late_ul_frames == 0
    assert m.total_dl_requests == n_slots
    # Every slot's 14 symbols notified on both ports' completion.
    assert len(col.symbols) == 14 * n_slots, len(col.symbols)
    # DL + UL C-plane per port per slot paced out in their windows.
    assert n_cplane == n_slots * 4, n_cplane
    # Spot-check payload integrity through BFP + the wire.
    ctx, got, valid = col.symbols[-1]
    assert valid
    assert np.allclose(np.asarray(got), grids[ctx.slot.count], atol=2e-2)


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_multi_sector_routes_and_aggregates():
    """RuOfhMultiSector (reference ru_ofh_impl's sector vector): DL/UL
    requests route on context.sector, each sector frames on its own
    Ethernet flow with its own eAxC map, ingress completes per sector,
    metrics aggregate."""
    from srsran_project_tpu.ru import RuOfhMultiSector, create_ru

    col = Collector()
    cfgs = [RuOfhConfig(scs=SCS, nof_prb=12, nof_ports=1, dl_pacing="sync",
                        dl_eaxc=(s * 2,), ul_eaxc=(s * 2,))
            for s in range(2)]
    wires = [[], []]
    ru = create_ru("ofh", cfgs, col,
                   send_frames=[wires[0].append, wires[1].append])
    assert isinstance(ru, RuOfhMultiSector)
    slot = SlotPoint.from_sfn_slot(SCS, 4, 2)
    ru.ota_tick(slot)
    rng = np.random.default_rng(2)
    grids = []
    for s in range(2):
        g = (rng.standard_normal((1, 14, 144))
             + 1j * rng.standard_normal((1, 14, 144))).astype(np.complex64) * 0.1
        grids.append(g)
        ru.handle_new_uplink_slot(ResourceGridContext(slot=slot, sector=s))
        ru.handle_dl_data(ResourceGridContext(slot=slot, sector=s), g)
    # Each sector's flow carries its own C-planes + 14 U-planes.
    assert len(wires[0]) == 16 and len(wires[1]) == 16
    # Sector 1's U-plane frames carry its mapped eAxC (2).
    up1 = [f for f in wires[1] if f[1] == 0x00]
    assert all(f[5] == 2 for f in up1)
    # Loop each sector's U-plane back into ITS receiver.
    for s in range(2):
        for f in wires[s]:
            if f[1] == 0x00:
                ru.push_uplane_frame(s, f)
    assert len(col.symbols) == 28  # 14 symbols x 2 sectors
    m = ru.get_metrics()
    assert m.total_dl_requests == 2 and m.total_ul_requests == 2


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ofh_ru_wide_carrier_sections_roundtrip():
    """Carriers beyond the eCPRI 255-PRB single-section limit (273 PRB
    flagship) frame as multiple sections per symbol at startPrbu offsets
    and reassemble through the RE-count fill accounting (review r4)."""
    col = Collector()
    cfg = RuOfhConfig(scs=SCS, nof_prb=273, nof_ports=1, dl_pacing="sync")
    frames = []
    ru = RuOfh(cfg, col, send_frame=frames.append)
    slot = SlotPoint.from_sfn_slot(SCS, 5, 1)
    rng = np.random.default_rng(6)
    grid = (rng.standard_normal((1, 14, 273 * 12))
            + 1j * rng.standard_normal((1, 14, 273 * 12))
            ).astype(np.complex64) * 0.1
    ru.ota_tick(slot)
    ru.handle_new_uplink_slot(ResourceGridContext(slot=slot))
    ru.handle_dl_data(ResourceGridContext(slot=slot), grid)
    uplane = [f for f in frames if f[1] == 0x00]
    assert len(uplane) == 14 * 2  # two sections per symbol (255 + 18 PRB)
    for f in uplane:
        ru.push_uplane_frame(f)
    assert len(col.symbols) == 14
    assert np.allclose(np.asarray(col.symbols[0][1]), grid, atol=2e-2)
