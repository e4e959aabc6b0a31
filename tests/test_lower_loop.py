"""Rx-timestamp-paced baseband loop (reference lower_phy_baseband_processor
semantics): TX never runs more than rx_to_tx_max_delay ahead of RX,
timestamps advance by whole buffers, and stop() is clean."""

import time

from srsran_project_tpu.phy.lower_loop import (BasebandLoop, BasebandLoopConfig,
                                               LoopbackGateway)


def test_loop_paces_tx_to_rx_timestamps():
    cfg = BasebandLoopConfig(srate_hz=1_920_000.0, buffer_size=1920,
                             rx_to_tx_max_delay=4 * 1920, tx_time_offset=16)
    gw = LoopbackGateway(cfg, nof_buffers=50, realtime=True)
    ul_ts, dl_calls = [], []

    loop = BasebandLoop(cfg, gw, gw,
                        ul_processor=lambda s, ts: ul_ts.append(ts),
                        dl_producer=lambda ts, n: dl_calls.append((ts, n)) or b"")
    loop.start()
    t0 = time.time()
    while not loop._stop.is_set() and time.time() - t0 < 10:
        time.sleep(0.01)
    loop.stop()

    assert loop.stats["rx_buffers"] == 50
    assert ul_ts == [i * 1920 for i in range(50)]
    # TX stamped with the offset, advancing by whole buffers.
    tx_ts = [t for t, _ in gw.tx_log]
    assert all(t % 1920 == 16 for t in tx_ts)
    assert all(b - a == 1920 for a, b in zip(tx_ts, tx_ts[1:]))
    # Pacing: the TX lead over the last-received timestamp stays bounded
    # (one extra buffer of slack covers the race between the two threads).
    assert loop.stats["max_tx_lead"] <= cfg.rx_to_tx_max_delay + cfg.buffer_size
    # Real-time throttling kept the loop from free-running: ~50 ms of
    # samples cannot have been produced far faster than wall time.
    assert loop.stats["tx_buffers"] >= 40


def test_loop_stop_is_clean_mid_stream():
    cfg = BasebandLoopConfig(srate_hz=1e6, buffer_size=1000,
                             rx_to_tx_max_delay=2000)
    gw = LoopbackGateway(cfg, nof_buffers=10_000, realtime=True)
    loop = BasebandLoop(cfg, gw, gw,
                        ul_processor=lambda s, ts: None,
                        dl_producer=lambda ts, n: b"")
    loop.start()
    time.sleep(0.05)
    loop.stop()
    assert not loop._rx_thread.is_alive() and not loop._tx_thread.is_alive()
