"""srslog-counterpart tests: channels, levels, async backend, sinks."""

import io
import json

from srsran_project_tpu.support import logger as slog


def _mk(level="info"):
    be = slog.Backend()
    buf = io.StringIO()
    be.add_sink(slog.JsonSink(buf))
    ch = slog.LogChannel("PHY", backend=be, level=level)
    return ch, be, buf


def test_lazy_format_and_flush():
    ch, be, buf = _mk()
    ch.info("slot %d: %s", 42, "ok")
    be.flush()
    rec = json.loads(buf.getvalue().strip())
    assert rec["channel"] == "PHY"
    assert rec["level"] == "info"
    assert rec["msg"] == "slot 42: ok"


def test_level_filtering():
    ch, be, buf = _mk(level="warning")
    ch.debug("hidden %d", 1)
    ch.info("hidden too")
    ch.error("visible")
    be.flush()
    lines = [l for l in buf.getvalue().splitlines() if l]
    assert len(lines) == 1
    assert json.loads(lines[0])["msg"] == "visible"


def test_context_fields():
    ch, be, buf = _mk()
    ch.context = {"cell": 1}
    ch.info("crc", rnti=0x4601)
    be.flush()
    rec = json.loads(buf.getvalue().strip())
    assert rec["cell"] == 1 and rec["rnti"] == 0x4601


def test_ordering_preserved():
    ch, be, buf = _mk()
    for i in range(100):
        ch.info("m%d", i)
    be.flush()
    msgs = [json.loads(l)["msg"] for l in buf.getvalue().splitlines()]
    assert msgs == [f"m{i}" for i in range(100)]


def test_text_sink_format():
    be = slog.Backend()
    buf = io.StringIO()
    be.add_sink(slog.StreamSink(buf))
    ch = slog.LogChannel("MAC", backend=be, level="debug")
    ch.debug("hello")
    be.flush()
    line = buf.getvalue()
    assert "[MAC" in line and "[D]" in line and "hello" in line


def test_hex_dump():
    s = slog.hex_dump(bytes(range(4)))
    assert s == "00 01 02 03"
    s = slog.hex_dump(bytes(100), max_bytes=8)
    assert s.endswith("(100 bytes)")


def test_fetch_channel_registry():
    a = slog.fetch_channel("TEST-CH")
    b = slog.fetch_channel("TEST-CH")
    assert a is b
    a.set_level("debug")
    assert b.level == "debug"


def test_bad_format_does_not_raise():
    ch, be, buf = _mk()
    ch.info("%d", "not-an-int")  # mismatched args must not kill the backend
    ch.info("after")
    be.flush()
    msgs = [json.loads(l)["msg"] for l in buf.getvalue().splitlines()]
    assert msgs[-1] == "after"
