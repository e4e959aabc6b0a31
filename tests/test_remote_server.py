"""Remote control WebSocket server (reference remote_server.cpp)."""

import threading

from srsran_project_tpu.support.remote_server import RemoteServer, WsClient


def _mk(commands=None, on_quit=None):
    srv = RemoteServer("127.0.0.1", 0, commands=commands, on_quit=on_quit)
    srv.start()
    return srv


def test_unknown_and_malformed_commands():
    srv = _mk()
    try:
        cli = WsClient("127.0.0.1", srv.port)
        resp = cli.command("no_such_cmd")
        assert "error" in resp and resp["cmd"] == "no_such_cmd"
        assert "timestamp" in resp
        cli.sock.sendall(
            __import__("srsran_project_tpu.support.remote_server",
                       fromlist=["_encode_frame"])._encode_frame(
                b"{not json", mask=True))
        resp = cli.recv_json()
        assert "error" in resp
        cli.close()
    finally:
        srv.stop()


def test_custom_command_success_and_error():
    seen = {}

    def set_gain(msg):
        if "gain" not in msg:
            raise ValueError("missing gain field")
        seen["gain"] = msg["gain"]
        return {"applied": msg["gain"]}

    srv = _mk(commands={"tx_gain": set_gain})
    try:
        cli = WsClient("127.0.0.1", srv.port)
        resp = cli.command("tx_gain", gain=30.0)
        assert resp["cmd"] == "tx_gain" and resp["applied"] == 30.0
        assert seen["gain"] == 30.0
        resp = cli.command("tx_gain")
        assert resp["error"] == "missing gain field"
        cli.close()
    finally:
        srv.stop()


def test_metrics_subscribe_broadcast_unsubscribe():
    srv = _mk()
    try:
        sub = WsClient("127.0.0.1", srv.port)
        other = WsClient("127.0.0.1", srv.port)
        assert sub.command("metrics_subscribe")["cmd"] == "metrics_subscribe"
        srv.broadcast_metrics('{"m": 1}')
        assert sub.recv_json() == {"m": 1}
        # The unsubscribed client gets nothing: its next receive is the
        # response to its own command, not the broadcast.
        assert other.command("no_cmd")["cmd"] == "no_cmd"
        assert sub.command("metrics_unsubscribe")["cmd"] == "metrics_unsubscribe"
        srv.broadcast_metrics('{"m": 2}')
        assert sub.command("nop").get("cmd") == "nop"  # not the broadcast
        sub.close()
        other.close()
    finally:
        srv.stop()


def test_quit_invokes_callback():
    fired = threading.Event()
    srv = _mk(on_quit=fired.set)
    try:
        cli = WsClient("127.0.0.1", srv.port)
        resp = cli.command("quit")
        assert resp["cmd"] == "quit"
        assert fired.wait(timeout=2)
        cli.close()
    finally:
        srv.stop()
