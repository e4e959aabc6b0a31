"""Disaggregated control plane over real UDP links: the CU-CP in one
"node" and the DU agent in another, attach running across sockets
(the apps/cu + apps/du split, SURVEY 3.1 process boundaries)."""

from srsran_project_tpu.l2 import security
from srsran_project_tpu.l3 import messages as m
from srsran_project_tpu.l3.cu_cp_sim import AmfSim, CuCpSim, CuUpE1Agent, DuF1Sim
from srsran_project_tpu.l3.transport import UdpLink

from test_l3_attach import FakeCuUp, UeRrcAgent


def test_udp_link_roundtrip_and_loss_counter():
    a = UdpLink(("127.0.0.1", 0))
    b = UdpLink(("127.0.0.1", 0), remote=("127.0.0.1", a.local_port))
    a.remote = ("127.0.0.1", b.local_port)
    got = []
    b.rx_handler = got.append
    a.send(b"hello")
    a.send(b"world")
    assert b.poll() == 2 and got == [b"hello", b"world"]
    assert b.lost == 0


def test_attach_over_udp_f1():
    """F1AP rides a real UDP socket pair between the CU-CP and the DU."""
    cu_link = UdpLink(("127.0.0.1", 0))
    du_link = UdpLink(("127.0.0.1", 0), remote=("127.0.0.1", cu_link.local_port))
    cu_link.remote = ("127.0.0.1", du_link.local_port)

    amf = AmfSim()
    cucp = CuCpSim(send_to_amf=lambda b: amf.rx(b),
                   send_to_du=cu_link.send,
                   send_to_cuup=lambda b: e1.rx(b))
    amf.send = cucp.rx_from_amf
    e1 = CuUpE1Agent(send_to_cucp=cucp.rx_from_cuup,
                     make_cu_up=lambda uid, keys, nea, nia: FakeCuUp(uid, keys, nea, nia))
    du = DuF1Sim(send_to_cucp=du_link.send)
    cu_link.rx_handler = cucp.rx_from_du
    du_link.rx_handler = du.rx

    def pump():
        # both directions until quiescent (the io_broker epoll role)
        while cu_link.poll() + du_link.poll():
            pass

    cucp.start()
    du.setup(cells=[{"pci": 1, "nr_cgi": "x", "dl_arfcn": 1, "bandwidth_rb": 52}])
    pump()
    assert du.f1_ready and cucp.f1_cells

    ue = UeRrcAgent(du, c_rnti=0x4601,
                    k_gnb_provider=lambda: security.kdf(amf.k_amf, 0x6E, (1).to_bytes(4, "big")))
    ue.connect()
    for _ in range(30):
        pump()
        if ue.state == "connected":
            break
    assert ue.state == "connected"
    assert cucp.ues[1].state == "connected"
    assert amf.sessions_done == [1]
    cu_link.close()
    du_link.close()


def test_cu_du_split_as_separate_processes():
    """apps/cu_sim and apps/du_sim attach a UE across two real processes."""
    import os
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = 38900
    cu = subprocess.Popen([_sys.executable, os.path.join(repo, "apps", "cu_sim.py"),
                           "--f1-port", str(port), "--expect-ues", "1",
                           "--timeout", "40"],
                          stdout=subprocess.PIPE, text=True, cwd=repo)
    try:
        import time as _t
        _t.sleep(1.0)
        du = subprocess.run([_sys.executable, os.path.join(repo, "apps", "du_sim.py"),
                             "--cu-port", str(port), "--ues", "1", "--timeout", "30"],
                            capture_output=True, text=True, timeout=60, cwd=repo)
        assert du.returncode == 0, du.stdout + du.stderr
        import json as _json
        du_out = _json.loads(du.stdout.splitlines()[-1])
        assert du_out["ok"] and du_out["ues"][0]["state"] == "connected"
        assert du_out["ues"][0]["drbs"][0]["drb_id"] == 1
        cu_out, _ = cu.communicate(timeout=30)
        stats = _json.loads(cu_out.splitlines()[-1])
        assert stats["ok"] and stats["connected_ues"] == [1]
    finally:
        if cu.poll() is None:
            cu.kill()
