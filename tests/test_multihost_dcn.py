"""REAL multi-host (DCN) run: two OS processes, jax.distributed over
loopback, one global mesh with the host axis on the process boundary.

This is the multi-host counterpart of test_multihost.py's virtual-host
checks: collectives on the "host" axis here cross an actual process/gRPC
boundary (what DCN is in a pod deployment), validating
multihost.initialize + host_mesh real mode + cross-host psum + the
codeblock-dp LDPC decode spanning hosts.  (SURVEY.md §5.8.)
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "dcn_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dcn_run():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:\n{out}\nstderr:\n{err[-3000:]}"
        assert "DCN-OK" in out, out
