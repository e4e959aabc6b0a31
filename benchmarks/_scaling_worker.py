"""Worker for benchmarks/multihost_scaling.py — see that file's header."""

import json
import os
import sys
import time

pid = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = int(sys.argv[3])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from srsran_project_tpu.parallel import multihost  # noqa: E402

multihost.initialize(f"localhost:{port}", num_processes=nprocs, process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from srsran_project_tpu.ops.ldpc import encoder, graphs  # noqa: E402
from srsran_project_tpu.parallel import sharded_decode  # noqa: E402

mesh = multihost.host_mesh()
bg, z = 1, 384
g = graphs.get_graph(bg, z)
c_global = 144  # ~one 100 MHz slot of codeblocks, divisible by 8 devices
rng = np.random.default_rng(7)
msg = jnp.asarray(rng.integers(0, 2, size=(c_global, g.kb * z), dtype=np.uint8))
cw = np.asarray(encoder.encode(msg, bg, z))
llr_global = np.where(cw[:, 2 * z:] == 0, 12.0, -12.0).astype(np.float32)
rows = c_global // nprocs
llrs = multihost.global_batch(mesh, llr_global[pid * rows: (pid + 1) * rows],
                              P(("host", "dp"), None))


def step():
    bits, bad = sharded_decode.decode_codeblocks_sharded(
        llrs, bg, z, mesh, nof_iterations=6, axis=("host", "dp"))
    return bad  # replicated scalar: blocking on it syncs every process


jax.block_until_ready(step())
n = 8
t0 = time.perf_counter()
for _ in range(n):
    jax.block_until_ready(step())
t_step = (time.perf_counter() - t0) / n

# Cross-host collective alone at the step's own accounting shape.
rollup = multihost.metrics_allreduce(mesh)
x = multihost.global_batch(mesh, np.ones((4, 1), np.float32))
jax.block_until_ready(rollup(x))
t0 = time.perf_counter()
for _ in range(n):
    jax.block_until_ready(rollup(x))
t_comm = (time.perf_counter() - t0) / n

eff = max(0.0, 1.0 - t_comm / t_step)
if pid == 0:
    print("RESULT " + json.dumps({
        "metric": "multihost_cb_decode_dcn_overhead",
        "t_step_ms": round(t_step * 1e3, 3),
        "t_cross_host_collective_ms": round(t_comm * 1e3, 3),
        "projected_2host_efficiency": round(eff, 4),
        "mesh": "host=2 x dp=4 (two OS processes, loopback DCN)",
        "codeblocks": c_global, "bg": bg, "z": z,
    }), flush=True)
