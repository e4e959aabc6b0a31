"""Multi-host (DCN) scale-out: jax.distributed wiring + host-aware meshes.

Counterpart of the reference's multi-node story (SURVEY.md section 5.8):
the reference's inter-process links are protocol transports (SCTP/eCPRI);
its compute never crosses hosts.  Here the N-host axis is a first-class
data-parallel dimension: each host serves a set of cells (carriers), the
global mesh is (host, dp, tp), intra-host collectives ride ICI and
cross-host collectives ride DCN.  Design rules:

- cells/slots shard over ("host", "dp") — no cross-host traffic in the
  steady state (a cell's slot program is host-local);
- cross-host collectives appear only for control aggregation (metrics
  psums, KPM rollups) and coordinated multi-cell features (future rounds:
  coordinated scheduling), so DCN latency never sits on the slot-deadline
  path.

initialize() wraps jax.distributed.initialize for real deployments
(one process per host).  For tests and single-host development,
host_mesh() also accepts a virtual host count, partitioning the visible
devices into "hosts" — the same program, shardings and collectives
compile either way (the mesh axes are identical), which is what lets the
CI validate the multi-host path without a pod.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed bring-up (one call per host process).

    No-op when single-process (num_processes in (None, 1)) so simulators and
    tests can share the code path.
    """
    if not num_processes or num_processes == 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes, process_id=process_id)


def host_mesh(nof_hosts: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """A (host, dp, tp) mesh.

    Real multi-host: pass nothing — jax.devices() spans all processes and
    the host axis follows the process boundary (len(devices) //
    local_device_count hosts), so "host"-axis collectives map to DCN.
    Virtual (tests): pass nof_hosts to split the local devices into that
    many host groups; same axes, ICI instead of DCN.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if nof_hosts is None:
        local = jax.local_device_count()
        nof_hosts = max(1, len(devices) // local)
    per_host = len(devices) // nof_hosts
    assert per_host >= 1 and per_host % tp == 0, (len(devices), nof_hosts, tp)
    arr = np.asarray(devices[: nof_hosts * per_host]).reshape(nof_hosts, per_host // tp, tp)
    return Mesh(arr, ("host", "dp", "tp"))


def global_batch(mesh: Mesh, local_batch, spec: P | None = None):
    """Assemble a global sharded array from each process's local batch rows.

    This is the DCN data-plane input path: each host contributes the
    cells/slots it received from its own fronthaul, and the result is one
    global (cells, ...) array laid out host-locally (no cross-host transfer
    happens — each process's rows land on its own devices).  Single-process
    (tests, virtual hosts) it degrades to a plain device_put.
    """
    if spec is None:
        spec = P(("host", "dp"))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(local_batch), sharding)
    global_shape = (local_batch.shape[0] * jax.process_count(),) + tuple(
        local_batch.shape[1:]
    )
    return jax.make_array_from_process_local_data(sharding, local_batch, global_shape)


def cell_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (cells, ...) batch over (host, dp): each host owns whole
    cells; no cross-host data-plane traffic."""
    return NamedSharding(mesh, P(("host", "dp")))


def cell_port_sharding(mesh: Mesh) -> NamedSharding:
    """(cells, ports, ...) arrays: cells over (host, dp), ports over tp."""
    return NamedSharding(mesh, P(("host", "dp"), "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def metrics_allreduce(mesh: Mesh):
    """A jitted cross-host metrics rollup: psum over every mesh axis —
    the KPM/metric aggregation path that IS allowed to cross DCN."""
    import functools

    from jax import shard_map

    @functools.partial(jax.jit, out_shardings=replicated(mesh))
    @functools.partial(shard_map, mesh=mesh, in_specs=P(("host", "dp")),
                       out_specs=P())
    def rollup(x):
        return jax.lax.psum(jax.lax.psum(x, "dp"), "host").sum(axis=0, keepdims=True)

    return rollup
