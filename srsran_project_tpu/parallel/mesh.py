"""Device meshes and shardings for the RAN slot programs.

The reference parallelizes with host threads (SURVEY.md §2.7); here the axes
are a jax.sharding.Mesh:
  dp — data parallel over slots/UEs/cells (batch axis)
  tp — "tensor" parallel over antenna ports/layers
(sp over subcarrier/PRB shards and pp over pipeline stages are added as the
framework widens.)  XLA inserts the ICI collectives implied by the sharding
annotations — there is no hand-written communication here.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(nof_devices: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """A (dp, tp) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    if nof_devices is None:
        nof_devices = len(devices)
    devices = np.asarray(devices[:nof_devices])
    assert nof_devices % tp == 0
    return Mesh(devices.reshape(nof_devices // tp, tp), ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over dp, replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def port_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, ports, ...) arrays: batch over dp, ports over tp."""
    return NamedSharding(mesh, P("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
