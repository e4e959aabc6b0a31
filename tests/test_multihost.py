"""Multi-host (DCN) mesh scaffolding on the virtual 8-device CPU mesh:
(host, dp, tp) axes, cell sharding locality, cross-host metric rollups."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from srsran_project_tpu.parallel import multihost


@pytest.fixture
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return multihost.host_mesh(nof_hosts=2, tp=2)


def test_host_mesh_shape(mesh):
    assert mesh.axis_names == ("host", "dp", "tp")
    assert mesh.devices.shape == (2, 2, 2)


def test_initialize_single_process_noop():
    multihost.initialize(num_processes=1)  # must not raise or hang
    multihost.initialize()


def test_cell_sharding_is_host_local(mesh):
    """Cells shard over (host, dp); each device owns whole cells."""
    cells = jnp.arange(8 * 64, dtype=jnp.float32).reshape(8, 64)
    sharded = jax.device_put(cells, multihost.cell_sharding(mesh))
    # every shard holds contiguous whole-cell rows
    for s in sharded.addressable_shards:
        assert s.data.shape[0] == 2  # 8 cells / (2 hosts x 2 dp)
    # a per-cell (host-local) computation introduces no cross-host collectives:
    # jit it with sharded in/out and check the compiled HLO has no all-reduce
    f = jax.jit(lambda x: jnp.tanh(x) * 2.0,
                in_shardings=multihost.cell_sharding(mesh),
                out_shardings=multihost.cell_sharding(mesh))
    hlo = f.lower(cells).compile().as_text()
    assert "all-reduce" not in hlo and "all-gather" not in hlo
    np.testing.assert_allclose(np.asarray(f(sharded)), np.tanh(cells) * 2.0, rtol=1e-6)


def test_cell_port_sharding(mesh):
    x = jnp.ones((8, 2, 16))
    sharded = jax.device_put(x, multihost.cell_port_sharding(mesh))
    for s in sharded.addressable_shards:
        assert s.data.shape == (2, 1, 16)  # cells/4, ports/2


def test_metrics_allreduce_crosses_hosts(mesh):
    x = jnp.arange(8.0).reshape(8, 1)  # one metric per cell
    rollup = multihost.metrics_allreduce(mesh)
    out = np.asarray(rollup(jax.device_put(x, multihost.cell_sharding(mesh))))
    assert out.shape == (1, 1) and out[0, 0] == x.sum()
