"""Multi-device sharding: halo-exchange smoothing vs single-device oracle;
mesh construction; dp/tp sharded slot step (the graft dryrun path)."""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from srsran_project_tpu.parallel import mesh as mesh_mod
from srsran_project_tpu.parallel import sharded_estimator as se


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_mod.make_mesh(8, tp=1)


def test_mesh_shapes():
    n = len(jax.devices())
    m = mesh_mod.make_mesh(n, tp=2 if n % 2 == 0 else 1)
    assert set(m.axis_names) == {"dp", "tp"}
    assert m.devices.size == n


def test_halo_smoothing_matches_reference(mesh8):
    rng = np.random.default_rng(0)
    n = 8 * 64
    h = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))).astype(np.complex64)
    want = np.asarray(se.smooth_freq_reference(h))
    hs = jax.device_put(h, NamedSharding(mesh8, P(None, "dp")))
    got = np.asarray(se.smooth_freq_sharded(hs, mesh8, "dp"))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    n = len(jax.devices())
    g.dryrun_multichip(min(n, 8))


def test_codeblock_sharded_decode(mesh8):
    from srsran_project_tpu.ops.ldpc import encoder, graphs
    from srsran_project_tpu.parallel import sharded_decode as sd

    bg, z = 2, 52
    g = graphs.get_graph(bg, z)
    rng = np.random.default_rng(0)
    # Messages carrying their own CRC24B so the psum failure count is real.
    from srsran_project_tpu.ops import crc as crc_mod

    payload = rng.integers(0, 2, size=(13, g.kb * z - 24), dtype=np.uint8)
    msg = np.asarray(crc_mod.crc_append(payload, "24B"))
    cw = np.asarray(encoder.encode(msg, bg, z))
    llr = np.where(cw[:, 2 * z:] == 0, 20.0, -20.0).astype(np.float32)
    x, c_orig = sd.shard_codeblocks(llr, mesh8)
    assert x.shape[0] == 16  # padded 13 -> 16
    bits, bad = sd.decode_codeblocks_sharded(x, bg, z, mesh8, nof_iterations=4)
    got = np.asarray(bits)[:c_orig]
    np.testing.assert_array_equal(got, msg)
    # Padded all-zero codeblocks decode to all-zero (CRC24B of zeros = 0),
    # so only genuinely corrupted codeblocks would count.
    assert int(np.asarray(bad)) == 0
