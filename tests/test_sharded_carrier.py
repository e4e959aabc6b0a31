"""Sequence-parallel (subcarrier-sharded) wide-carrier PUSCH front end:
the 8-device mesh splits a 264-PRB carrier into 33-PRB shards; halo
exchange covers the RC smoothing filter + boundary interpolation, and the
result must match the unsharded processor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsran_project_tpu.ops.modulation import Modulation
from srsran_project_tpu.parallel import sharded_carrier
from srsran_project_tpu.phy import pusch as pusch_mod
from srsran_project_tpu.phy.allocation import Allocation
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def wide_cfg():
    nof_rb = 264  # 3168 subcarriers: a 100 MHz @ 15 kHz / 400 MHz-class width
    return pusch_mod.PuschConfig(
        tbs=8192,
        target_code_rate=0.4,
        modulation=Modulation.QAM16,
        alloc=Allocation(rb_start=0, rb_count=nof_rb, sym_start=1, sym_count=13,
                         dmrs_symbols=(2,)),
        nof_layers=2,
        nof_rx_ports=2,
        nof_grid_symbols=14,
        nof_grid_sc=nof_rb * 12,
        # the sharded front end implements the pair-residual noise method;
        # keep strict nv parity against the same method here
        noise_method="pair_residual",
    )


@pytest.fixture(scope="module")
def sp_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(jax.devices()[:8]), ("sp",))


def _rx_grid(cfg, seed=0, snr_db=22.0):
    rng = np.random.default_rng(seed)
    tb = jnp.asarray(rng.integers(0, 2, size=(cfg.tbs,), dtype=np.uint8))
    grid = pusch_mod.transmit(tb, jnp.uint32(0x4601), cfg)
    nvar = 10 ** (-snr_db / 10)
    noise = (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape))
    grid = grid + jnp.asarray((noise * np.sqrt(nvar / 2)).astype(np.complex64))
    return tb, grid


def test_sharded_front_end_matches_unsharded(wide_cfg, sp_mesh):
    tb, grid = _rx_grid(wide_cfg)
    gs = jax.device_put(grid, NamedSharding(sp_mesh, P(None, None, "sp")))

    llr_sh, nv_sh, snr_sh = sharded_carrier.sharded_front_end(gs, wide_cfg, sp_mesh)
    from srsran_project_tpu.ops import scrambling
    llr_sh = scrambling.descramble_llrs(
        llr_sh, pusch_mod._pusch_c_init(jnp.uint32(0x4601), wide_cfg.n_id))

    llr_ref, nv_ref, _snr = pusch_mod._front_end(grid, jnp.uint32(0x4601), wide_cfg)

    a = np.asarray(llr_sh, np.int32)
    b = np.asarray(llr_ref, np.int32)
    assert a.shape == b.shape
    # Bit-identical layout; float-order differences may flip quantization by
    # one LSB on a tiny fraction of LLRs.
    diff = np.abs(a - b)
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 1e-3, (diff > 0).mean()
    np.testing.assert_allclose(float(nv_sh), float(nv_ref), rtol=0.05)


def test_sharded_decode_end_to_end(wide_cfg, sp_mesh):
    tb, grid = _rx_grid(wide_cfg, seed=1)
    gs = jax.device_put(grid, NamedSharding(sp_mesh, P(None, None, "sp")))
    out = sharded_carrier.sharded_decode(gs, 0x4601, wide_cfg, sp_mesh)
    assert bool(np.asarray(out["tb_crc_ok"]))
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), np.asarray(tb))


def test_sharded_decode_with_sharded_ldpc(wide_cfg, sp_mesh):
    """Front end sharded by subcarriers, LDPC resharded by codeblocks over
    the SAME devices (the full sp + cb-dp composition)."""
    tb, grid = _rx_grid(wide_cfg, seed=2)
    gs = jax.device_put(grid, NamedSharding(sp_mesh, P(None, None, "sp")))
    out = sharded_carrier.sharded_decode(gs, 0x4601, wide_cfg, sp_mesh,
                                         sharded_ldpc=True)
    assert bool(np.asarray(out["tb_crc_ok"]))
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), np.asarray(tb))


def test_shard_geometry_rejected(wide_cfg, sp_mesh):
    bad = pusch_mod.PuschConfig(
        tbs=wide_cfg.tbs, target_code_rate=0.4, modulation=Modulation.QAM16,
        alloc=Allocation(rb_start=2, rb_count=100, sym_start=1, sym_count=13,
                         dmrs_symbols=(2,)),
        nof_layers=2, nof_rx_ports=2, nof_grid_symbols=14, nof_grid_sc=3168)
    with pytest.raises(AssertionError):
        sharded_carrier._check_shardable(bad, 8)


@pytest.fixture(scope="module")
def padded_cfg():
    """39 PRB on 8 shards: pads to 40 PRB (5 PRB/shard), exercising the
    flagship's 273-on-8 pad-to-shardable + mask machinery at test size."""
    nof_rb = 39
    return pusch_mod.PuschConfig(
        tbs=4096,
        target_code_rate=0.4,
        modulation=Modulation.QAM16,
        alloc=Allocation(rb_start=0, rb_count=nof_rb, sym_start=1, sym_count=13,
                         dmrs_symbols=(2,)),
        nof_layers=2,
        nof_rx_ports=2,
        nof_grid_symbols=14,
        nof_grid_sc=nof_rb * 12,
    )


def test_padded_front_end_matches_unsharded(padded_cfg, sp_mesh):
    """Non-divisible carrier: the padded+masked sharded front end matches
    the unsharded processor (LLR layout bit-identical, nv/snr unbiased)."""
    cfg = padded_cfg
    assert sharded_carrier.padded_width(cfg, 8) == 40 * 12
    tb, grid = _rx_grid(cfg, seed=3)
    llr_sh, nv_sh, snr_sh = sharded_carrier.sharded_front_end(grid, cfg, sp_mesh)
    from srsran_project_tpu.ops import scrambling
    llr_sh = scrambling.descramble_llrs(
        llr_sh, pusch_mod._pusch_c_init(jnp.uint32(0x4601), cfg.n_id))
    llr_ref, nv_ref, snr_ref = pusch_mod._front_end(
        grid, jnp.uint32(0x4601), cfg)
    a = np.asarray(llr_sh, np.int32)
    b = np.asarray(llr_ref, np.int32)
    assert a.shape == b.shape
    diff = np.abs(a - b)
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 2e-3, (diff > 0).mean()
    np.testing.assert_allclose(float(nv_sh), float(nv_ref), rtol=0.10)
    np.testing.assert_allclose(float(snr_sh), float(snr_ref), rtol=0.10)


def test_padded_decode_end_to_end(padded_cfg, sp_mesh):
    tb, grid = _rx_grid(padded_cfg, seed=4)
    out = sharded_carrier.sharded_decode(grid, 0x4601, padded_cfg, sp_mesh)
    assert bool(np.asarray(out["tb_crc_ok"]))
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), np.asarray(tb))


def test_windowed_general_allocation(sp_mesh):
    """A partial-band allocation (rb_start=7, 30 PRB inside a 52-PRB
    carrier) decodes through the windowed sharded path: the window slice +
    crb re-homing + pad-to-shardable cover the general-allocation space."""
    import dataclasses

    grid_prbs = 52
    cfg = pusch_mod.PuschConfig(
        tbs=4096, target_code_rate=0.4, modulation=Modulation.QAM16,
        alloc=Allocation(rb_start=7, rb_count=30, sym_start=1, sym_count=13,
                         dmrs_symbols=(2,)),
        nof_layers=2, nof_rx_ports=2, nof_grid_symbols=14,
        nof_grid_sc=grid_prbs * 12)
    rng = np.random.default_rng(5)
    tb = jnp.asarray(rng.integers(0, 2, size=(cfg.tbs,), dtype=np.uint8))
    sub = pusch_mod.transmit(tb, jnp.uint32(0x4601), cfg)  # window-size grid?
    # transmit builds the FULL grid for this cfg (alloc inside nof_grid_sc).
    grid = np.asarray(sub)
    assert grid.shape[-1] == grid_prbs * 12
    nvar = 10 ** (-22.0 / 10)
    noise = (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape))
    grid = jnp.asarray((grid + noise * np.sqrt(nvar / 2)).astype(np.complex64))

    out = sharded_carrier.sharded_decode_windowed(grid, 0x4601, cfg, sp_mesh)
    assert bool(np.asarray(out["tb_crc_ok"]))
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), np.asarray(tb))
    # Metric parity with the unsharded per-PDU chain on the same grid.
    ref = pusch_mod.process(grid, jnp.uint32(0x4601), cfg)
    assert bool(np.asarray(ref["tb_crc_ok"]))
    np.testing.assert_allclose(float(out["noise_var"]),
                               float(ref["noise_var"]), rtol=0.15)
