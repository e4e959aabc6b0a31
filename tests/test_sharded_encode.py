"""Sharded PDSCH encode (DL direction of the multi-chip layer,
parallel/sharded_encode.py): codeblock-sharded bit chain + subcarrier-
sharded grid assembly must match the unsharded transmit bit-for-bit, show
its collectives in HLO, and compose with the UL sharded decode into an
on-mesh DL encode -> channel -> UL decode round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsran_project_tpu.ops.modulation import Modulation
from srsran_project_tpu.parallel import sharded_carrier, sharded_encode
from srsran_project_tpu.phy import pusch as pusch_mod
from srsran_project_tpu.phy import pdsch as pdsch_mod
from srsran_project_tpu.phy.allocation import Allocation
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def wide_cfg():
    nof_rb = 264
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
    )


@pytest.fixture(scope="module")
def sp_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(jax.devices()[:8]), ("sp",))


def test_sharded_encode_matches_unsharded(wide_cfg, sp_mesh):
    rng = np.random.default_rng(11)
    tb = jnp.asarray(rng.integers(0, 2, size=(wide_cfg.tbs,), dtype=np.uint8))
    ref = np.asarray(pusch_mod.transmit(tb, jnp.uint32(0x4601), wide_cfg))
    got = np.asarray(sharded_encode.sharded_transmit(
        tb, jnp.uint32(0x4601), wide_cfg, sp_mesh))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-5, float(np.abs(got - ref).max())


def test_sharded_encode_collectives_in_hlo(wide_cfg, sp_mesh):
    tx_cfg = pdsch_mod.PdschConfig(
        tbs=wide_cfg.tbs, target_code_rate=wide_cfg.target_code_rate,
        modulation=wide_cfg.modulation, alloc=wide_cfg.alloc,
        nof_layers=wide_cfg.nof_layers, nof_ports=wide_cfg.nof_rx_ports,
        nof_grid_symbols=wide_cfg.nof_grid_symbols,
        nof_grid_sc=wide_cfg.nof_grid_sc)
    hlo = sharded_encode.encode_hlo_text(tx_cfg, sp_mesh)
    assert "num_partitions=8" in hlo, "encode not SPMD-partitioned"
    # GSPMD joins the cb-sharded encoder output either via all-gather or a
    # masked-scatter + all-reduce; both count as the join collective.
    n_join = (hlo.count("all-gather(") + hlo.count("all-gather-start(")
              + hlo.count("all-to-all(") + hlo.count("collective-permute(")
              + hlo.count("all-reduce(") + hlo.count("all-reduce-start("))
    assert n_join >= 1, "no join collective in sharded-encode HLO"


def test_dl_encode_channel_ul_decode_roundtrip_on_mesh(wide_cfg, sp_mesh):
    """DL encode (cb-sharded bit chain, sc-sharded grid) -> AWGN -> UL
    sharded front end + cb-dp LDPC decode, all on the same mesh."""
    rng = np.random.default_rng(12)
    tb = jnp.asarray(rng.integers(0, 2, size=(wide_cfg.tbs,), dtype=np.uint8))
    grid = sharded_encode.sharded_transmit(
        tb, jnp.uint32(0x4601), wide_cfg, sp_mesh)
    nvar = 10 ** (-22.0 / 10)
    noise = (rng.standard_normal(grid.shape)
             + 1j * rng.standard_normal(grid.shape)) * np.sqrt(nvar / 2)
    noise_s = jax.device_put(
        jnp.asarray(noise.astype(np.complex64)),
        NamedSharding(sp_mesh, P(None, None, "sp")))
    rx = grid + noise_s  # stays sc-sharded: no resharding hop between DL and UL
    out = sharded_carrier.sharded_decode(rx, 0x4601, wide_cfg, sp_mesh,
                                         sharded_ldpc=True)
    assert bool(np.asarray(out["tb_crc_ok"]))
    assert (np.asarray(out["tb_bits"]) == np.asarray(tb)).all()


def test_sharded_encode_spxdp_mesh(wide_cfg):
    """cb axis on dp, sc axis on sp — the 2-D mesh composition."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh2 = Mesh(devs, ("sp", "dp"))
    rng = np.random.default_rng(13)
    tb = jnp.asarray(rng.integers(0, 2, size=(wide_cfg.tbs,), dtype=np.uint8))
    ref = np.asarray(pusch_mod.transmit(tb, jnp.uint32(0x4601), wide_cfg))
    got = np.asarray(sharded_encode.sharded_transmit(
        tb, jnp.uint32(0x4601), wide_cfg, mesh2, cb_axis="dp", sc_axis="sp"))
    assert np.abs(got - ref).max() < 1e-5
