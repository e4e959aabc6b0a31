"""Fused vs staged program granularity must be bit-exact (models.cell)."""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from srsran_project_tpu.models import cell as cell_mod
from srsran_project_tpu.ops import ofdm as ofdm_mod


def test_fused_matches_staged():
    cfg_f = cell_mod.tiny_cell(nof_rb=24, nof_ports=2)
    cfg_s = dataclasses.replace(cfg_f, fuse_stages=False)
    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, size=(cfg_f.tbs,), dtype=np.uint8))
    rnti = jnp.uint32(0x4601)
    w = jnp.eye(cfg_f.nof_layers, cfg_f.nof_ports, dtype=jnp.complex64)

    iq_f = cell_mod.encode_slot(tb, rnti, w, cfg_f)
    iq_s = cell_mod.encode_slot(tb, rnti, w, cfg_s)
    np.testing.assert_array_equal(np.asarray(iq_f), np.asarray(iq_s))

    n = ofdm_mod.slot_nof_samples(cfg_f.scs, cfg_f.dft_size, cfg_f.cp, 0)
    noise = jnp.asarray(((rng.standard_normal((cfg_f.nof_ports, n))
                          + 1j * rng.standard_normal((cfg_f.nof_ports, n)))
                         * np.sqrt(1e-3 / 2)).astype(np.complex64))
    out_f = cell_mod.decode_slot(iq_f + noise, rnti, cfg_f)
    out_s = cell_mod.decode_slot(iq_s + noise, rnti, cfg_s)
    assert bool(np.asarray(out_f["tb_crc_ok"])) and bool(np.asarray(out_s["tb_crc_ok"]))
    np.testing.assert_array_equal(np.asarray(out_f["tb_bits"]), np.asarray(out_s["tb_bits"]))
    np.testing.assert_allclose(float(out_f["noise_var"]), float(out_s["noise_var"]), rtol=1e-6)
