"""Fused apply+demap+quantize+descramble Pallas kernel (ops/demap_pallas)
and the plane-layout decode path: bit-exact parity with the XLA stream
chain, in interpret mode on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from srsran_project_tpu.ops import scrambling
from srsran_project_tpu.ops.demap_pallas import demap_planes_pallas
from srsran_project_tpu.ops.modulation import Modulation, demap_soft, quantize_llr
from srsran_project_tpu.ops.modulation.evm import evm
from srsran_project_tpu.phy import pusch as pusch_mod
from srsran_project_tpu.phy import sch as sch_mod
from srsran_project_tpu.phy.allocation import Allocation


def _cfg(nof_rb=24, mod=Modulation.QAM256, layers=4, rate=0.6, tbs=65536):
    return pusch_mod.PuschConfig(
        tbs=tbs, target_code_rate=rate, modulation=mod,
        alloc=Allocation(rb_start=0, rb_count=nof_rb, sym_start=1,
                         sym_count=13, dmrs_symbols=(2,)),
        nof_layers=layers, nof_rx_ports=layers, nof_grid_symbols=14,
        nof_grid_sc=nof_rb * 12, demapper="planes")


def test_kernel_matches_xla_chain():
    """Kernel planes == quantized/descrambled XLA LLR stream re-laid as
    planes, and the err2 output reproduces the decision-directed EVM."""
    rng = np.random.default_rng(0)
    mod, qm, L, P, nsym, nsc = Modulation.QAM64, 6, 2, 2, 5, 96
    y = (rng.standard_normal((P, nsym, nsc))
         + 1j * rng.standard_normal((P, nsym, nsc))).astype(np.complex64)
    w = ((rng.standard_normal((nsc, L, P))
          + 1j * rng.standard_normal((nsc, L, P))) * 0.3).astype(np.complex64)
    ev_sc = (0.05 + rng.random((nsc, L))).astype(np.float32)
    g_total = nsym * nsc * L * qm
    c_init = (0x4601 << 15) + 1
    c = np.asarray(scrambling.gold_sequence(jnp.uint32(c_init), g_total))
    signs = (1.0 - 2.0 * c.astype(np.float32)).reshape(g_total // qm, qm).T

    x = np.einsum("nlp,pmn->mnl", w, y)
    x_hat = jnp.asarray(x.reshape(-1, L))
    eq_nvar = jnp.asarray(
        np.broadcast_to(ev_sc[None], (nsym, nsc, L)).reshape(-1, L))
    llr_layers = demap_soft(x_hat.T, eq_nvar.T, mod)
    llr = jnp.moveaxis(llr_layers.reshape(L, -1, qm), 0, 1).reshape(-1)
    llr_i8 = scrambling.descramble_llrs(quantize_llr(llr, 20.0),
                                        jnp.uint32(c_init))
    ref = np.asarray(llr_i8).reshape(g_total // qm, qm).T

    got, err2 = demap_planes_pallas(
        jnp.asarray(y), jnp.asarray(w), jnp.asarray(ev_sc),
        jnp.asarray(signs), mod, L, P, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), ref)
    e_ref = float(np.asarray(evm(x_hat.reshape(-1), mod)))
    np.testing.assert_allclose(np.sqrt(np.asarray(err2).mean()), e_ref,
                               rtol=1e-5)


def test_planes_path_end_to_end_matches_stream_path():
    """_front_end_planes + decode_from_planes == _front_end +
    decode_transport_block on the same received grid (interpret mode)."""
    cfg = _cfg()
    assert sch_mod._fused_decode_ok(cfg.sch)
    rng = np.random.default_rng(1)
    tb = jnp.asarray(rng.integers(0, 2, size=(cfg.tbs,), dtype=np.uint8))
    grid = pusch_mod.transmit(tb, jnp.uint32(0x4601), cfg)
    nvar = 10 ** (-28.0 / 10)
    noise = (rng.standard_normal(grid.shape)
             + 1j * rng.standard_normal(grid.shape))
    grid = grid + jnp.asarray((noise * np.sqrt(nvar / 2)).astype(np.complex64))

    planes, nv_p, snr_p = pusch_mod._front_end_planes(
        grid, jnp.uint32(0x4601), cfg, interpret=True)
    tb_p, ok_p = sch_mod.decode_from_planes(
        planes, cfg.sch, cfg.nof_ldpc_iterations, early_stop=False,
        interpret=True)

    llr, nv_s, snr_s = pusch_mod._front_end(grid, jnp.uint32(0x4601), cfg)
    # Plane layout parity with the stream: float-order differences between
    # the kernel's MAC order and XLA's sum() may flip quantization by one
    # LSB on a tiny fraction of LLRs (same tolerance as the sharded
    # front-end parity tests).
    ref_planes = np.asarray(llr).reshape(-1, cfg.sch.qm).T
    diff = np.abs(np.asarray(planes).astype(np.int32)
                  - ref_planes.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 1e-3, (diff > 0).mean()
    np.testing.assert_allclose(float(nv_p), float(nv_s), rtol=1e-6)
    np.testing.assert_allclose(float(snr_p), float(snr_s), rtol=1e-4)
    assert bool(np.asarray(ok_p))
    np.testing.assert_array_equal(np.asarray(tb_p), np.asarray(tb))
