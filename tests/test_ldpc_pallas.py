"""Pallas LDPC decoder kernel vs the XLA reference decoder (interpret mode
on CPU; the same kernel compiles for TPU)."""

import numpy as np
import pytest

from srsran_project_tpu.ops.ldpc import decoder, decoder_pallas, encoder, graphs


@pytest.mark.parametrize("bg,z", [(2, 52), (1, 96)])
def test_pallas_decoder_noiseless(bg, z):
    rng = np.random.default_rng(z)
    g = graphs.get_graph(bg, z)
    msg = rng.integers(0, 2, size=(3, g.kb * z), dtype=np.uint8)
    cw = np.asarray(encoder.encode(msg, bg, z))
    llr = np.where(cw[:, 2 * z :] == 0, 20.0, -20.0).astype(np.float32)
    bits, _, _ = decoder_pallas.decode_pallas(llr, bg, z, nof_iterations=4, batch_tile=2,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(bits), msg)


def test_pallas_matches_xla_decoder_awgn():
    bg, z = 2, 64
    g = graphs.get_graph(bg, z)
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 2, size=(4, g.kb * z), dtype=np.uint8)
    cw = np.asarray(encoder.encode(msg, bg, z))
    tx = cw[:, 2 * z :]
    x = 1.0 - 2.0 * tx.astype(np.float32)
    sigma = 0.6
    y = x + sigma * rng.standard_normal(x.shape).astype(np.float32)
    llr = (2 * y / sigma**2).astype(np.float32)
    b_ref, app_ref = decoder.decode(llr, bg, z, nof_iterations=5)
    b_pal, app_pal, _ = decoder_pallas.decode_pallas(llr, bg, z, nof_iterations=5,
                                                  batch_tile=4, interpret=True)
    # Same algorithm, same schedule: hard decisions must agree.
    np.testing.assert_array_equal(np.asarray(b_pal), np.asarray(b_ref))
    np.testing.assert_allclose(np.asarray(app_pal), np.asarray(app_ref), rtol=2e-3, atol=2e-3)


def test_pallas_batch_padding():
    bg, z = 2, 52
    g = graphs.get_graph(bg, z)
    rng = np.random.default_rng(1)
    msg = rng.integers(0, 2, size=(5, g.kb * z), dtype=np.uint8)  # 5 % tile != 0
    cw = np.asarray(encoder.encode(msg, bg, z))
    llr = np.where(cw[:, 2 * z :] == 0, 15.0, -15.0).astype(np.float32)
    bits, _, _ = decoder_pallas.decode_pallas(llr, bg, z, nof_iterations=3, batch_tile=4,
                                           interpret=True)
    assert bits.shape == (5, g.kb * z)
    np.testing.assert_array_equal(np.asarray(bits), msg)


def test_pallas_early_stop_syndrome():
    """Kernel-level while_loop early stop: converges in far fewer iterations
    at high SNR, bits identical to the full-budget decode; reports the
    iteration count actually run (reference's LDPC iteration statistic)."""
    bg, z = 2, 64
    g = graphs.get_graph(bg, z)
    rng = np.random.default_rng(3)
    msg = rng.integers(0, 2, size=(4, g.kb * z), dtype=np.uint8)
    cw = np.asarray(encoder.encode(msg, bg, z))
    tx = cw[:, 2 * z :]
    llr = np.where(tx == 0, 20.0, -20.0).astype(np.float32)
    bits, _, iters = decoder_pallas.decode_pallas(
        llr, bg, z, nof_iterations=8, batch_tile=4, interpret=True, early_stop=True
    )
    np.testing.assert_array_equal(np.asarray(bits), msg)
    assert iters.shape == (4,)
    assert int(np.asarray(iters).max()) <= 2  # noiseless: instant convergence

    # Moderate noise: early-stop hard decisions match the fixed-budget run.
    x = 1.0 - 2.0 * tx.astype(np.float32)
    sigma = 0.6
    y = x + sigma * rng.standard_normal(x.shape).astype(np.float32)
    llr = (2 * y / sigma**2).astype(np.float32)
    b_full, _, it_full = decoder_pallas.decode_pallas(
        llr, bg, z, nof_iterations=8, batch_tile=4, interpret=True, early_stop=False
    )
    b_es, _, it_es = decoder_pallas.decode_pallas(
        llr, bg, z, nof_iterations=8, batch_tile=4, interpret=True, early_stop=True
    )
    np.testing.assert_array_equal(np.asarray(b_es), np.asarray(b_full))
    assert int(np.asarray(it_full)[0]) == 8
    assert int(np.asarray(it_es).max()) <= 8
