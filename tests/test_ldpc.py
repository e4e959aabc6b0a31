"""LDPC chain: graphs, encoder (H·c = 0), rate match/dematch, segmentation,
layered min-sum decoder round trips."""

import numpy as np
import pytest

from srsran_project_tpu.ops.ldpc import decoder, encoder, graphs, rate_match, segmenter


@pytest.mark.parametrize("bg,z", [(1, 2), (1, 15), (1, 96), (1, 384), (2, 3), (2, 52), (2, 240)])
def test_encoder_parity(bg, z):
    rng = np.random.default_rng(bg * 1000 + z)
    g = graphs.get_graph(bg, z)
    msg = rng.integers(0, 2, size=(3, g.kb * z), dtype=np.uint8)
    cw = np.asarray(encoder.encode(msg, bg, z))
    np.testing.assert_array_equal(cw[:, : g.kb * z], msg)  # systematic
    syn = graphs.parity_check(g, cw)
    assert syn.sum() == 0


def test_lifting_size_selection():
    # TS 38.212: smallest Z with Kb*Z >= K'.
    assert graphs.select_lifting_size(graphs.BG1, 8448, 1) == 384
    assert graphs.select_lifting_size(graphs.BG2, 320, 1) == 40  # kb=8, 8*40=320
    assert graphs.select_base_graph(100, 0.5) == graphs.BG2
    assert graphs.select_base_graph(4000, 0.9) == graphs.BG1
    assert graphs.select_base_graph(10000, 0.2) == graphs.BG2


def test_rate_match_indices_basic():
    # Small config: BG2, z=10, no fillers, rv0, QPSK.
    bg, z = 2, 10
    g = graphs.get_graph(bg, z)
    k_prime = g.kb * z  # no fillers
    e = 120
    idx = rate_match.selection_indices(bg, z, k_prime, e, 0, 2, g.nof_codeword_bits)
    assert idx.shape == (e,)
    # rv0 starts at position 0; de-interleaving recovers sequential reads.
    deint = idx.reshape(e // 2, 2).T.reshape(-1)
    np.testing.assert_array_equal(deint, np.arange(e) % g.nof_codeword_bits)


def test_rate_match_skips_fillers():
    bg, z = 2, 10
    g = graphs.get_graph(bg, z)
    k_prime = g.kb * z - 2 * z  # 2Z filler bits
    e = 200
    idx = rate_match.selection_indices(bg, z, k_prime, e, 0, 1, g.nof_codeword_bits)
    f_lo, f_hi = k_prime - 2 * z, g.kb * z - 2 * z
    assert not np.any((idx >= f_lo) & (idx < f_hi))


@pytest.mark.parametrize("rv", [0, 1, 2, 3])
def test_rate_match_dematch_roundtrip(rv):
    bg, z, qm = 2, 20, 2
    g = graphs.get_graph(bg, z)
    k_prime = g.kb * z
    n = g.nof_codeword_bits
    e = n + 40  # wrap the circular buffer
    rng = np.random.default_rng(rv)
    buf = rng.integers(0, 2, size=(2, n), dtype=np.uint8)
    tx = np.asarray(rate_match.rate_match(buf, bg, z, k_prime, e, rv, qm))
    assert tx.shape == (2, e)
    llr = np.where(tx == 0, 10, -10).astype(np.int8)
    deb = np.asarray(rate_match.rate_dematch(llr, bg, z, k_prime, e, rv, qm))
    # Every transmitted position must agree in sign; untouched are 0.
    idx = rate_match.selection_indices(bg, z, k_prime, e, rv, qm, n)
    touched = np.zeros(n, dtype=bool)
    touched[idx] = True
    hard = (deb < 0).astype(np.uint8)
    np.testing.assert_array_equal(hard[:, touched], buf[:, touched])
    assert (deb[:, ~touched] == 0).all()


def test_segmentation_params_single_cb():
    p = segmenter.compute_segment_params(3824, 0.5)
    assert p.nof_codeblocks == 1
    assert p.tb_crc == "16"
    assert p.base_graph == graphs.BG2
    p = segmenter.compute_segment_params(8000, 0.9)
    assert p.base_graph == graphs.BG1
    assert p.nof_codeblocks == 1
    assert p.nof_payload_bits_per_cb == 8000 + 24


def test_segment_roundtrip_multi_cb():
    # Pick a TBS that segments into multiple codeblocks.
    tbs = 18432
    p = segmenter.compute_segment_params(tbs, 0.9)
    assert p.nof_codeblocks > 1
    rng = np.random.default_rng(5)
    tb = rng.integers(0, 2, size=(tbs,), dtype=np.uint8)
    cbs = np.asarray(segmenter.segment_tx(tb, p))
    assert cbs.shape == (p.nof_codeblocks, p.nof_cb_bits)
    # filler zeros at the tail
    assert (cbs[:, p.nof_payload_bits_per_cb :] == 0).all()
    out, ok = segmenter.desegment_rx(cbs, p)
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(out), tb)


@pytest.mark.parametrize("bg,z", [(1, 96), (2, 52)])
def test_decode_noiseless(bg, z):
    rng = np.random.default_rng(z)
    g = graphs.get_graph(bg, z)
    msg = rng.integers(0, 2, size=(2, g.kb * z), dtype=np.uint8)
    cw = np.asarray(encoder.encode(msg, bg, z))
    tx = cw[:, 2 * z :]
    llr = np.where(tx == 0, 20.0, -20.0).astype(np.float32)
    bits, _ = decoder.decode(llr, bg, z, nof_iterations=4)
    np.testing.assert_array_equal(np.asarray(bits), msg)


def test_decode_awgn():
    bg, z = 1, 96
    g = graphs.get_graph(bg, z)
    rng = np.random.default_rng(7)
    msg = rng.integers(0, 2, size=(4, g.kb * z), dtype=np.uint8)
    cw = np.asarray(encoder.encode(msg, bg, z))
    tx = cw[:, 2 * z :]
    x = 1.0 - 2.0 * tx.astype(np.float32)
    snr_db = 3.0
    sigma = 10 ** (-snr_db / 20)
    y = x + sigma * rng.standard_normal(x.shape).astype(np.float32)
    llr = 2 * y / sigma**2
    bits, _ = decoder.decode(llr.astype(np.float32), bg, z, nof_iterations=10)
    # Rate ~1/3 code at 3 dB: all codewords must decode.
    assert (np.asarray(bits) == msg).all()


def test_harq_combine_saturates():
    old = np.array([100, -100, 50], dtype=np.int8)
    new = np.array([50, -50, -20], dtype=np.int8)
    out = np.asarray(rate_match.combine_harq(old, new))
    assert list(out) == [120, -120, 30]


def test_encoder_lbrm_truncation_matches_full():
    """encode(n_cb=...) matches the full encoder on every buffer position
    the rate matcher can reach; the skipped region reads 0."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    for bg, z, n_cb in ((1, 384, 13595), (1, 64, 2000), (2, 208, 5000)):
        g = graphs.get_graph(bg, z)
        msg = jnp.asarray(rng.integers(0, 2, size=(3, g.kb * z), dtype=np.uint8))
        full = np.asarray(encoder.encode(msg, bg, z))
        trunc = np.asarray(encoder.encode(msg, bg, z, n_cb=n_cb))
        reach = 2 * z + n_cb  # codeword positions the buffer can reach
        np.testing.assert_array_equal(trunc[:, :reach], full[:, :reach])
        ncols = max(0, -(-(n_cb + 2 * z) // z))
        assert (trunc[:, ncols * z:] == 0).all()
