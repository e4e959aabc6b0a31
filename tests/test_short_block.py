"""Short-block (Reed-Muller) encoder + ML detector."""

import numpy as np
import pytest

from srsran_project_tpu.ops import short_block


@pytest.mark.parametrize("k", [1, 2, 3, 6, 11])
def test_roundtrip_noiseless(k):
    rng = np.random.default_rng(k)
    e = 32 if k > 2 else 8
    msg = rng.integers(0, 2, size=(5, k), dtype=np.uint8)
    tx = np.asarray(short_block.encode(msg, e))
    assert tx.shape == (5, e)
    llr = np.where(tx == 0, 10.0, -10.0).astype(np.float32)
    bits, metric = short_block.detect(llr, k, e)
    np.testing.assert_array_equal(np.asarray(bits), msg)
    assert (np.asarray(metric) > 0.9).all()


def test_rm_basis_is_rank_11():
    # The 11 basis sequences must be linearly independent over GF(2).
    b = short_block.BASIS.astype(np.uint8).copy()
    rank = 0
    for col in range(32):
        piv = None
        for r in range(rank, 11):
            if b[r, col]:
                piv = r
                break
        if piv is None:
            continue
        b[[rank, piv]] = b[[piv, rank]]
        for r in range(11):
            if r != rank and b[r, col]:
                b[r] ^= b[rank]
        rank += 1
    assert rank == 11


def test_detect_awgn():
    rng = np.random.default_rng(0)
    k, e = 8, 64
    msg = rng.integers(0, 2, size=(20, k), dtype=np.uint8)
    tx = np.asarray(short_block.encode(msg, e)).astype(np.float32)
    x = 1.0 - 2.0 * tx
    sigma = 0.7
    y = x + sigma * rng.standard_normal(x.shape).astype(np.float32)
    llr = 2 * y / sigma**2
    bits, _ = short_block.detect(llr, k, e)
    assert (np.asarray(bits) == msg).all()


def test_repetition_rate_match():
    msg = np.array([[1, 0, 1]], dtype=np.uint8)
    tx = np.asarray(short_block.encode(msg, 80))
    assert tx.shape == (1, 80)
    # Positions 32..63 repeat 0..31.
    np.testing.assert_array_equal(tx[0, 32:64], tx[0, :32])
