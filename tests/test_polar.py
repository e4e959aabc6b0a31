"""Polar chain: construction sanity, transform involution, encode->AWGN->
decode round trips (the reference's own polar verification strategy:
tests/unittests/phy/upper/channel_coding/polar/polar_chain_test.cpp:205)."""

import numpy as np
import pytest

from srsran_project_tpu.ops.polar import (
    construct,
    decode,
    encode,
    polar_transform,
    rate_dematch_llrs,
)
from srsran_project_tpu.ops.polar import code as code_mod
from srsran_project_tpu.ops.polar import tables


def test_reliability_sequence_is_permutation():
    for n in (5, 7, 9, 10):
        seq = tables.reliability_sequence(n)
        assert sorted(seq.tolist()) == list(range(1 << n))


def test_subblock_interleaver_permutation():
    for n in (5, 8, 10):
        j = tables.subblock_interleaver(n)
        assert sorted(j.tolist()) == list(range(1 << n))


def test_input_interleaver():
    for k in (12, 57, 140, 164):
        pi = tables.input_interleaver(k)
        assert sorted(pi.tolist()) == list(range(k))


def test_polar_transform_involution():
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, size=(3, 256), dtype=np.uint8)
    x = np.asarray(polar_transform(u))
    back = np.asarray(polar_transform(x))
    np.testing.assert_array_equal(back, u)


def test_transform_matches_generator_matrix():
    # Explicit G_N = F^{kron n} check for N = 16.
    f = np.array([[1, 0], [1, 1]], dtype=np.uint8)
    g = f
    for _ in range(3):
        g = np.kron(g, f)
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, size=(5, 16), dtype=np.uint8)
    want = (u @ g) % 2
    got = np.asarray(polar_transform(u))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "k,e",
    [
        (32, 108),  # puncturing-ish PDCCH AL1-style
        (57, 216),  # PDCCH AL2
        (40, 864),  # repetition
        (100, 160),  # shortening (K/E > 7/16)
        (12, 48),
        (164, 432),
    ],
)
def test_chain_noiseless_and_awgn(k, e):
    code = construct(k, e, n_max=9)
    modes = {"repetition", "puncturing", "shortening"}
    assert code.rm_mode in modes
    rng = np.random.default_rng(k * 1000 + e)
    msg = rng.integers(0, 2, size=(8, k), dtype=np.uint8)
    tx = np.asarray(encode(msg, code))
    assert tx.shape == (8, e)

    # Noiseless.
    llr_e = np.where(tx == 0, 8.0, -8.0).astype(np.float32)
    lin = np.asarray(rate_dematch_llrs(llr_e, code))
    out = np.asarray(decode(lin, code))
    np.testing.assert_array_equal(out, msg)

    # AWGN at a comfortable SNR for these rates.
    x = 1.0 - 2.0 * tx.astype(np.float32)
    sigma = 10 ** (-5.0 / 20)
    y = x + sigma * rng.standard_normal(x.shape).astype(np.float32)
    llr_e = 2 * y / sigma**2
    out = np.asarray(decode(np.asarray(rate_dematch_llrs(llr_e, code)), code))
    assert (out == msg).all()


def test_dl_input_interleaving_roundtrip():
    code = construct(57, 216, n_max=9)
    rng = np.random.default_rng(3)
    msg = rng.integers(0, 2, size=(2, 57), dtype=np.uint8)
    tx = np.asarray(encode(msg, code, interleave_input=True))
    llr_e = np.where(tx == 0, 8.0, -8.0).astype(np.float32)
    u_hat = np.asarray(decode(np.asarray(rate_dematch_llrs(llr_e, code)), code))
    # Decoder returns interleaved bits; undo the interleaver.
    pi = tables.input_interleaver(57)
    deint = np.empty_like(u_hat)
    deint[:, pi] = u_hat
    np.testing.assert_array_equal(deint, msg)


def test_channel_interleaver_is_permutation():
    for e in (18, 54, 216, 500):
        perm = code_mod.channel_interleaver_pattern(e)
        assert sorted(perm.tolist()) == list(range(e))
