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


# ---------------------------------------------------------------------------
# Parity-check bits (TS 38.212 §5.3.1.2, UCI 12<=A<=19)

def _u_oracle_with_pc(msg, code):
    """Bit-exact spec procedure: 5-bit cyclic register over u_0..u_{N-1}."""
    u = np.zeros(code.nval, dtype=np.uint8)
    y = [0] * 5
    info = set(code.info_set)
    pc = set(code.pc_set)
    it = iter(msg)
    for i in range(code.nval):
        y = y[1:] + y[:1]  # left cyclic shift
        if i in pc:
            u[i] = y[0]
        elif i in info:
            u[i] = next(it)
            y[0] ^= int(u[i])
    return u


@pytest.mark.parametrize("k,e,n_pc_wm", [(18, 96, 0), (21, 240, 1), (25, 120, 0)])
def test_pc_construction_and_encoder_match_spec_register(k, e, n_pc_wm):
    code = construct(k, e, n_max=10, n_pc=3, n_pc_wm=n_pc_wm)
    assert len(code.pc_set) == 3
    assert len(code.info_set) == k
    assert not set(code.pc_set) & set(code.info_set)
    rng = np.random.default_rng(7)
    msg = rng.integers(0, 2, size=(k,), dtype=np.uint8)
    u_ref = _u_oracle_with_pc(msg, code)
    d_ref = u_ref.copy()
    # reference butterfly
    d_ref = np.asarray(polar_transform(d_ref[None]))[0]
    sel = code_mod.rate_match_indices(code)
    np.testing.assert_array_equal(np.asarray(encode(msg[None], code))[0], d_ref[sel])


def test_pc_wm_position_has_min_row_weight():
    code = construct(21, 240, n_max=10, n_pc=3, n_pc_wm=1)
    wm = code.pc_set_wm_check if hasattr(code, "pc_set_wm_check") else None
    # The wm position is the one not among the two least-reliable picks:
    rel = tables.reliability_sequence(code.n).tolist()
    order = {pos: i for i, pos in enumerate(rel)}
    by_rel = sorted(code.pc_set, key=lambda p: order[p])
    wm_pos = by_rel[-1]
    w = lambda i: 1 << bin(i).count("1")
    others = set(code.info_set) | {p for p in code.pc_set if p != wm_pos}
    assert all(w(wm_pos) <= w(i) for i in others if order[i] > order[by_rel[0]])


@pytest.mark.parametrize("k", [18, 20, 25])
def test_pc_decode_roundtrip(k):
    e = 150
    code = construct(k, e, n_max=10, n_pc=3, n_pc_wm=0)
    rng = np.random.default_rng(k)
    msg = rng.integers(0, 2, size=(4, k), dtype=np.uint8)
    tx = np.asarray(encode(msg, code))
    x = 1.0 - 2.0 * tx.astype(np.float32)
    sigma = 10 ** (-6.0 / 20)
    y = x + sigma * rng.standard_normal(x.shape).astype(np.float32)
    llr_e = 2 * y / sigma**2
    out = np.asarray(decode(np.asarray(rate_dematch_llrs(llr_e, code)), code))
    np.testing.assert_array_equal(out, msg)


def test_uci_pc_path_roundtrip():
    from srsran_project_tpu.ops import uci as uci_mod

    for a in (12, 15, 19):
        e = 200
        code = uci_mod._uci_code(a, e)
        assert len(code.pc_set) == 3
        rng = np.random.default_rng(a)
        bits = rng.integers(0, 2, size=(a,), dtype=np.uint8)
        coded = np.asarray(uci_mod.encode_uci(bits, e)).astype(np.float32)
        llrs = (1.0 - 2.0 * coded) * 8.0
        out, ok = uci_mod.decode_uci(llrs, a)
        assert bool(np.asarray(ok))
        np.testing.assert_array_equal(np.asarray(out), bits)
