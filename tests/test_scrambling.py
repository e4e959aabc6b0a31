"""Gold sequence generator vs direct-LFSR spec model (TS 38.211 §5.2.1)."""

import numpy as np

from srsran_project_tpu.ops import scrambling


def test_gold_matches_lfsr_model():
    for c_init in [0, 1, 0x12345678 & 0x7FFFFFFF, 0x7FFFFFFF]:
        want = scrambling.gold_ref(c_init, 500)
        got = np.asarray(scrambling.gold_sequence(np.uint32(c_init), 500))
        np.testing.assert_array_equal(got, want, err_msg=f"c_init={c_init:#x}")


def test_gold_batched_seeds():
    seeds = np.array([17, 4093, 2**30 + 5], dtype=np.uint32)
    got = np.asarray(scrambling.gold_sequence(seeds, 256))
    assert got.shape == (3, 256)
    for i, s in enumerate(seeds):
        np.testing.assert_array_equal(got[i], scrambling.gold_ref(int(s), 256))


def test_gold_long_sequence():
    # Exercise the chunked LFSR fill across table growth.
    c_init = 0x5A5A5
    want = scrambling.gold_ref(c_init, 40000)
    got = np.asarray(scrambling.gold_sequence(np.uint32(c_init), 40000))
    np.testing.assert_array_equal(got, want)


def test_scramble_roundtrip():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, size=(2, 300), dtype=np.uint8)
    c_init = np.uint32(777)
    s = np.asarray(scrambling.scramble_bits(bits, c_init))
    d = np.asarray(scrambling.scramble_bits(s, c_init))
    np.testing.assert_array_equal(d, bits)


def test_descramble_llr_sign_flip():
    llrs = np.array([[10, -20, 127, -128, 0, 5]], dtype=np.int8)
    c_init = np.uint32(42)
    seq = scrambling.gold_ref(42, 6)
    got = np.asarray(scrambling.descramble_llrs(llrs, c_init))
    for j in range(6):
        if seq[j]:
            expect = 127 if llrs[0, j] == -128 else -llrs[0, j]
        else:
            expect = llrs[0, j]
        assert got[0, j] == expect
