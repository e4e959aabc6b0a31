"""CRC calculators vs the long-division spec model (TS 38.212 §5.1)."""

import numpy as np
import pytest

from srsran_project_tpu.ops import crc as crc_mod


@pytest.mark.parametrize("name", list(crc_mod.POLYS))
@pytest.mark.parametrize("length", [16, 100, 3824])
def test_crc_matches_reference_model(name, length):
    rng = np.random.default_rng(hash((name, length)) % 2**32)
    bits = rng.integers(0, 2, size=length, dtype=np.uint8)
    want = crc_mod.crc_ref(bits, name)
    got = np.asarray(crc_mod.crc(bits, name))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name", ["24A", "24B", "16"])
def test_crc_batched(name):
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(5, 120), dtype=np.uint8)
    got = np.asarray(crc_mod.crc(bits, name))
    for i in range(5):
        np.testing.assert_array_equal(got[i], crc_mod.crc_ref(bits[i], name))


def test_crc_append_and_check():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(3, 64), dtype=np.uint8)
    full = np.asarray(crc_mod.crc_append(bits, "24A")).copy()
    assert full.shape == (3, 64 + 24)
    ok = np.asarray(crc_mod.crc_check(full, "24A"))
    assert ok.all()
    # Corrupt one bit -> check fails for that message only.
    full[1, 10] ^= 1
    ok = np.asarray(crc_mod.crc_check(full, "24A"))
    assert list(ok) == [True, False, True]


def test_known_value_crc16():
    # CRC-16/XMODEM ("CCITT-FALSE" zero-init) of ASCII "123456789" is 0x31C3.
    data = b"123456789"
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    got = crc_mod.crc_ref(bits, "16")
    val = int("".join(map(str, got)), 2)
    assert val == 0x31C3


def test_crc_check_concat_matches_stream_crc():
    """Per-chunk partials + fold == CRC of the concatenated stream, and
    trailing zero padding leaves the verdict unchanged (invertible
    advance)."""
    import jax.numpy as jnp

    from srsran_project_tpu.ops import crc as crc_mod

    rng = np.random.default_rng(7)
    for name in ("24A", "16"):
        for c, L in ((3, 100), (7, 512), (5, 1333)):
            msg = rng.integers(0, 2, size=(c * L,), dtype=np.uint8)
            # Append the true CRC into the tail so the check passes.
            n = crc_mod.POLYS[name][1]
            body = msg[: c * L - n]
            tail = crc_mod.crc_ref(body, name)
            stream = np.concatenate([body, tail])
            ok = crc_mod.crc_check_concat(
                jnp.asarray(stream.reshape(c, L)), name)
            assert bool(np.asarray(ok)), (name, c, L)
            # Flip one bit -> fail.
            bad = stream.copy()
            bad[5] ^= 1
            assert not bool(np.asarray(crc_mod.crc_check_concat(
                jnp.asarray(bad.reshape(c, L)), name)))
            # Zero-pad invariance: stream || 0^z passes iff stream passes.
            z = 17
            padded = np.concatenate([stream, np.zeros(z, np.uint8)])
            pad_to = c * L + z
            # reshape into c+1 chunks of equal length requires divisibility;
            # use 1 chunk of the whole padded stream instead.
            ok_p = crc_mod.crc_check_concat(
                jnp.asarray(padded.reshape(1, pad_to)), name)
            assert bool(np.asarray(ok_p)), (name, c, L)
