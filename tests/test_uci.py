"""UCI codec round trips across the short-block / polar regimes, and
file_vector IO."""

import numpy as np
import pytest

from srsran_project_tpu.ops import uci
from srsran_project_tpu.support import file_vector


@pytest.mark.parametrize("k,e", [(1, 8), (4, 32), (11, 64), (12, 96), (19, 144), (40, 216), (100, 512)])
def test_uci_roundtrip(k, e):
    rng = np.random.default_rng(k)
    bits = rng.integers(0, 2, size=(3, k), dtype=np.uint8)
    tx = np.asarray(uci.encode_uci(bits, e))
    assert tx.shape == (3, e)
    llr = np.where(tx == 0, 8.0, -8.0).astype(np.float32)
    got, ok = uci.decode_uci(llr, k)
    np.testing.assert_array_equal(np.asarray(got), bits)
    assert np.asarray(ok).all()


def test_uci_awgn_polar():
    rng = np.random.default_rng(1)
    k, e = 30, 256
    bits = rng.integers(0, 2, size=(6, k), dtype=np.uint8)
    tx = np.asarray(uci.encode_uci(bits, e)).astype(np.float32)
    x = 1 - 2 * tx
    sigma = 0.6
    y = x + sigma * rng.standard_normal(x.shape).astype(np.float32)
    got, ok = uci.decode_uci(2 * y / sigma**2, k)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(got), bits)


def test_uci_crc_catches_garbage():
    rng = np.random.default_rng(2)
    k, e = 25, 128
    llr = rng.standard_normal((8, e)).astype(np.float32) * 4
    _, ok = uci.decode_uci(llr, k)
    # Random noise should essentially never pass CRC6.
    assert np.asarray(ok).sum() <= 1


def test_file_vector_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    for kind, data in [
        ("cf32", (rng.standard_normal(64) + 1j * rng.standard_normal(64)).astype(np.complex64)),
        ("i8", rng.integers(-120, 120, 100).astype(np.int8)),
        ("u8", rng.integers(0, 2, 77).astype(np.uint8)),
        ("f32", rng.standard_normal(33).astype(np.float32)),
    ]:
        p = str(tmp_path / f"v_{kind}.dat")
        file_vector.write_vector(p, data, kind)
        back = file_vector.read_vector(p, kind)
        np.testing.assert_array_equal(back, data)


def test_file_vector_cbf16(tmp_path):
    rng = np.random.default_rng(4)
    x = (rng.standard_normal(50) + 1j * rng.standard_normal(50)).astype(np.complex64)
    p = str(tmp_path / "v.dat")
    file_vector.write_vector(p, x, "cbf16")
    back = file_vector.read_vector(p, "cbf16")
    # bf16 keeps ~8 bits of mantissa.
    np.testing.assert_allclose(back, x, rtol=1e-2, atol=1e-2)
    assert (tmp_path / "v.dat").stat().st_size == 50 * 4


@pytest.mark.parametrize("k,e", [(360, 1152), (501, 2048), (800, 4096)])
def test_uci_segmented_roundtrip(k, e):
    rng = np.random.default_rng(k)
    bits = rng.integers(0, 2, size=(2, k), dtype=np.uint8)
    tx = np.asarray(uci.encode_uci(bits, e))
    assert tx.shape == (2, e)
    llr = np.where(tx == 0, 8.0, -8.0).astype(np.float32)
    got, ok = uci.decode_uci(llr, k)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(got), bits)
