"""Modulation mapper + soft demapper (TS 38.211 §5.1)."""

import numpy as np
import pytest

from srsran_project_tpu.ops.modulation import (  # noqa
    Modulation,
    bits_per_symbol,
    demap_soft,
    map_bits,
    quantize_llr,
)
from srsran_project_tpu.ops.modulation.mapper import constellation

MODS = [Modulation.BPSK, Modulation.QPSK, Modulation.QAM16, Modulation.QAM64, Modulation.QAM256]


@pytest.mark.parametrize("mod", MODS + [Modulation.PI_2_BPSK])
def test_unit_average_power(mod):
    lut = constellation(mod)
    assert abs(np.mean(np.abs(lut) ** 2) - 1.0) < 1e-6


def test_known_symbols():
    # TS 38.211 §5.1.3: QPSK b=00 -> (1+j)/sqrt(2).
    np.testing.assert_allclose(constellation(Modulation.QPSK)[0], (1 + 1j) / np.sqrt(2), rtol=1e-6)
    # §5.1.4: 16QAM b=0000 -> (1+j)/sqrt(10); b=1010 -> (-3+j)/sqrt(10);
    # b=1100 -> (-1-j)/sqrt(10).
    np.testing.assert_allclose(constellation(Modulation.QAM16)[0b0000], (1 + 1j) / np.sqrt(10), rtol=1e-6)
    np.testing.assert_allclose(constellation(Modulation.QAM16)[0b1010], (-3 + 1j) / np.sqrt(10), rtol=1e-6)
    np.testing.assert_allclose(constellation(Modulation.QAM16)[0b1100], (-1 - 1j) / np.sqrt(10), rtol=1e-6)
    # 16QAM b=0010 -> (3+j)/sqrt(10).
    np.testing.assert_allclose(constellation(Modulation.QAM16)[0b0010], (3 + 1j) / np.sqrt(10), rtol=1e-6)
    # 64QAM b=000000 -> (3+3j)/sqrt(42).
    np.testing.assert_allclose(constellation(Modulation.QAM64)[0], (3 + 3j) / np.sqrt(42), rtol=1e-6)
    # 256QAM b=00000000 -> (5+5j)/sqrt(170).
    np.testing.assert_allclose(constellation(Modulation.QAM256)[0], (5 + 5j) / np.sqrt(170), rtol=1e-6)


@pytest.mark.parametrize("mod", MODS)
def test_map_demap_noiseless(mod):
    rng = np.random.default_rng(int(mod))
    qm = bits_per_symbol(mod)
    bits = rng.integers(0, 2, size=(2, 48 * qm), dtype=np.uint8)
    syms = np.asarray(map_bits(bits, mod))
    nvar = np.full(syms.shape, 0.1, dtype=np.float32)
    llrs = np.asarray(demap_soft(syms, nvar, mod))
    hard = (llrs < 0).astype(np.uint8)
    np.testing.assert_array_equal(hard, bits)


def _brute_force_llr(y, mod, nvar):
    lut = constellation(mod)
    qm = bits_per_symbol(mod)
    d2 = np.abs(y[..., None] - lut) ** 2  # (..., 2^qm)
    idx = np.arange(len(lut))
    out = []
    for b in range(qm):
        bit = (idx >> (qm - 1 - b)) & 1
        m0 = d2[..., bit == 0].min(axis=-1)
        m1 = d2[..., bit == 1].min(axis=-1)
        out.append((m1 - m0) / nvar)
    return np.stack(out, axis=-1).reshape(y.shape[:-1] + (-1,))


@pytest.mark.parametrize("mod", MODS)
def test_demap_matches_exact_maxlog(mod):
    rng = np.random.default_rng(int(mod) + 100)
    qm = bits_per_symbol(mod)
    bits = rng.integers(0, 2, size=(200 * qm,), dtype=np.uint8)
    syms = np.asarray(map_bits(bits, mod))
    noisy = syms + 0.05 * (rng.standard_normal(syms.shape) + 1j * rng.standard_normal(syms.shape))
    noisy = noisy.astype(np.complex64)
    nvar = np.full(noisy.shape, 0.005, dtype=np.float32)
    got = np.asarray(demap_soft(noisy, nvar, mod))
    want = _brute_force_llr(noisy, mod, 0.005)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_pi2_bpsk_rotation():
    bits = np.array([0, 0, 1, 1], dtype=np.uint8)
    syms = np.asarray(map_bits(bits, Modulation.PI_2_BPSK))
    np.testing.assert_allclose(syms[0], (1 + 1j) / np.sqrt(2), rtol=1e-6)
    # Odd symbols rotated by pi/2: j*(1+j)/sqrt(2) = (-1+j)/sqrt(2).
    np.testing.assert_allclose(syms[1], (-1 + 1j) / np.sqrt(2), rtol=1e-6)
    nvar = np.full(syms.shape, 0.1, dtype=np.float32)
    llrs = np.asarray(demap_soft(syms, nvar, Modulation.PI_2_BPSK))
    np.testing.assert_array_equal((llrs < 0).astype(np.uint8), bits)


def test_quantize_llr():
    x = np.array([0.0, 1.0, -1.0, 100.0, -100.0], dtype=np.float32)
    q = np.asarray(quantize_llr(x, range_limit=20.0))
    assert q.dtype == np.int8
    assert q[0] == 0 and q[3] == 120 and q[4] == -120
    assert q[1] == round(120 / 20) and q[2] == -round(120 / 20)


def test_evm_and_hard_decision():
    from srsran_project_tpu.ops.modulation.evm import evm, hard_decision_bits

    rng = np.random.default_rng(9)
    bits = rng.integers(0, 2, size=(60 * 4,), dtype=np.uint8)
    syms = np.asarray(map_bits(bits, Modulation.QAM16))
    noisy = syms + 0.03 * (rng.standard_normal(syms.shape) + 1j * rng.standard_normal(syms.shape))
    noisy = noisy.astype(np.complex64)
    e_known = float(np.asarray(evm(noisy, Modulation.QAM16, reference=syms)))
    e_dd = float(np.asarray(evm(noisy, Modulation.QAM16)))
    assert 0.02 < e_known < 0.07
    assert abs(e_known - e_dd) < 0.01  # no decision errors at this SNR
    hard = np.asarray(hard_decision_bits(noisy, Modulation.QAM16))
    np.testing.assert_array_equal(hard, bits)
