"""PUCCH Format 2 loopback and transform precoding."""

import numpy as np
import pytest

from srsran_project_tpu.ops import transform_precoding as tp
from srsran_project_tpu.phy import pucch_f2


@pytest.mark.parametrize("nof_bits", [3, 8, 11, 16, 30])
def test_pucch_f2_loopback(nof_bits):
    cfg = pucch_f2.PucchFormat2Config(
        rb_start=4, rb_count=4, start_symbol=12, nof_symbols=2,
        nof_uci_bits=nof_bits, rnti=0x1234, n_id=7, n_id0=9, slot_in_frame=3,
    )
    rng = np.random.default_rng(nof_bits)
    bits = rng.integers(0, 2, size=(nof_bits,), dtype=np.uint8)
    grid = pucch_f2.generate(cfg, bits)[None]  # 1 rx port
    h = 0.8 * np.exp(1j * 0.5)
    noisy = h * grid + 0.02 * (
        rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)
    ).astype(np.complex64)
    got, ok, snr_db = pucch_f2.process(noisy.astype(np.complex64), cfg)
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(got), bits)
    assert float(snr_db) > 10


def test_transform_precoding_roundtrip():
    rng = np.random.default_rng(0)
    for n_prb in (1, 2, 3, 4, 5, 6, 8, 25):
        assert tp.is_valid_nof_prb(n_prb)
        m = n_prb * 12
        x = (rng.standard_normal((4, m)) + 1j * rng.standard_normal((4, m))).astype(np.complex64)
        y = np.asarray(tp.precode(x))
        back = np.asarray(tp.deprecode(y))
        np.testing.assert_allclose(back, x, atol=1e-4)
        # Unitary: power preserved.
        np.testing.assert_allclose(
            (np.abs(y) ** 2).sum(), (np.abs(x) ** 2).sum(), rtol=1e-5
        )
    assert not tp.is_valid_nof_prb(7)
    assert not tp.is_valid_nof_prb(11)
