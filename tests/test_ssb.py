"""SSB: PSS/SSS sequence properties, PBCH encode/decode round trip,
grid layout."""

import numpy as np
import pytest

from srsran_project_tpu.phy import ssb


def test_pss_properties():
    for nid2 in range(3):
        d = ssb.pss_sequence(nid2)
        assert d.shape == (127,)
        assert set(np.unique(d)) <= {-1.0, 1.0}
    # Different NID2 -> low cross-correlation.
    c = abs(np.dot(ssb.pss_sequence(0), ssb.pss_sequence(1)))
    assert c < 30


def test_sss_distinguishes_cells():
    a = ssb.sss_sequence(0, 0)
    b = ssb.sss_sequence(5, 1)
    assert abs(np.dot(a, b)) < 40
    assert abs(np.dot(a, a)) == 127


@pytest.mark.parametrize("pci,ssb_idx", [(0, 0), (123, 3), (1007, 7)])
def test_pbch_roundtrip(pci, ssb_idx):
    cfg = ssb.SsbConfig(pci=pci, ssb_index=ssb_idx, sfn_2lsb=2)
    rng = np.random.default_rng(pci)
    payload = rng.integers(0, 2, size=(32,), dtype=np.uint8)
    coded = np.asarray(ssb.encode_pbch(payload, cfg))
    assert coded.shape == (864,)
    llr = np.where(coded == 0, 8.0, -8.0).astype(np.float32)
    got, ok = ssb.decode_pbch(llr, cfg)
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(got), payload)


def test_pbch_roundtrip_awgn():
    cfg = ssb.SsbConfig(pci=500, ssb_index=1)
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 2, size=(32,), dtype=np.uint8)
    coded = np.asarray(ssb.encode_pbch(payload, cfg)).astype(np.float32)
    x = 1.0 - 2.0 * coded
    sigma = 0.5
    y = x + sigma * rng.standard_normal(x.shape).astype(np.float32)
    got, ok = ssb.decode_pbch(2 * y / sigma**2, cfg)
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(got), payload)


def test_ssb_grid_layout():
    cfg = ssb.SsbConfig(pci=42)
    payload = np.zeros(32, dtype=np.uint8)
    grid = np.asarray(ssb.assemble_ssb(payload, cfg))
    assert grid.shape == (4, 240)
    # PSS present on symbol 0, zero outside.
    assert np.abs(grid[0, 56:183]).min() > 0.9
    assert np.abs(grid[0, :56]).max() == 0
    assert np.abs(grid[0, 183:]).max() == 0
    # SSS on symbol 2 center; PBCH fills symbols 1 and 3 fully.
    assert np.abs(grid[2, 56:183]).min() > 0.9
    assert (np.abs(grid[1]) > 0).all()
    assert (np.abs(grid[3]) > 0).all()
    # Symbol 2 side bands carry PBCH, the gap around SSS is empty.
    assert (np.abs(grid[2, :48]) > 0).all()
    assert (np.abs(grid[2, 192:]) > 0).all()
    assert np.abs(grid[2, 48:56]).max() == 0
