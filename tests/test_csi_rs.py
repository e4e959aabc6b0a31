"""CSI-RS generator rows 1-4."""

import numpy as np
import pytest

from srsran_project_tpu.phy import csi_rs


def _cfg(row, rb=8):
    return csi_rs.CsiRsConfig(rb_start=0, rb_count=rb, symbol=5, scrambling_id=3, row=row)


def test_row1_density3():
    g = np.asarray(csi_rs.generate(_cfg(1)))
    assert g.shape == (14, 624)
    nz = np.abs(g[5]) > 0
    assert nz.sum() == 8 * 3
    assert np.abs(g[4]).max() == 0


def test_row2_density1():
    g = np.asarray(csi_rs.generate(_cfg(2)))
    nz = np.abs(g[5]) > 0
    assert nz.sum() == 8


def test_row3_two_ports_cdm():
    g = np.asarray(csi_rs.generate(_cfg(3)))
    assert g.shape == (2, 14, 624)
    # Both ports share the same REs; CDM weights make them orthogonal.
    nz0 = np.abs(g[0, 5]) > 0
    nz1 = np.abs(g[1, 5]) > 0
    np.testing.assert_array_equal(nz0, nz1)
    assert nz0.sum() == 16
    # Orthogonality over each CDM pair: sum of p0 * conj(p1) = 0.
    vals0 = g[0, 5][nz0].reshape(-1, 2)
    vals1 = g[1, 5][nz1].reshape(-1, 2)
    dots = (vals0 * np.conj(vals1)).sum(axis=1)
    np.testing.assert_allclose(dots, 0, atol=1e-6)


def test_row4_four_ports():
    g = np.asarray(csi_rs.generate(_cfg(4)))
    assert g.shape == (4, 14, 624)
    for p in range(4):
        assert (np.abs(g[p, 5]) > 0).sum() == 16
    # Ports 0/1 occupy k0,k0+1; ports 2/3 occupy k0+2,k0+3.
    assert not (np.abs(g[0, 5]) * np.abs(g[2, 5])).any()


ROW_PORTS = {5: 4, 6: 8, 7: 8, 8: 8, 9: 12, 10: 12, 11: 16, 12: 16,
             13: 24, 14: 24, 15: 24, 16: 32, 17: 32, 18: 32}


@pytest.mark.parametrize("row", sorted(ROW_PORTS))
def test_rows_5_to_18_port_counts_and_orthogonality(row):
    cfg = csi_rs.CsiRsConfig(rb_start=0, rb_count=4, symbol=5, scrambling_id=7,
                             row=row, symbol2=9)
    assert cfg.nof_ports == ROW_PORTS[row]
    g = np.asarray(csi_rs.generate(cfg))
    assert g.shape == (ROW_PORTS[row], 14, 624)
    # every port places energy on its REs and nowhere outside its symbols
    used_syms = {s for s in range(14) if np.abs(g[:, s]).max() > 0}
    assert used_syms <= {5, 6, 7, 8, 9, 10}  # l0..l0+3 (cdm8), l1, l1+1
    # port pattern cross-correlation: ports sharing REs are CDM-orthogonal
    flat = g.reshape(g.shape[0], -1)
    gram = flat @ np.conj(flat.T)
    off = gram - np.diag(np.diag(gram))
    assert np.abs(np.diag(gram)).min() > 0
    np.testing.assert_allclose(np.abs(off), 0, atol=1e-5)


def test_row15_cdm8_time_span():
    cfg = csi_rs.CsiRsConfig(rb_start=0, rb_count=2, symbol=5, scrambling_id=1, row=15)
    g = np.asarray(csi_rs.generate(cfg))
    assert g.shape == (24, 14, 624)
    # CDM8 spans 4 symbols starting at l0
    for s in (5, 6, 7, 8):
        assert np.abs(g[:, s]).max() > 0
    assert np.abs(g[:, 4]).max() == 0 and np.abs(g[:, 9]).max() == 0
