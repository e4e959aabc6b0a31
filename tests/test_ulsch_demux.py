"""UL-SCH multiplexing: data + HARQ-ACK + CSI1 mux/demux inversion and
decodability of all parts through a noisy channel."""

import numpy as np
import pytest

from srsran_project_tpu.phy import ulsch_demux as ud
from srsran_project_tpu.phy.allocation import Allocation


def _cfg(g_ack=0, g_csi1=0, qm=2, nl=1):
    alloc = Allocation(rb_start=0, rb_count=12, sym_start=0, sym_count=14, dmrs_symbols=(2,))
    return ud.UlschMuxConfig(alloc=alloc, qm=qm, nof_layers=nl,
                             nof_grid_symbols=14, nof_grid_sc=624,
                             g_ack=g_ack, g_csi1=g_csi1)


def test_mux_demux_positions_disjoint():
    cfg = _cfg(g_ack=60, g_csi1=100)
    ack_pos, csi_pos = ud._positions(cfg)
    assert len(ack_pos) == 60 and len(csi_pos) == 100
    assert len(np.intersect1d(ack_pos, csi_pos)) == 0
    assert ack_pos.max() < cfg.g_total


def test_roundtrip_with_uci():
    cfg = _cfg(g_ack=64, g_csi1=128)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 2, size=(cfg.g_total - cfg.g_csi1,), dtype=np.uint8)
    ack = rng.integers(0, 2, size=(2,), dtype=np.uint8)
    csi = rng.integers(0, 2, size=(8,), dtype=np.uint8)
    stream = np.asarray(ud.multiplex(data, ack, csi, cfg))
    assert stream.shape == (cfg.g_total,)

    llr = np.where(stream == 0, 20.0, -20.0).astype(np.float32)
    import jax.numpy as jnp

    data_llr, ack_llr, csi_llr = ud.demultiplex(jnp.asarray(llr), cfg)
    parts = ud.decode_uci_parts(ack_llr, csi_llr, 2, 8)
    bits, ok = parts["ack"]
    np.testing.assert_array_equal(np.asarray(bits), ack)
    bits, ok = parts["csi1"]
    np.testing.assert_array_equal(np.asarray(bits), csi)

    # Data stream: punctured ACK positions are erased, everything else intact.
    d = np.asarray(data_llr)
    assert d.shape == (cfg.g_total - cfg.g_csi1,)
    hard = (d < 0).astype(np.uint8)
    erased = d == 0
    np.testing.assert_array_equal(hard[~erased], data[~erased])
    assert erased.sum() == cfg.g_ack


def test_no_uci_passthrough():
    cfg = _cfg()
    rng = np.random.default_rng(1)
    data = rng.integers(0, 2, size=(cfg.g_total,), dtype=np.uint8)
    stream = np.asarray(ud.multiplex(data, None, None, cfg))
    np.testing.assert_array_equal(stream, data)
