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

    data_llr, ack_llr, csi_llr, _ = ud.demultiplex(jnp.asarray(llr), cfg)
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


def _cfg2(g_ack=0, g_csi1=0, nof_ack_bits=0, g_ack_rvd=0, qm=2, nl=1):
    alloc = Allocation(rb_start=0, rb_count=12, sym_start=0, sym_count=14, dmrs_symbols=(2,))
    return ud.UlschMuxConfig(alloc=alloc, qm=qm, nof_layers=nl,
                             nof_grid_symbols=14, nof_grid_sc=624,
                             g_ack=g_ack, g_csi1=g_csi1,
                             nof_ack_bits=nof_ack_bits, g_ack_rvd=g_ack_rvd)


def test_ack_starts_after_first_dmrs_run():
    cfg = _cfg2(g_ack=24, nof_ack_bits=5)
    ack_pos, _, _, _ = ud._layout(cfg)
    # alloc has dmrs at symbol 2; ACK REs must live on symbols > 2.
    bpre = cfg.qm * cfg.nof_layers
    from srsran_project_tpu.phy import allocation as alloc_mod
    didx = alloc_mod.data_re_indices(cfg.alloc, 14, 624)
    sym = didx[ack_pos // bpre] // 624
    assert (sym > 2).all()


def test_csi_starts_at_first_data_symbol():
    cfg = _cfg2(g_csi1=24)
    _, csi_pos, _, _ = ud._layout(cfg)
    from srsran_project_tpu.phy import allocation as alloc_mod
    didx = alloc_mod.data_re_indices(cfg.alloc, 14, 624)
    sym = didx[csi_pos // (cfg.qm * cfg.nof_layers)] // 624
    assert sym.min() == 0  # first data symbol


def test_even_spreading_within_symbol():
    # 4 REs worth of ACK on a symbol with 144 data REs -> stride 36.
    cfg = _cfg2(g_ack=8, nof_ack_bits=5)
    ack_pos, _, _, _ = ud._layout(cfg)
    res = np.unique(ack_pos // 2)
    assert len(res) == 4
    strides = np.diff(np.sort(res))
    assert (strides == strides[0]).all()


def test_rate_matched_ack_roundtrip():
    # >2 ACK bits: data is rate-matched around the ACK REs (no erasures).
    cfg = _cfg2(g_ack=96, g_csi1=64, nof_ack_bits=6)
    assert not cfg.ack_punctures
    assert cfg.nof_data_bits == cfg.g_total - 96 - 64
    rng = np.random.default_rng(0)
    data = rng.integers(0, 2, size=(cfg.nof_data_bits,), dtype=np.uint8)
    ack = rng.integers(0, 2, size=(6,), dtype=np.uint8)
    csi = rng.integers(0, 2, size=(8,), dtype=np.uint8)
    stream = np.asarray(ud.multiplex(data, ack, csi, cfg))
    llr = np.where(stream == 0, 20.0, -20.0).astype(np.float32)
    import jax.numpy as jnp
    data_llr, ack_llr, csi_llr, _ = ud.demultiplex(jnp.asarray(llr), cfg)
    parts = ud.decode_uci_parts(ack_llr, csi_llr, 6, 8)
    np.testing.assert_array_equal(np.asarray(parts["ack"][0]), ack)
    np.testing.assert_array_equal(np.asarray(parts["csi1"][0]), csi)
    d = np.asarray(data_llr)
    assert d.shape == (cfg.nof_data_bits,)
    assert (d != 0).all()  # nothing erased in rate-match mode
    np.testing.assert_array_equal((d < 0).astype(np.uint8), data)


def test_reserved_layout_puncture_mode():
    # 1-bit ACK with a 2-bit-sized reserved layout: data maps through the
    # reserved REs, actual ACK punctures only the first g_ack bits.
    cfg = _cfg2(g_ack=4, g_ack_rvd=8, nof_ack_bits=1)
    assert cfg.ack_punctures
    assert cfg.nof_data_bits == cfg.g_total  # no CSI, data everywhere
    ack_pos, _, _, data_idx = ud._layout(cfg)
    assert len(ack_pos) == 4
    assert len(data_idx) == cfg.g_total
    rng = np.random.default_rng(1)
    data = rng.integers(0, 2, size=(cfg.nof_data_bits,), dtype=np.uint8)
    ack = np.array([1], dtype=np.uint8)
    stream = np.asarray(ud.multiplex(data, ack, None, cfg))
    llr = np.where(stream == 0, 20.0, -20.0).astype(np.float32)
    import jax.numpy as jnp
    data_llr, ack_llr, _, _ = ud.demultiplex(jnp.asarray(llr), cfg)
    d = np.asarray(data_llr)
    assert (d == 0).sum() == 4  # punctured positions erased


def test_csi2_stream_roundtrip():
    # All three UCI streams + data: CSI2 maps around CSI1 and (rate-match
    # mode) around ACK; everything decodes and data is intact.
    cfg = _cfg2(g_ack=96, g_csi1=64, nof_ack_bits=6)
    import dataclasses
    cfg = dataclasses.replace(cfg, g_csi2=48)
    assert cfg.nof_data_bits == cfg.g_total - 96 - 64 - 48
    rng = np.random.default_rng(9)
    data = rng.integers(0, 2, size=(cfg.nof_data_bits,), dtype=np.uint8)
    ack = rng.integers(0, 2, size=(6,), dtype=np.uint8)
    csi1 = rng.integers(0, 2, size=(8,), dtype=np.uint8)
    csi2 = rng.integers(0, 2, size=(5,), dtype=np.uint8)
    stream = np.asarray(ud.multiplex(data, ack, csi1, cfg, csi2_bits=csi2))
    llr = np.where(stream == 0, 20.0, -20.0).astype(np.float32)
    import jax.numpy as jnp
    data_llr, ack_llr, csi_llr, csi2_llr = ud.demultiplex(jnp.asarray(llr), cfg)
    parts = ud.decode_uci_parts(ack_llr, csi_llr, 6, 8, csi2_llrs=csi2_llr,
                                nof_csi2_bits=5)
    np.testing.assert_array_equal(np.asarray(parts["ack"][0]), ack)
    np.testing.assert_array_equal(np.asarray(parts["csi1"][0]), csi1)
    np.testing.assert_array_equal(np.asarray(parts["csi2"][0]), csi2)
    np.testing.assert_array_equal(
        (np.asarray(data_llr) < 0).astype(np.uint8), data)


def test_csi2_punctured_by_reserved_ack():
    # Puncture mode: CSI2 may sit on reserved-ACK REs; the actual ACK bits
    # erase those positions in the CSI2 stream on RX.
    cfg = _cfg2(g_ack=4, g_ack_rvd=8, nof_ack_bits=1)
    import dataclasses
    cfg = dataclasses.replace(cfg, g_csi2=600)  # big enough to overlap l1
    ack_pos, _, csi2_pos, _ = ud._layout(cfg)
    overlap = np.intersect1d(ack_pos, csi2_pos)
    rng = np.random.default_rng(11)
    data = rng.integers(0, 2, size=(cfg.nof_data_bits,), dtype=np.uint8)
    ack = np.array([1], np.uint8)
    csi2 = rng.integers(0, 2, size=(11,), dtype=np.uint8)
    stream = np.asarray(ud.multiplex(data, ack, None, cfg, csi2_bits=csi2))
    llr = np.where(stream == 0, 20.0, -20.0).astype(np.float32)
    import jax.numpy as jnp
    _, ack_llr, _, csi2_llr = ud.demultiplex(jnp.asarray(llr), cfg)
    if len(overlap):
        assert (np.asarray(csi2_llr) == 0).sum() == len(overlap)
    parts = ud.decode_uci_parts(ack_llr, None, 1, 0, csi2_llrs=csi2_llr,
                                nof_csi2_bits=11)
    np.testing.assert_array_equal(np.asarray(parts["csi2"][0]), csi2)
    np.testing.assert_array_equal(np.asarray(parts["ack"][0]), ack)
