"""Parity of the fused rate-dematch + LDPC decode Pallas kernel against the
two-stage path (rate_dematch -> decode), in interpret mode on CPU.

The fused kernel assembles the TS 38.212 §5.4.2 circular buffer in VMEM
from the qm de-interleave bit-planes (see sch._fused_decode); these tests
pin bit-exactness of the assembled-buffer semantics — erasures, fillers,
low-E zero-padding to the high-E map, rv offsets, LBRM n_cb — against the
golden-tested two-stage implementation.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from srsran_project_tpu.ops.ldpc import decoder as ldpc_decoder
from srsran_project_tpu.ops.ldpc import rate_match as rm
from srsran_project_tpu.phy import sch as sch_mod
from srsran_project_tpu.phy.sch import SchConfig


def _llr_stream(cfg: SchConfig, seed: int = 0) -> jnp.ndarray:
    """Noisy int8 LLRs of a random TB's rate-matched codeword."""
    rng = np.random.default_rng(seed)
    tb = jnp.asarray(rng.integers(0, 2, size=(cfg.tbs,), dtype=np.uint8))
    cw = np.asarray(sch_mod.encode_transport_block(tb, cfg))
    llr = (1.0 - 2.0 * cw.astype(np.float32)) * 14.0
    llr = llr + rng.normal(0.0, 4.0, size=llr.shape)
    return tb, jnp.asarray(np.clip(np.round(llr), -120, 120).astype(np.int8))


def _two_stage_bits(llrs, cfg: SchConfig, iters: int):
    """Reference: rate_dematch -> float min-sum decode (decoder.decode has
    identical numerics to the Pallas kernel; existing tests pin that)."""
    seg = cfg.seg
    buf, _ = sch_mod._dematch_stage(llrs, None, cfg)
    flat = buf.reshape((-1,) + buf.shape[-1:]).astype(jnp.float32)
    bits, _ = ldpc_decoder.decode(flat, seg.base_graph, seg.lifting_size, iters)
    return np.asarray(bits)


def _fused_bits(llrs, cfg: SchConfig, iters: int):
    bits, _ = sch_mod._fused_decode(llrs, cfg, iters, early_stop=False,
                                    interpret=True)
    return np.asarray(bits)


CASES = [
    # (tbs, rate, qm, nl, g_extra_units, rv, lbrm) — chosen so both
    # single-group and two-E-group splits, BG1 and BG2, rv!=0 and LBRM
    # geometries are covered.
    pytest.param(dict(tbs=3000, target_code_rate=0.5, qm=4, nof_layers=1,
                      nof_total_bits=6000, rv=0, tbs_lbrm_bytes=None),
                 id="bg1-single-cb"),
    pytest.param(dict(tbs=9000, target_code_rate=0.45, qm=8, nof_layers=2,
                      nof_total_bits=20032, rv=0, tbs_lbrm_bytes=None),
                 id="bg1-two-cbs-two-e-groups"),
    pytest.param(dict(tbs=2000, target_code_rate=0.2, qm=2, nof_layers=1,
                      nof_total_bits=9000, rv=0, tbs_lbrm_bytes=None),
                 id="bg2-low-rate"),
    pytest.param(dict(tbs=9000, target_code_rate=0.45, qm=8, nof_layers=2,
                      nof_total_bits=20032, rv=2, tbs_lbrm_bytes=None),
                 id="bg1-rv2"),
    pytest.param(dict(tbs=9000, target_code_rate=0.45, qm=8, nof_layers=2,
                      nof_total_bits=20032, rv=0, tbs_lbrm_bytes=2000),
                 id="bg1-lbrm"),
]


@pytest.mark.parametrize("kw", CASES)
def test_fused_matches_two_stage(kw):
    cfg = SchConfig(**kw)
    assert sch_mod._fused_decode_ok(cfg), "case must be repetition-free"
    tb, llrs = _llr_stream(cfg)
    ref = _two_stage_bits(llrs, cfg, 4)
    got = _fused_bits(llrs, cfg, 4)
    np.testing.assert_array_equal(got, ref)


def _position_llrs(cfg: SchConfig) -> jnp.ndarray:
    """Deterministic position-DEPENDENT LLRs: any permutation error in the
    buffer assembly flips hard decisions (a noisy-codeword comparison lets
    the decoder CORRECT small misplacements — this caught the round-5
    low-E-group map bug that the decoded-bits tests missed)."""
    g = cfg.nof_total_bits
    v = (np.arange(g, dtype=np.int64) * 37 + 11) % 199 - 99
    v[v == 0] = 7
    return jnp.asarray(np.clip(v, -120, 120).astype(np.int8))


@pytest.mark.parametrize("kw", CASES)
def test_fused_assembly_zero_iterations(kw):
    """iters=0 compares the assembled circular buffer's hard decisions
    directly — pins the dematch map itself, not just decoder output."""
    cfg = SchConfig(**kw)
    llrs = _position_llrs(cfg)
    ref = _two_stage_bits(llrs, cfg, 0)
    got = _fused_bits(llrs, cfg, 0)
    np.testing.assert_array_equal(got, ref)


def test_fused_assembly_flagship_geometry():
    """The 100 MHz 4x4 flagship coding geometry (141 CBs, BG1 Z=384, LBRM,
    two E-groups) — assembly parity at zero iterations."""
    from srsran_project_tpu.models import cell as cell_mod

    cfg = cell_mod.CellConfig().pusch_cfg.sch
    llrs = _position_llrs(cfg)
    ref = _two_stage_bits(llrs, cfg, 0)
    got = _fused_bits(llrs, cfg, 0)
    np.testing.assert_array_equal(got, ref)


def test_fused_full_decode_crc_ok():
    """End-to-end: fused bits -> desegment recovers the TB with CRC OK."""
    cfg = SchConfig(tbs=9000, target_code_rate=0.45, qm=8, nof_layers=2,
                    nof_total_bits=20032, rv=0, tbs_lbrm_bytes=None)
    tb, llrs = _llr_stream(cfg, seed=3)
    bits, _ = sch_mod._fused_decode(llrs, cfg, 6, early_stop=False,
                                    interpret=True)
    tb_out, ok = sch_mod._desegment_stage(
        jnp.asarray(bits), cfg, llrs.shape[:-1])
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(tb_out), np.asarray(tb))


def test_fused_batched_leading_dim():
    """Leading batch dims flow through the plane extraction like the
    two-stage path's (-1, N) collapse."""
    cfg = SchConfig(tbs=3000, target_code_rate=0.5, qm=4, nof_layers=1,
                    nof_total_bits=6000, rv=0, tbs_lbrm_bytes=None)
    _, l0 = _llr_stream(cfg, seed=1)
    _, l1 = _llr_stream(cfg, seed=2)
    llrs = jnp.stack([l0, l1])
    ref = _two_stage_bits(llrs, cfg, 4)
    got = _fused_bits(llrs, cfg, 4)
    np.testing.assert_array_equal(got, ref)


def test_repetition_falls_back():
    """E above the usable buffer (repetition) is excluded from the fused
    path by _fused_decode_ok."""
    cfg = SchConfig(tbs=300, target_code_rate=0.1, qm=2, nof_layers=1,
                    nof_total_bits=4000, rv=0, tbs_lbrm_bytes=None)
    usable = sum(ln for _, ln in rm._valid_runs(
        cfg.seg.base_graph, cfg.seg.lifting_size,
        cfg.seg.nof_payload_bits_per_cb, 0, cfg.seg.full_codeword_bits))
    if max(cfg.cb_e_bits) > usable:
        assert not sch_mod._fused_decode_ok(cfg)
    else:
        pytest.skip("geometry not repetitive; adjust case")
