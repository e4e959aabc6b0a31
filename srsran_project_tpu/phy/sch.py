"""Shared-channel transport coding: TB bits <-> codeword bits/LLRs.

The common core of the PDSCH encoder chain (reference:
pdsch_processor_impl.cpp:42 — CRC -> LDPC segment/encode -> rate match) and
the PUSCH decoder chain (pusch_decoder_impl.cpp — rate dematch -> HARQ
combine -> LDPC decode -> CRC), with the per-codeblock E_r split of
TS 38.212 §5.4.2.1.  All geometry is static per `SchConfig`; codeblocks
batch along a leading axis on device.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..ops.ldpc import decoder as ldpc_decoder
from ..ops.ldpc import decoder_pallas as ldpc_decoder_pallas
from ..ops.ldpc import encoder as ldpc_encoder
from ..ops.ldpc import rate_match as rm
from ..ops.ldpc import segmenter
from ..ops import crc as crc_mod
from ..support.staging import checkpoint


def _use_pallas_decoder() -> bool:
    """Pallas kernel on real TPU (25x the XLA gather/scatter version);
    XLA path on CPU (pallas interpret mode is far slower there)."""
    import jax

    return jax.devices()[0].platform != "cpu"


@dataclasses.dataclass(frozen=True)
class SchConfig:
    """Static transport-block coding configuration."""

    tbs: int
    target_code_rate: float  # R (for BG/segmentation selection)
    qm: int  # modulation order
    nof_layers: int
    nof_total_bits: int  # G: total rate-matched bits for this codeword
    rv: int = 0
    # TBS_LBRM for limited-buffer rate matching (TS 38.212 5.4.2.1);
    # the reference default (sch_constants.h:44).  None = unlimited buffer.
    tbs_lbrm_bytes: int | None = 159749
    # LDPC decoder kernel: "auto" = Pallas min-sum on TPU / XLA float
    # min-sum on CPU (throughput path); "reference_i8" = bit-exact int8
    # layered min-sum with the reference's saturation semantics
    # (ldpc_decoder_generic.cpp — conformance / parity-debug path).
    decoder: str = "auto"

    @functools.cached_property
    def seg(self) -> segmenter.SegmentParams:
        return segmenter.compute_segment_params(self.tbs, self.target_code_rate)

    @functools.cached_property
    def n_cb(self) -> int | None:
        """Circular-buffer length min(N, N_ref); None = full N (so the
        rate matcher's default path stays untouched when unlimited)."""
        if self.tbs_lbrm_bytes is None:
            return None
        n = self.seg.full_codeword_bits
        n_ref = min(self.tbs_lbrm_bytes * 8 * 3 // (2 * self.seg.nof_codeblocks),
                    25344)  # ldpc::MAX_CODEBLOCK_SIZE
        return n_ref if n_ref < n else None

    @functools.cached_property
    def cb_e_bits(self) -> tuple[int, ...]:
        """Per-codeblock rate-matched length E_r (TS 38.212 §5.4.2.1)."""
        c = self.seg.nof_codeblocks
        g = self.nof_total_bits
        unit = self.qm * self.nof_layers
        assert g % unit == 0, (g, unit)
        lo = unit * (g // (unit * c))
        hi = lo + unit
        nof_hi = (g // unit) % c
        return tuple([lo] * (c - nof_hi) + [hi] * nof_hi)


def _e_groups(cb_e_bits):
    """Codeblocks grouped by equal E: [(start, count, e)], contiguous
    (TS 38.212 puts all low-E blocks first)."""
    groups = []
    start = 0
    for e in cb_e_bits:
        if groups and groups[-1][2] == e:
            s, c, _ = groups[-1]
            groups[-1] = (s, c + 1, e)
        else:
            groups.append((start, 1, e))
        start += 1
    return groups


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_transport_block(tb_bits: jax.Array, cfg: SchConfig) -> jax.Array:
    """TB payload (..., A) -> codeword bits (..., G).

    One compiled program (segment + CRC + LDPC encode + rate match):
    per-program dispatch overhead on the TPU tunnel makes eager glue
    between sub-blocks cost more than the compute itself."""
    seg = cfg.seg
    cbs = segmenter.segment_tx(tb_bits, seg)  # (..., C, K)
    buf = ldpc_encoder.encode_to_buffer(cbs, seg.base_graph, seg.lifting_size,
                                        n_cb=cfg.n_cb)
    k_prime = seg.nof_payload_bits_per_cb
    pieces = []
    for start, count, e in _e_groups(cfg.cb_e_bits):
        grp = rm.rate_match(
            buf[..., start : start + count, :],
            seg.base_graph,
            seg.lifting_size,
            k_prime,
            e,
            cfg.rv,
            cfg.qm,
            cfg.n_cb,
        )  # (..., count, e)
        pieces.append(grp.reshape(grp.shape[:-2] + (count * e,)))
    return jnp.concatenate(pieces, axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _dematch_stage(llrs: jax.Array, harq_buffer, cfg: SchConfig):
    """Rate dematch + HARQ combine + flatten, one compiled program.

    harq_buffer may be None (its None-ness is pytree structure, so the two
    cases compile separately).  Returns (new_harq (..., C, N) int8,
    flat (C', N) float32 decoder input)."""
    seg = cfg.seg
    k_prime = seg.nof_payload_bits_per_cb
    dematched = []
    off = 0
    for start, count, e in _e_groups(cfg.cb_e_bits):
        span = llrs[..., off : off + count * e]
        span = span.reshape(span.shape[:-1] + (count, e))
        dematched.append(
            rm.rate_dematch(
                span, seg.base_graph, seg.lifting_size, k_prime, e, cfg.rv, cfg.qm,
                cfg.n_cb,
            )
        )
        off += count * e
    buf = jnp.concatenate(dematched, axis=-2)  # (..., C, N)
    if harq_buffer is not None:
        buf = rm.combine_harq(harq_buffer, buf)
    flat = buf.reshape((-1,) + buf.shape[-1:]).astype(jnp.float32)
    return buf, flat


@functools.lru_cache(maxsize=None)
def _fused_decode_ok(cfg: SchConfig) -> bool:
    """The fused dematch+decode kernel covers the no-repetition case (every
    E_r fits one pass over the usable circular buffer, the overwhelmingly
    common geometry); repetition falls back to the two-stage path."""
    seg = cfg.seg
    k_prime = seg.nof_payload_bits_per_cb
    n_cb = cfg.n_cb or seg.full_codeword_bits
    usable = sum(ln for _, ln in rm._valid_runs(
        seg.base_graph, seg.lifting_size, k_prime, cfg.rv, n_cb))
    return max(cfg.cb_e_bits) <= usable


def _fused_decode(llrs: jax.Array, cfg: SchConfig, nof_iterations: int,
                  early_stop: bool, interpret: bool = False):
    """Rate dematch + LDPC decode with the fused Pallas kernel: the qm
    de-interleave bit-planes are extracted as whole-stream strided slices
    (one XLA op each — replacing the measured 0.21 ms/slot of per-codeblock
    int8 transpose/concat glue), and the kernel assembles the circular
    buffer in VMEM (the (C, N) HBM buffer round trip disappears).

    One kernel call per E-group: the de-interleave stride is E/qm, so the
    de-stream -> buffer map is E-specific — a low-E codeblock folded into
    the high-E map lands ~qm*nl interior LLRs on the wrong buffer
    positions (a bug the LDPC decoder quietly corrected at high SNR; the
    zero-iteration parity tests in tests/test_fused_dematch_decode.py now
    pin the assembly itself).

    Returns (bits (lead*C, K) rows flattened like the two-stage path,
    iters (lead*C,)).
    """
    seg = cfg.seg
    qm = cfg.qm
    n_cb = cfg.n_cb or seg.full_codeword_bits
    bits_groups, iters_groups = [], []
    off = 0
    for _start, count, e in _e_groups(cfg.cb_e_bits):
        span = llrs[..., off : off + count * e]
        p = span.reshape(span.shape[:-1] + (count, e // qm, qm))
        planes = tuple(p[..., b].reshape((-1, e // qm)) for b in range(qm))
        bits_g, iters_g = ldpc_decoder_pallas.decode_dematch_pallas(
            planes, seg.base_graph, seg.lifting_size,
            seg.nof_payload_bits_per_cb, e, cfg.rv, qm, n_cb,
            nof_iterations, early_stop=early_stop, interpret=interpret)
        bits_groups.append(bits_g.reshape(span.shape[:-1] + (count, -1)))
        iters_groups.append(iters_g.reshape(span.shape[:-1] + (count,)))
        off += count * e
    bits = jnp.concatenate(bits_groups, axis=-2)  # (..., C, K)
    iters = jnp.concatenate(iters_groups, axis=-1)
    return (bits.reshape((-1,) + bits.shape[-1:]),
            iters.reshape(-1))


@functools.partial(jax.jit, static_argnames=("cfg", "lead_shape"))
def _desegment_stage(bits: jax.Array, cfg: SchConfig, lead_shape: tuple):
    """CB reshape + TB desegmentation + CRC verdict, one compiled program."""
    seg = cfg.seg
    bits = bits.reshape(lead_shape + (seg.nof_codeblocks, bits.shape[-1]))
    return segmenter.desegment_rx(bits, seg)


def decode_transport_block(
    llrs: jax.Array,
    cfg: SchConfig,
    nof_iterations: int = 6,
    harq_buffer: jax.Array | None = None,
    early_stop: bool = False,
):
    """Codeword LLRs (..., G) int8 -> (tb_bits (..., A), tb_crc_ok (...,),
    new_harq_buffer (..., C, N)).

    harq_buffer holds accumulated codeword-buffer LLRs from earlier
    (re)transmissions; pass None for a new transmission.
    """
    seg = cfg.seg
    if (harq_buffer is None and cfg.decoder != "reference_i8"
            and _use_pallas_decoder() and llrs.dtype == jnp.int8
            and _fused_decode_ok(cfg)):
        # Hot path: dematch fused into the Pallas decode kernel.  The HARQ
        # buffer is still produced through the two-stage dematch for
        # callers that keep it (process()/finish() retransmission state);
        # fused slot programs that drop it get the whole computation DCE'd.
        bits, _iters = _fused_decode(llrs, cfg, nof_iterations, early_stop)
        new_harq, _ = _dematch_stage(llrs, None, cfg)
        tb, ok = _desegment_stage(bits, cfg, llrs.shape[:-1])
        return tb, ok, new_harq
    new_harq, flat = checkpoint(_dematch_stage(llrs, harq_buffer, cfg))
    buf = new_harq

    def run_decode(llr_in, iters, kernel_early_stop=False):
        if cfg.decoder == "reference_i8":
            return ldpc_decoder.decode_i8(
                llr_in, seg.base_graph, seg.lifting_size, iters
            )[0]
        if _use_pallas_decoder():
            return ldpc_decoder_pallas.decode_pallas(
                llr_in, seg.base_graph, seg.lifting_size, iters,
                early_stop=kernel_early_stop, bits_only=True,
                n_cb=cfg.n_cb,
            )[0]
        return ldpc_decoder.decode(llr_in, seg.base_graph, seg.lifting_size, iters)[0]

    llr_f = flat
    if _use_pallas_decoder() and cfg.decoder != "reference_i8":
        # int8 LLRs straight into the Pallas kernel: the decode was
        # measured HBM-bound on its f32 LLR read + f32 a-posteriori write
        # at the x32 slot batch; int8 in + hard-bits-only out cuts the
        # kernel's HBM traffic ~6x (numerics identical: the kernel clamps
        # to +-64 after the in-VMEM cast and int8 is within +-127).
        llr_f = buf.reshape((-1,) + buf.shape[-1:])
    if cfg.decoder == "reference_i8":
        # Keep the integer lanes: decode_i8 applies the reference's own
        # +-64 input clamp (ldpc_decoder_impl.h:205).
        llr_f = buf.reshape((-1,) + buf.shape[-1:]).astype(jnp.int32)
    if early_stop and _use_pallas_decoder():
        # On-device syndrome early stop inside the Pallas kernel: exits the
        # iteration while_loop per batch tile once all checks pass.  Unlike
        # the two-phase CRC gate below, this survives vmap (the loop is
        # inside the kernel, not in the traced program).
        bits = run_decode(llr_f, nof_iterations, kernel_early_stop=True)
    elif early_stop and nof_iterations > 2:
        # CRC-gated two-phase decode (the reference's per-iteration CRC
        # early stop, adapted to static shapes): try 2 iterations; only if
        # any codeblock's CRC still fails run the full budget.  At
        # operating SNR most slots take the short path.  NOTE: under vmap
        # the cond lowers to a select (both phases run) — leave disabled
        # for batched-throughput paths.
        bits2 = run_decode(llr_f, 2)
        k_prime = seg.nof_payload_bits_per_cb
        crc_name = "24B" if seg.nof_codeblocks > 1 else seg.tb_crc
        nof_bad = crc_mod.crc(bits2[..., :k_prime], crc_name).astype(jnp.int32).sum()
        bits = jax.lax.cond(
            nof_bad == 0, lambda: bits2, lambda: run_decode(llr_f, nof_iterations)
        )
    else:
        bits = run_decode(llr_f, nof_iterations)
    checkpoint(bits)
    tb, ok = _desegment_stage(bits, cfg, buf.shape[:-2])
    return tb, ok, new_harq


def decode_from_planes(planes: jax.Array, cfg: SchConfig,
                       nof_iterations: int = 6, early_stop: bool = False,
                       interpret: bool = False):
    """Decode straight from (qm, G/qm) de-interleave bit-planes (the
    output of pusch._front_end_planes): per-E-group static plane slices
    feed the fused dematch+decode kernel — no (G,) stream, no plane
    extraction, no HARQ buffer (hot-path only; retransmissions take the
    stream path).  Returns (tb_bits, tb_crc_ok)."""
    seg = cfg.seg
    qm = cfg.qm
    n_cb = cfg.n_cb or seg.full_codeword_bits
    bits_groups = []
    off = 0
    for _start, count, e in _e_groups(cfg.cb_e_bits):
        j0, j1 = off // qm, (off + count * e) // qm
        pl_t = tuple(planes[b, j0:j1].reshape(count, e // qm)
                     for b in range(qm))
        bits_g, _iters = ldpc_decoder_pallas.decode_dematch_pallas(
            pl_t, seg.base_graph, seg.lifting_size,
            seg.nof_payload_bits_per_cb, e, cfg.rv, qm, n_cb,
            nof_iterations, early_stop=early_stop, interpret=interpret)
        bits_groups.append(bits_g)
        off += count * e
    bits = jnp.concatenate(bits_groups, axis=0)
    return _desegment_stage(bits, cfg, ())
