"""OFDM modulation / demodulation (TS 38.211 §5.3-5.4).

Counterpart of the reference's ofdm_modulator/ofdm_demodulator
(lib/phy/lower/modulation/ofdm_modulator_impl.cpp:58, ofdm_demodulator_impl.cpp:96)
and its FFTW dft_processor — re-designed for TPU: one jitted program per
static (scs, dft_size, nof_rb, cp, f_center) carrier configuration processes
a whole slot of symbols as a batch.  The (I)DFT is a two-stage 64-point
matmul factorization on real TPUs (XLA's native FFT on the target backend
measured 6-9 ms per 56x4096 batch; the matmul form rides the MXU) and
jnp.fft elsewhere; the half-spectrum grid placement, per-symbol
phase-compensation coefficients (TS 38.211 §5.4) and gather-based
cyclic-prefix handling are all static tensor ops.

Conventions:
  * grid axes (..., nof_symbols, nof_subcarriers); subcarrier k sits at
    frequency (k - nsc/2) * scs relative to the carrier center;
  * modulate: x_l = scale * sum_k S_k e^{j2pi k n/N}  (i.e. N*ifft), then
    phase-compensated by exp(-j*2pi*f_center*t_l) with t_l the start time
    of symbol l's useful part within its subframe; demodulate applies the
    conjugate (reference: phase_compensation_lut.h:31).
  * default scale 1/sqrt(N) makes mod/demod a unitary pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ran.constants import (
    NRE,
    CyclicPrefix,
    SubcarrierSpacing,
    cp_lengths,
    nof_symbols_per_slot,
    sampling_rate_hz,
)


def _use_matmul_dft() -> bool:
    """MXU matmul DFT on real TPUs; XLA's native FFT elsewhere.

    Round-3 hardware profiling: XLA's FFT on this TPU backend computes a
    (56, 4096) c2c transform in ~6-9 ms — a Cooley-Tukey factorization as
    two stages of 64-point DFT MATMULS (f32 planes, highest precision)
    runs the same batch ~15x faster and scales with the MXU."""
    return jax.devices()[0].platform != "cpu"


@functools.lru_cache(maxsize=None)
def _dft_factors(n: int):
    """(n1, n2) split with n = n1*n2, n1 as close to 64 as possible."""
    n1 = 64
    while n % n1:
        n1 //= 2
    return n1, n // n1


@functools.lru_cache(maxsize=None)
def _dft_mats(n: int, sign: float):
    """Stage matrices for the matmul DFT: W1 (k1, n1), tw (n2, k1),
    W2 (k2, n2) with exponent sign*2j*pi (sign=-1 forward, +1 inverse)."""
    n1, n2 = _dft_factors(n)
    w1 = np.exp(sign * 2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    tw = np.exp(sign * 2j * np.pi * np.outer(np.arange(n2), np.arange(n1)) / n)
    w2 = np.exp(sign * 2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    return (w1.real.astype(np.float32), w1.imag.astype(np.float32),
            tw.real.astype(np.float32), tw.imag.astype(np.float32),
            w2.real.astype(np.float32), w2.imag.astype(np.float32))


def _matmul_dft(x: jax.Array, inverse: bool) -> jax.Array:
    """Unnormalized (I)DFT over the last axis via two matmul stages.

    Decimation n = n2*i1 + i2, k = k1 + n1*k2: out[..., k] equals
    sum_i x[..., i] * exp(sign*2j*pi*i*k/n) with sign=+1 for inverse.
    f32 real/imag planes at highest matmul precision (256QAM EVM floors
    demand better than bf16's ~-47 dB)."""
    n = x.shape[-1]
    n1, n2 = _dft_factors(n)
    w1r, w1i, twr, twi, w2r, w2i = _dft_mats(n, 1.0 if inverse else -1.0)
    batch = x.shape[:-1]
    ar = jnp.real(x).reshape(batch + (n1, n2)).astype(jnp.float32)
    ai = jnp.imag(x).reshape(batch + (n1, n2)).astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    ein = functools.partial(jnp.einsum, precision=hp)
    # Stage 1: DFT over i1 -> (..., n2, k1).
    s1r = ein("...ln,kl->...nk", ar, w1r) - ein("...ln,kl->...nk", ai, w1i)
    s1i = ein("...ln,kl->...nk", ar, w1i) + ein("...ln,kl->...nk", ai, w1r)
    # Twiddle (n2, k1).
    ur = s1r * twr - s1i * twi
    ui = s1r * twi + s1i * twr
    # Stage 2: DFT over i2 -> (..., k2, k1); flat index k2*n1 + k1 = k.
    s2r = ein("...mk,nm->...nk", ur, w2r) - ein("...mk,nm->...nk", ui, w2i)
    s2i = ein("...mk,nm->...nk", ur, w2i) + ein("...mk,nm->...nk", ui, w2r)
    return jax.lax.complex(s2r, s2i).reshape(batch + (n,))


def _fft(x: jax.Array) -> jax.Array:
    """Forward DFT over the last axis (fft semantics)."""
    if _use_matmul_dft():
        return _matmul_dft(x, inverse=False)
    return jnp.fft.fft(x, axis=-1).astype(jnp.complex64)


def _ifft(x: jax.Array) -> jax.Array:
    """Normalized inverse DFT over the last axis (ifft semantics)."""
    n = x.shape[-1]
    if _use_matmul_dft():
        return _matmul_dft(x, inverse=True) * np.float32(1.0 / n)
    return jnp.fft.ifft(x, axis=-1).astype(jnp.complex64)


@functools.lru_cache(maxsize=None)
def _slot_geometry(scs: SubcarrierSpacing, dft_size: int, cp: CyclicPrefix, slot_in_subframe: int):
    """Per-symbol (cp_len, t_start_useful_seconds) for one slot."""
    nsym = nof_symbols_per_slot(cp)
    all_cps = cp_lengths(scs, dft_size, cp)
    fs = sampling_rate_hz(scs, dft_size)
    # Start-of-subframe-relative sample offsets.
    starts = np.cumsum([0] + [c + dft_size for c in all_cps])[:-1]
    sel = slice(slot_in_subframe * nsym, (slot_in_subframe + 1) * nsym)
    cps = all_cps[sel]
    t_useful = [(starts[i] + all_cps[i]) / fs for i in range(*sel.indices(len(all_cps)))]
    return tuple(cps), tuple(t_useful)


@functools.lru_cache(maxsize=None)
def _phase_comp(
    scs: SubcarrierSpacing,
    dft_size: int,
    cp: CyclicPrefix,
    slot_in_subframe: int,
    f_center_hz: float,
) -> np.ndarray:
    """(nsym,) complex64 TX phase-compensation coefficients exp(-j2pi*fc*t_l).

    Computed in float64 with the 2*pi*fc*t product reduced mod 1 cycle
    before the complex exponential (fc ~ GHz needs the headroom).
    """
    _, t_useful = _slot_geometry(scs, dft_size, cp, slot_in_subframe)
    cycles = np.array([f_center_hz * t for t in t_useful], dtype=np.float64)
    frac = cycles - np.round(cycles)
    return np.exp(-2j * np.pi * frac).astype(np.complex64)


def slot_nof_samples(scs: SubcarrierSpacing, dft_size: int, cp: CyclicPrefix, slot_in_subframe: int) -> int:
    cps, _ = _slot_geometry(scs, dft_size, cp, slot_in_subframe)
    return sum(cps) + len(cps) * dft_size


@functools.partial(
    jax.jit,
    static_argnames=("scs", "dft_size", "cp", "slot_in_subframe", "f_center_hz", "scale"),
)
def modulate_slot(
    grid: jax.Array,
    scs: SubcarrierSpacing = SubcarrierSpacing.KHZ30,
    dft_size: int = 1024,
    cp: CyclicPrefix = CyclicPrefix.NORMAL,
    slot_in_subframe: int = 0,
    f_center_hz: float = 0.0,
    scale: float | None = None,
) -> jax.Array:
    """Grid (..., nsym, nsc) -> baseband samples (..., slot_nof_samples).

    nsc (= nof_rb * 12) must be <= dft_size.
    """
    nsym, nsc = grid.shape[-2], grid.shape[-1]
    assert nsym == nof_symbols_per_slot(cp)
    assert nsc <= dft_size and nsc % 2 == 0
    if scale is None:
        scale = 1.0 / np.sqrt(dft_size)
    half = nsc // 2
    batch = grid.shape[:-2]

    # Half-spectrum placement: positive freqs -> low bins, negative -> top.
    spec = jnp.zeros(batch + (nsym, dft_size), dtype=jnp.complex64)
    spec = spec.at[..., :half].set(grid[..., half:])
    spec = spec.at[..., dft_size - half :].set(grid[..., :half])

    x = _ifft(spec).astype(jnp.complex64) * (dft_size * scale)

    cps, _ = _slot_geometry(scs, dft_size, cp, slot_in_subframe)
    phase = _phase_comp(scs, dft_size, cp, slot_in_subframe, f_center_hz)
    x = x * jnp.asarray(phase)[:, None]

    # CP prepend via ONE precomputed gather over the flattened symbols
    # (28 concatenated slices copy the waveform twice; the gather is one
    # fused read): output sample -> (symbol, intra-symbol index).
    out_idx = []
    for l in range(nsym):
        base = l * dft_size
        out_idx.append(base + np.arange(dft_size - cps[l], dft_size))  # CP
        out_idx.append(base + np.arange(dft_size))
    oidx = jnp.asarray(np.concatenate(out_idx).astype(np.int32))
    flat = x.reshape(x.shape[:-2] + (nsym * dft_size,))
    return flat[..., oidx]


@functools.partial(
    jax.jit,
    static_argnames=(
        "nof_rb", "scs", "dft_size", "cp", "slot_in_subframe", "f_center_hz", "scale",
        "window_offset", "window_offset_samples",
    ),
)
def demodulate_slot(
    samples: jax.Array,
    nof_rb: int,
    scs: SubcarrierSpacing = SubcarrierSpacing.KHZ30,
    dft_size: int = 1024,
    cp: CyclicPrefix = CyclicPrefix.NORMAL,
    slot_in_subframe: int = 0,
    f_center_hz: float = 0.0,
    scale: float | None = None,
    window_offset: float = 0.0,
    window_offset_samples: int | None = None,
) -> jax.Array:
    """Baseband samples (..., slot_nof_samples) -> grid (..., nsym, nsc).

    window_offset in [0, 1): advance the DFT window INTO the cyclic prefix
    by that fraction of the CP (the reference's intra-CP window,
    ofdm_demodulator_impl.cpp:63-77), compensated per-bin with a linear
    phase ramp.  Improves robustness to negative timing errors / ISI.
    window_offset_samples: alternatively, a FIXED advance in samples for
    every symbol — the reference's nof_samples_window_offset convention
    (must be < 144*dft_size/2048, i.e. within the shortest CP).
    """
    nsym = nof_symbols_per_slot(cp)
    nsc = nof_rb * NRE
    if scale is None:
        scale = 1.0 / np.sqrt(dft_size)
    cps, _ = _slot_geometry(scs, dft_size, cp, slot_in_subframe)

    # Extract each symbol's useful part with ONE precomputed gather (a
    # python loop of 14 slices + stack copies the waveform twice; the
    # gather is a single fused read); optionally start the window `adv_l`
    # samples early (inside the CP).
    offs = 0
    advs = []
    idx_rows = []
    for l in range(nsym):
        if window_offset_samples is not None:
            adv = int(window_offset_samples)
        else:
            adv = int(window_offset * cps[l])
        advs.append(adv)
        offs += cps[l]
        idx_rows.append(np.arange(offs - adv, offs - adv + dft_size))
        offs += dft_size
    gidx = jnp.asarray(np.stack(idx_rows).astype(np.int32))  # (nsym, dft)
    x = samples[..., gidx]  # (..., nsym, dft)

    phase = _phase_comp(scs, dft_size, cp, slot_in_subframe, f_center_hz)
    x = x * jnp.conj(jnp.asarray(phase))[:, None]

    spec = _fft(x).astype(jnp.complex64) / (dft_size * scale)
    half = nsc // 2
    grid = jnp.concatenate([spec[..., dft_size - half :], spec[..., :half]], axis=-1)
    if window_offset or window_offset_samples:
        # A window advanced by `adv` samples rotates bin k by
        # exp(+j*2*pi*k*adv/N) (k = signed subcarrier index); undo it.
        k = np.arange(nsc) - half
        corr = np.stack(
            [np.exp(2j * np.pi * k * adv / dft_size) for adv in advs]
        ).astype(np.complex64)  # (nsym, nsc)
        grid = grid * jnp.asarray(corr)
    return grid
