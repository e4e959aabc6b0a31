"""Reference-exact int8 soft demapper.

Reproduces the reference demodulation mapper's numerics bit for bit
(lib/phy/upper/channel_modulation/demodulation_mapper_{qpsk,qam16,qam64,
qam256}.cpp + demodulation_mapper_impl.cpp for BPSK/pi2-BPSK):

- max-log LLRs via piecewise-linear interval functions whose slope/intercept
  tables are DERIVED here analytically (exact integer/rational arithmetic,
  materialized with the same float32 expression forms the reference uses);
- noise handled as ``rcp = 1/nv`` if ``nv > 0`` else 0 (safe_div), one
  float32 division per symbol, LLR = (slope*y + intercept) * rcp;
- per-component near-zero squelch (|y| <= 1e-9 -> 0), matching the SIMD
  paths that produced the goldens;
- quantization: scale by float32(LLR_MAX/range), clip to ±LLR_MAX, round to
  nearest (ties handled like the SIMD round-to-nearest) -> int8.  Range
  limit is 24 for BPSK/pi2-BPSK/QPSK and 20 for the QAM constellations.

All arithmetic is float32 with the same operation order as the reference,
so results match bit for bit on IEEE-faithful backends (asserted by
tests/vectors/test_golden_modulation.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mapper import Modulation, bits_per_symbol

LLR_MAX = 120
NEAR_ZERO = np.float32(1e-9)

# Per-axis PAM normalization 1/sqrt(norm): QPSK 2, QAM16 10, QAM64 42, QAM256 170.
_NORM = {Modulation.QAM16: 10, Modulation.QAM64: 42, Modulation.QAM256: 170}
_RANGE_LIMIT = {
    Modulation.BPSK: np.float32(24),
    Modulation.PI_2_BPSK: np.float32(24),
    Modulation.QPSK: np.float32(24),
    Modulation.QAM16: np.float32(20),
    Modulation.QAM64: np.float32(20),
    Modulation.QAM256: np.float32(20),
}


def _gray_pam_labels(m_bits: int) -> np.ndarray:
    """Amplitude-level multipliers per Gray label for one axis.

    levels[label] = odd multiplier k such that the constellation point is
    k/sqrt(norm).  Follows TS 38.211 §5.1: for each axis, bit t of the label
    selects sign (t=0) / magnitude splits (t>0).
    """
    n = 1 << m_bits
    levels = np.zeros(n, dtype=np.int64)
    for label in range(n):
        bits = [(label >> (m_bits - 1 - t)) & 1 for t in range(m_bits)]
        # TS 38.211 mapping: amplitude = (1-2b0) * [2^(m-1) - ... nested]
        # Build nested expression: a_m = 1; a_t = 2^t - (1-2*b_{m-t}) * a_{t-1}?
        # Use the closed form via the standard recursive construction.
        # TS 38.211 nesting (e.g. §5.1.5 QAM64 axis):
        #   I = (1-2a0) * (2^(m-1) - (1-2a1) * (2^(m-2) - ... (2 - (1-2a_{m-1})) ...))
        val = 1
        for t in range(m_bits - 1, 0, -1):
            val = (1 << (m_bits - t)) - (1 - 2 * bits[t]) * val
        val = (1 - 2 * bits[0]) * val
        levels[label] = val
    return levels


@functools.lru_cache(maxsize=None)
def _interval_tables(mod: Modulation):
    """Exact max-log slope/intercept interval tables for one axis.

    For interval i the nearest constellation points with bit=0 (s0) and
    bit=1 (s1) give  LLR(y)·nv = (y-s1)² - (y-s0)² = 2(s0-s1)·y + (s1²-s0²).
    With s = k/sqrt(norm):  slope = 2(k0-k1)/sqrt(norm)  (integer multiple
    of 1/sqrt(norm)) and intercept = (k1²-k0²)/norm (exact rational) —
    the same expression forms as the reference tables
    (demodulation_mapper_qam{64,256}.cpp:48-90), so the float32 constants
    are identical.
    """
    qm = bits_per_symbol(mod)
    m = qm // 2  # bits per axis
    norm = _NORM[mod]
    inv_sqrt = np.float32(1) / np.sqrt(np.float32(norm))
    levels = _gray_pam_labels(m)  # amplitude multiplier per axis label
    nof_levels = 1 << m

    widths = []
    slopes = []
    intercepts = []
    nof_intervals_list = []
    for t in range(m):  # axis bit index (bit 2t / 2t+1 of the symbol)
        # Interval grid (reference tables): every axis bit uses L intervals
        # of width 2c, except the last bit, which uses L/2 of width 4c.
        if t == m - 1:
            n_int = nof_levels // 2
            width_mult = 4
        else:
            n_int = nof_levels
            width_mult = 2
        width = np.float32(width_mult) * inv_sqrt
        slope_t = np.zeros(n_int, dtype=np.float32)
        icept_t = np.zeros(n_int, dtype=np.float32)
        for i in range(n_int):
            # Interval midpoint in units of c.
            mid = (i - n_int / 2 + 0.5) * width_mult
            # Nearest bit=0 / bit=1 levels at this midpoint (exact ints).
            best0, best1 = None, None
            for label in range(nof_levels):
                k = levels[label]
                d2 = (mid - k) ** 2
                bit = (label >> (m - 1 - t)) & 1
                if bit == 0:
                    if best0 is None or d2 < best0[0]:
                        best0 = (d2, k)
                else:
                    if best1 is None or d2 < best1[0]:
                        best1 = (d2, k)
            k0, k1 = best0[1], best1[1]
            slope_t[i] = np.float32(2 * (k0 - k1)) * inv_sqrt
            num = int(k1 * k1 - k0 * k0)
            # Reference writes intercepts as float divisions of reduced
            # rationals; float32 division is correctly rounded, so any
            # representation of the same rational gives the same bits.
            icept_t[i] = np.float32(num) / np.float32(norm)
        widths.append(width)
        slopes.append(slope_t)
        intercepts.append(icept_t)
        nof_intervals_list.append(n_int)
    return widths, nof_intervals_list, slopes, intercepts


def _quantize(l_value: jax.Array, range_limit: np.float32) -> jax.Array:
    """SIMD-path quantization: scale, clip, round-to-nearest-even, int8
    (reference avx2_helpers.h:121-151 quantize_ps)."""
    scale = np.float32(LLR_MAX) / range_limit
    v = l_value * scale
    v = jnp.clip(v, np.float32(-LLR_MAX), np.float32(LLR_MAX))
    v = jnp.round(v)  # round half to even, like _MM_FROUND_NINT
    v = jnp.where(jnp.isnan(v), np.float32(0), v)
    return v.astype(jnp.int8)


def _quantize_scalar(l_value: jax.Array, range_limit: np.float32) -> jax.Array:
    """Scalar-path quantization: clip in L-domain, then
    round(clipped/range*LLR_MAX) half away from zero
    (reference log_likelihood_ratio.cpp:90-99)."""
    clipped = jnp.clip(l_value, -range_limit, range_limit)
    v = clipped / range_limit * np.float32(LLR_MAX)
    out = jnp.sign(v) * jnp.floor(jnp.abs(v) + np.float32(0.5))
    out = jnp.where(jnp.isnan(out), np.float32(0), out)
    return out.astype(jnp.int8)


def _safe_rcp(noise_var: jax.Array) -> jax.Array:
    nv = noise_var.astype(jnp.float32)
    return jnp.where(nv > 0, np.float32(1) / nv, np.float32(0))


@functools.partial(jax.jit, static_argnames=("mod",))
def demap_llr_i8(symbols: jax.Array, noise_var: jax.Array, mod: Modulation) -> jax.Array:
    """(..., S) complex64 symbols + (..., S) float32 noise vars -> (..., S*Qm)
    int8 LLRs, bit-exact vs the reference demodulation mapper."""
    shape = symbols.shape
    symbols = symbols.astype(jnp.complex64)

    if mod in (Modulation.BPSK, Modulation.PI_2_BPSK):
        re, im = symbols.real, symbols.imag
        if mod == Modulation.PI_2_BPSK:
            # Odd symbols: z -> (im, -re)  (demodulation_mapper_impl.cpp:72).
            odd = (jnp.arange(shape[-1]) % 2).astype(bool)
            re, im = jnp.where(odd, im, re), jnp.where(odd, -re, im)
        nv = noise_var.astype(jnp.float32)
        # Scalar path: l = 2*sqrt2*(re+im)/nv, zero when nv <= 0 or NaN.
        l_value = np.float32(2) * np.float32(np.sqrt(np.float32(2))) * (re + im) / nv
        l_value = jnp.where(nv > 0, l_value, np.float32(0))
        return _quantize_scalar(l_value, _RANGE_LIMIT[mod]).reshape(shape)

    rcp = _safe_rcp(noise_var)

    if mod == Modulation.QPSK:
        gain = np.float32(2) * np.float32(np.sqrt(np.float32(2)))
        li = (gain * symbols.real) * rcp
        lq = (gain * symbols.imag) * rcp
        out = jnp.stack([li, lq], axis=-1).reshape(shape[:-1] + (shape[-1] * 2,))
        return _quantize(out, _RANGE_LIMIT[mod])

    qm = bits_per_symbol(mod)
    m = qm // 2

    if mod == Modulation.QAM16:
        # Direct formula path (demodulation_mapper_qam16.cpp:68-105).
        c = np.float32(1) / np.sqrt(np.float32(10))
        gain_first = np.float32(4) * c
        thresh = np.float32(2) * c

        def bits01(y):
            first = gain_first * y
            second = np.float32(2) * first - jnp.copysign(np.float32(0.8), y)
            return jnp.where(jnp.abs(y) > thresh, second, first)

        def bits23(y):
            return np.float32(0.8) - jnp.abs(gain_first * y)

        lv = [bits01(symbols.real), bits01(symbols.imag), bits23(symbols.real), bits23(symbols.imag)]
        lv = [v * rcp for v in lv]
        zero_re = jnp.abs(symbols.real) <= NEAR_ZERO
        zero_im = jnp.abs(symbols.imag) <= NEAR_ZERO
        masks = [zero_re, zero_im, zero_re, zero_im]
        lv = [jnp.where(mk, np.float32(0), v) for v, mk in zip(lv, masks)]
        out = jnp.stack(lv, axis=-1).reshape(shape[:-1] + (shape[-1] * qm,))
        return _quantize(out, _RANGE_LIMIT[mod])

    widths, n_ints, slopes, intercepts = _interval_tables(mod)

    def interval_fn(y, t):
        width, n_int = widths[t], n_ints[t]
        # AVX2 path: idx = floor(y * (1/width)) (avx2_helpers.h:175-194).
        idx = jnp.floor(y * (np.float32(1) / width)).astype(jnp.int32) + n_int // 2
        idx = jnp.clip(idx, 0, n_int - 1)
        sl = jnp.asarray(slopes[t])[idx]
        ic = jnp.asarray(intercepts[t])[idx]
        res = (sl * y + ic) * rcp
        return jnp.where(jnp.abs(y) <= NEAR_ZERO, np.float32(0), res)

    lv = []
    for t in range(m):
        lv.append(interval_fn(symbols.real, t))
        lv.append(interval_fn(symbols.imag, t))
    out = jnp.stack(lv, axis=-1).reshape(shape[:-1] + (shape[-1] * qm,))
    return _quantize(out, _RANGE_LIMIT[mod])
