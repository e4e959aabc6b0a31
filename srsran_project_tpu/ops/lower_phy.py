"""Lower-PHY sample-domain helpers: amplitude control and PRACH OFDM
demodulation.

Counterparts of the reference's amplitude_controller_clipping_impl
(lib/phy/lower/amplitude_controller/amplitude_controller_clipping_impl.cpp)
and ofdm_prach_demodulator_impl (lib/phy/lower/modulation/
ofdm_prach_demodulator_impl.h:37).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("enable_clipping",))
def amplitude_control(
    samples: jax.Array,
    gain_db: float | jax.Array = 0.0,
    full_scale: float = 1.0,
    ceiling_db: float | jax.Array = -0.1,
    enable_clipping: bool = True,
):
    """Apply gain and (optionally) clip the complex envelope.

    Returns (samples, metrics dict with avg/peak power dBFS and clipping
    probability), mirroring the reference's amplitude_controller metrics.
    """
    g = 10.0 ** (jnp.asarray(gain_db, jnp.float32) / 20.0)
    x = samples * g.astype(samples.dtype)
    mag = jnp.abs(x)
    avg_pw = jnp.mean(mag**2)
    peak_pw = jnp.max(mag**2)
    ceiling = full_scale * 10.0 ** (jnp.asarray(ceiling_db, jnp.float32) / 20.0)
    clipped = mag > ceiling
    if enable_clipping:
        scale = jnp.where(clipped, ceiling / jnp.maximum(mag, 1e-12), 1.0)
        x = x * scale.astype(x.dtype)
    metrics = {
        "avg_power_dbfs": 10.0 * jnp.log10(jnp.maximum(avg_pw, 1e-12) / full_scale**2),
        "peak_power_dbfs": 10.0 * jnp.log10(jnp.maximum(peak_pw, 1e-12) / full_scale**2),
        "clipping_prob": jnp.mean(clipped.astype(jnp.float32)),
    }
    return x, metrics


# PRACH preamble info (cp kappa units, nof_symbols, ra_scs or None=pusch
# scs) per TS 38.211 Tables 6.3.3.1-1/2 (reference
# lib/ran/prach/prach_preamble_information.cpp).
PRACH_PREAMBLES = {
    "0": (3168, 1, 1250.0),
    "1": (21024, 2, 1250.0),
    "2": (4688, 4, 1250.0),
    "3": (3168, 4, 5000.0),
    "A1": (288, 2, None),
    "A2": (576, 4, None),
    "A3": (864, 6, None),
    "B1": (216, 2, None),
    "B4": (936, 12, None),
    "C0": (1240, 1, None),
    "C2": (2048, 4, None),
}

# Occasion duration in PUSCH symbols (reference prach_format_type.h
# get_preamble_duration; long formats occupy the whole window).
PRACH_DURATION_SYMBOLS = {"A1": 2, "B1": 2, "C0": 2, "A2": 4, "A3": 6,
                          "C2": 6, "B4": 12, "0": 0, "1": 0, "2": 0, "3": 0}

# (prach_scs_hz, pusch_scs_hz) -> (nof_rb_ra, k_bar); TS 38.211 Table
# 6.3.3.2-1 (reference lib/ran/prach/prach_frequency_mapping.cpp).
PRACH_FREQ_MAPPING = {
    (1250, 15000): (6, 7), (1250, 30000): (3, 1), (1250, 60000): (2, 133),
    (5000, 15000): (24, 12), (5000, 30000): (12, 10), (5000, 60000): (6, 7),
    (15000, 15000): (12, 2), (15000, 30000): (6, 2), (15000, 60000): (3, 2),
    (30000, 15000): (24, 2), (30000, 30000): (12, 2), (30000, 60000): (6, 2),
    (60000, 60000): (12, 2), (60000, 120000): (6, 2),
    (120000, 60000): (24, 2), (120000, 120000): (12, 2),
}

_KAPPA_S = 64.0 / (480e3 * 4096)  # kappa = 64 Tc, seconds


def prach_window_params(fmt: str, pusch_scs_hz: int, slot_in_subframe: int,
                        start_symbol: int, td_occasion: int, srate_hz: float,
                        rb_offset: int, fd_occasion: int, nof_prb_ul_grid: int,
                        l_ra: int) -> dict:
    """PRACH occasion window geometry per TS 38.211 §5.3.2 exactly as the
    reference computes it (ofdm_prach_demodulator_impl.cpp:79-147): the
    sample offset within the slot window, effective CP length (with the
    16-kappa boundary extensions), DFT size at the preamble SCS, number of
    repeated symbols, and the DC-relative subcarrier offset k_offset of
    the first preamble subcarrier.
    """
    cp_kappa, nof_symbols, ra_scs = PRACH_PREAMBLES[fmt]
    mu = {15000: 0, 30000: 1, 60000: 2, 120000: 3}[pusch_scs_hz]
    if ra_scs is None:
        # Short preamble: SCS follows the numerology, and the tabulated
        # CP lengths (mu = 0 kappa units) scale by 2^-mu
        # (TS 38.211 Table 6.3.3.1-2).
        ra_scs = float(pusch_scs_hz)
        cp_kappa >>= mu
    sym_kappa = (144 + 2048) >> mu          # PUSCH symbol incl. CP, kappa
    ra_sym_kappa = int(round(30720000.0 / ra_scs))  # one preamble symbol

    dur_sym = PRACH_DURATION_SYMBOLS[fmt]
    t_occ_start_k = sym_kappa * (start_symbol + dur_sym * td_occasion)
    t_slot_start_k = sym_kappa * 14 * slot_in_subframe

    half_ms_k = int(round(0.5e-3 / _KAPPA_S))
    # Window start correction (1.25/5/15/30 kHz preamble SCS).
    if ra_scs in (1250.0, 5000.0, 15000.0, 30000.0):
        if t_occ_start_k > 0:
            t_occ_start_k += 16
        if t_occ_start_k > half_ms_k:
            t_occ_start_k += 16
    # CP extension when a SHORT preamble occasion overlaps the subframe
    # start or its midpoint.
    if ra_scs in (15000.0, 30000.0, 60000.0, 120000.0):
        t_ra_start_k = t_occ_start_k + t_slot_start_k
        t_ra_end_k = t_ra_start_k + cp_kappa + nof_symbols * ra_sym_kappa
        if t_ra_start_k <= 0 <= t_ra_end_k:
            cp_kappa += 16
        if t_ra_start_k <= half_ms_k <= t_ra_end_k:
            cp_kappa += 16

    dft_size = int(round(srate_hz / ra_scs))
    k_ratio = int(round(pusch_scs_hz / ra_scs))
    nof_rb_ra, k_bar = PRACH_FREQ_MAPPING[(int(ra_scs), pusch_scs_hz)]
    grid = nof_prb_ul_grid * k_ratio * 12
    k_start = k_ratio * 12 * (rb_offset + nof_rb_ra * fd_occasion) + k_bar
    return {
        "sample_offset": int(round(t_occ_start_k * _KAPPA_S * srate_hz)),
        "cp_samples": int(round(cp_kappa * _KAPPA_S * srate_hz)),
        "dft_size": dft_size,
        "nof_symbols": nof_symbols,
        # Bin of the first preamble subcarrier relative to DC (mod dft):
        # the reference maps grid subcarrier k_start with the grid centered
        # on DC (lower half from the top of the DFT output).
        "k_offset": (k_start - grid // 2) % dft_size,
        "l_ra": l_ra,
    }


@functools.partial(jax.jit, static_argnames=("l_ra", "dft_size", "nof_symbols", "cp_samples", "k_offset"))
def prach_demodulate(
    samples: jax.Array,
    l_ra: int = 839,
    dft_size: int = 4096,
    nof_symbols: int = 1,
    cp_samples: int = 3168,
    k_offset: int = 0,
):
    """Extract the frequency-domain PRACH preamble from time samples.

    samples: (..., cp_samples + nof_symbols*dft_size) baseband at the PRACH
    sampling grid (preamble SCS).  Repeated symbols are coherently averaged;
    returns (..., L_RA) the preamble subcarriers starting at k_offset
    relative to DC (negative-first ordering handled by the caller's offset).
    """
    body = samples[..., cp_samples : cp_samples + nof_symbols * dft_size]
    syms = body.reshape(body.shape[:-1] + (nof_symbols, dft_size))
    spec = jnp.fft.fft(syms, axis=-1) / np.sqrt(dft_size)
    avg = spec.mean(axis=-2)
    idx = (k_offset + np.arange(l_ra)) % dft_size
    return avg[..., jnp.asarray(idx.astype(np.int32))]
