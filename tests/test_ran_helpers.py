"""RAN helpers: ARFCN raster, bands, UL-SCH UCI bit counts."""

import numpy as np
import pytest

from srsran_project_tpu.ran import band, ulsch_info


def test_arfcn_raster_roundtrip():
    # 3.5 GHz -> N = 600000 + (500e6/15e3) = 633333.
    n = band.freq_to_arfcn(3.5e9)
    assert n == 633333
    assert abs(band.arfcn_to_freq_hz(n) - 3.5e9) < 15e3
    # 700 MHz range (5 kHz raster).
    n = band.freq_to_arfcn(700e6)
    assert n == 140000
    assert band.arfcn_to_freq_hz(n) == 700e6
    # mmWave range.
    n = band.freq_to_arfcn(28e9)
    assert abs(band.arfcn_to_freq_hz(n) - 28e9) < 60e3


def test_band_lookup():
    assert 78 in band.bands_for_freq(3.5e9)
    assert band.is_tdd_band(78)
    assert not band.is_tdd_band(1)
    assert 28 in band.bands_for_freq(780e6)


def test_gack_scaling():
    # More ACK bits / larger beta -> more coded bits; capped by the budget.
    base = ulsch_info.nof_harq_ack_bits(2, beta_index=9, sum_kr=10000,
                                        nof_re_uci=1000, qm=2, nof_layers=1)
    assert base > 0 and base % 2 == 0
    more_beta = ulsch_info.nof_harq_ack_bits(2, beta_index=13, sum_kr=10000,
                                             nof_re_uci=1000, qm=2, nof_layers=1)
    assert more_beta > base
    capped = ulsch_info.nof_harq_ack_bits(2, beta_index=15, sum_kr=10,
                                          nof_re_uci=100, qm=2, nof_layers=1)
    assert capped <= 100 * 2


def test_gcsi_budget_reduced_by_ack():
    g_ack = 64
    full = ulsch_info.nof_csi1_bits(8, 9, 100, 100, 2, 1)
    reduced = ulsch_info.nof_csi1_bits(8, 9, 100, 100, 2, 1, g_ack=g_ack)
    assert reduced <= full
    assert ulsch_info.nof_csi1_bits(0, 9, 100, 100, 2, 1) == 0
