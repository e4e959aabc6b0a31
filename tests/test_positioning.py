"""DL-PRS TOA estimation + NRPPa-style positioning measurement procedure."""

import jax.numpy as jnp
import numpy as np
import pytest

from srsran_project_tpu.l3 import messages as m
from srsran_project_tpu.l3.positioning import (PositioningMeasurementRequest,
                                               PositioningMeasurementResponse,
                                               PositioningProcedure)
from srsran_project_tpu.phy.ptrs_prs import PrsConfig, generate_prs, prs_toa_estimate


def _delayed_grid(cfg, delay_samples, dft_size=2048, snr_db=20.0, seed=0):
    """Apply a pure delay (linear phase across subcarriers) + noise."""
    g = np.asarray(generate_prs(cfg))
    k = np.arange(g.shape[1])
    phase = np.exp(-2j * np.pi * k * delay_samples / dft_size)
    rng = np.random.default_rng(seed)
    noise = (rng.standard_normal(g.shape) + 1j * rng.standard_normal(g.shape))
    noise *= np.sqrt(10 ** (-snr_db / 10) / 2)
    return jnp.asarray((g * phase[None, :] + noise).astype(np.complex64))


@pytest.mark.parametrize("delay", [0.0, 3.0, 17.5, -4.0])
def test_prs_toa_estimate(delay):
    cfg = PrsConfig(rb_start=0, rb_count=24, start_symbol=2, nof_symbols=4,
                    comb_size=4, n_id_prs=42, nof_grid_sc=624)
    res = prs_toa_estimate(_delayed_grid(cfg, delay, 2048), cfg, dft_size=2048)
    assert abs(float(res["toa_samples"]) - delay) < 0.5
    assert float(res["peak_power"]) > 50  # sharp correlation peak


def test_positioning_procedure_rstd():
    cfg = PrsConfig(rb_start=0, rb_count=24, start_symbol=2, nof_symbols=4,
                    comb_size=4, n_id_prs=42, nof_grid_sc=624)
    delays = {1: 5.0, 2: 9.0, 3: 1.0}  # per-TRP propagation delays

    def measure(trp_id):
        return prs_toa_estimate(_delayed_grid(cfg, delays[trp_id], 2048, seed=trp_id),
                                cfg, dft_size=2048)

    proc = PositioningProcedure(measure)
    resp = m.decode(proc.rx(m.encode(PositioningMeasurementRequest(
        lmf_meas_id=7, trp_ids=[1, 2, 3]))))
    assert isinstance(resp, PositioningMeasurementResponse)
    rstd = {x["trp_id"]: x["rstd_samples"] for x in resp.measurements}
    assert rstd[1] == 0.0
    assert abs(rstd[2] - 4.0) < 0.7 and abs(rstd[3] - (-4.0)) < 0.7
