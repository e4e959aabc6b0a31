"""PMI -> precoder closed loop (VERDICT r2 missing #4).

Type-I single-panel codebook weights from reported PMIs
(ran/precoding.py, reference precoding_codebooks.cpp semantics), the
UE-side codebook search, and the scheduler loop: a CSI report's rank +
PMI drives the next PDSCH's precoding and layer count, measurably
beating fixed identity precoding on a correlated channel.
"""

import dataclasses

import numpy as np
import pytest

from srsran_project_tpu.ran import csi as csi_mod
from srsran_project_tpu.ran import precoding as prec


def test_codebook_weights_shapes_and_power():
    """Every codebook entry is power-normalized: total tx power (sum of
    |w|^2 over layers and ports) equals 1, matching the reference's
    scaling conventions."""
    for ports in (1, 2, 4):
        for rank in range(1, min(ports, 4) + 1):
            for fields in prec.enumerate_pmis(ports, rank):
                w = prec.pmi_to_weights(ports, rank, fields)
                assert w.shape == (rank, ports)
                total = float((np.abs(w) ** 2).sum())
                assert abs(total - 1.0) < 1e-5, (ports, rank, fields, total)


def test_two_port_entries_match_reference_tables():
    """make_one_layer_two_ports / make_two_layer_two_ports exact values
    (precoding_codebooks.cpp:95-153)."""
    s = 1 / np.sqrt(2)
    np.testing.assert_allclose(prec.one_layer_two_ports(0), [[s, s]], atol=1e-7)
    np.testing.assert_allclose(prec.one_layer_two_ports(1), [[s, 1j * s]], atol=1e-7)
    np.testing.assert_allclose(prec.one_layer_two_ports(2), [[s, -s]], atol=1e-7)
    np.testing.assert_allclose(prec.one_layer_two_ports(3), [[s, -1j * s]], atol=1e-7)
    np.testing.assert_allclose(prec.two_layer_two_ports(0),
                               [[0.5, 0.5], [0.5, -0.5]], atol=1e-7)
    np.testing.assert_allclose(prec.two_layer_two_ports(1),
                               [[0.5, 0.5], [0.5j, -0.5j]], atol=1e-7)


def test_rank2_layers_are_orthogonal():
    for fields in prec.enumerate_pmis(4, 2):
        w = prec.pmi_to_weights(4, 2, fields)
        dot = np.vdot(w[0], w[1])
        assert abs(dot) < 1e-6, fields


def test_select_pmi_finds_the_steering_beam():
    """A line-of-sight channel steered at one codebook beam must select
    that beam: the capacity proxy of the chosen PMI is maximal and its
    beamforming gain over the worst entry is substantial."""
    rng = np.random.default_rng(0)
    for l_true in (0, 3, 6):
        v = np.exp(1j * 2 * np.pi * l_true / prec.NOF_BEAMS * np.arange(prec.N1))
        h = np.concatenate([v, v]).reshape(1, 4).astype(np.complex64)
        fields, m = prec.select_pmi(h, 4, 1)
        # The matched beam is the conjugate of the channel steering:
        # |sum_k v_k w_k| is maximal at w = conj(v) = beam(-l mod 8).
        assert fields["i11"] == (prec.NOF_BEAMS - l_true) % prec.NOF_BEAMS, (
            l_true, fields)
        gains = []
        for f in prec.enumerate_pmis(4, 1):
            w = prec.pmi_to_weights(4, 1, f)
            gains.append(float((np.abs(h @ w.T) ** 2).sum()))
        assert max(gains) / (min(gains) + 1e-12) > 10


def _mk_uci(rnti, bits):
    from srsran_project_tpu.fapi import messages as fapi

    return fapi.UciIndicationPdu(rnti, np.asarray(bits, np.uint8), True, 10.0)


def test_scheduler_closes_the_pmi_loop():
    """A CSI report (part 1 RI/CQI + part 2 PMI) changes the next grant's
    rank and precoding to the reported codebook weights; retransmissions
    keep the original rank."""
    from srsran_project_tpu.fapi import messages as fapi
    from srsran_project_tpu.l2sim.link_adaptation import LinkAdaptor
    from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler, SchedulerConfig
    from srsran_project_tpu.ran.constants import SubcarrierSpacing
    from srsran_project_tpu.ran.slot_point import SlotPoint

    sched = RoundRobinScheduler(SchedulerConfig(
        nof_rb=48, max_ues_per_slot=1, nof_layers=2, nof_ports=4))
    sched.link_adaptor = LinkAdaptor()
    cfg_csi = csi_mod.CsiReportConfig(nof_csi_rs_ports=4)
    sched.csi_report_cfg = cfg_csi
    ue = sched.add_ue(0x30, mcs=10)
    rng = np.random.default_rng(1)
    slot0 = SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, 0, 0)
    dl, tx, ul, _ = sched.run_slot(slot0, rng)
    w0 = dl.pdsch[0].precoding
    assert w0.shape == (2, 4)
    assert np.allclose(w0, np.eye(2, 4))  # no report yet -> identity

    # UE reports rank 2, PMI (i11=5, i13=1, i2=1), CQI 12.
    part1 = csi_mod.pack_part1(cfg_csi, cri=0, ri=2, cqi=12)
    part2 = csi_mod.pack_part2(cfg_csi, 2, i11=5, i13=1, i2=1)
    res = fapi.SlotResults(slot=slot0)
    res.uci.append(_mk_uci(0x30, part1))
    res.uci.append(_mk_uci(0x30, part2))
    sched.handle_results(res)
    assert ue.dl_rank == 2
    expect_w = prec.pmi_to_weights(4, 2, {"i11": 5, "i13": 1, "i2": 1})
    np.testing.assert_allclose(ue.dl_precoding, expect_w, atol=1e-7)

    slot1 = SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, 0, 1)
    dl1, _, _, _ = sched.run_slot(slot1, rng)
    np.testing.assert_allclose(dl1.pdsch[0].precoding, expect_w, atol=1e-7)
    assert dl1.pdsch[0].config.nof_layers == 2

    # Rank-1 report halves the layer count on the NEXT new transmission.
    part1b = csi_mod.pack_part1(cfg_csi, cri=0, ri=1, cqi=12)
    part2b = csi_mod.pack_part2(cfg_csi, 1, i11=2, i2=3)
    res2 = fapi.SlotResults(slot=slot1)
    res2.uci.append(_mk_uci(0x30, part1b))
    res2.uci.append(_mk_uci(0x30, part2b))
    sched.handle_results(res2)
    slot2 = SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, 0, 2)
    dl2, _, _, _ = sched.run_slot(slot2, rng)
    assert dl2.pdsch[0].config.nof_layers == 1
    np.testing.assert_allclose(
        dl2.pdsch[0].precoding,
        prec.pmi_to_weights(4, 1, {"i11": 2, "i2": 3}), atol=1e-7)


def test_closed_loop_beats_identity_on_a_steered_channel():
    """End-to-end payoff: on a strongly directional 2x4 channel, codebook
    precoding from the UE's own report decodes where fixed identity
    precoding fails (DL throughput improves, BASELINE's closed-loop
    axis)."""
    import jax.numpy as jnp

    from srsran_project_tpu.ops.modulation import Modulation
    from srsran_project_tpu.phy import pdsch, pusch
    from srsran_project_tpu.phy.allocation import Allocation

    rng = np.random.default_rng(3)
    # Steered rank-1-ish channel: both rx antennas see beam l=6.
    v = np.exp(1j * 2 * np.pi * 6 / prec.NOF_BEAMS * np.arange(prec.N1))
    a = np.concatenate([v, 1j * v])  # tx steering (4,)
    h = np.stack([a, 0.7 * a * np.exp(0.4j)]).astype(np.complex64)  # (2, 4)

    rank, fields = prec.select_rank_and_pmi(h, 4, max_rank=1)
    assert rank == 1
    w_pmi = prec.pmi_to_weights(4, rank, fields)

    alloc = Allocation(rb_start=2, rb_count=24, sym_start=1, sym_count=12,
                       dmrs_symbols=(2, 11))
    common = dict(tbs=2048, target_code_rate=0.4, modulation=Modulation.QAM16,
                  alloc=alloc, nof_layers=1, nof_grid_symbols=14,
                  nof_grid_sc=624, slot_in_frame=3)
    tx_cfg = pdsch.PdschConfig(nof_ports=4, **common)
    rx_cfg = pusch.PuschConfig(nof_rx_ports=2, **common)
    tb = rng.integers(0, 2, size=(2048,), dtype=np.uint8)
    noise = (rng.standard_normal((2, 14, 624))
             + 1j * rng.standard_normal((2, 14, 624))).astype(np.complex64)
    sigma = 0.35  # identity precoding fails here; the matched beam does not

    def run(w):
        grid = np.asarray(pdsch.process(tb, np.uint32(0x99), w.astype(np.complex64), tx_cfg))
        rx = np.einsum("qp,psk->qsk", h, grid) + noise * sigma / np.sqrt(2)
        out = pusch.process(rx.astype(np.complex64), np.uint32(0x99), rx_cfg)
        return bool(np.asarray(out["tb_crc_ok"])), float(np.asarray(out["snr_db"]))

    ok_pmi, snr_pmi = run(w_pmi)
    ok_eye, snr_eye = run(np.eye(1, 4, dtype=np.complex64))
    assert ok_pmi, (snr_pmi, snr_eye)
    assert snr_pmi > snr_eye + 4.0, (snr_pmi, snr_eye)
