#!/usr/bin/env python3
"""Per-stage profile of the x32-batched fused UL decode on real hardware.

Times a ladder of PARTIAL programs (each prefix of the decode chain as
one vmapped x32 program) with the d2h-readback barrier; the differences
attribute the fused decode's per-slot cost to stages.  Guides where the
next optimization goes (VERDICT r3: the Pallas front-end lever).

Usage: python benchmarks/decode_profile.py [--cpu] [--batch 32] [--prb 273]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.common import timeit_rb  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--prb", type=int, default=273)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from srsran_project_tpu.models import cell as cell_mod
    from srsran_project_tpu.ops import ofdm
    from srsran_project_tpu.phy import pusch
    from srsran_project_tpu.phy.sch import (_dematch_stage, _desegment_stage,
                                            decode_transport_block)
    from srsran_project_tpu.support import hostio

    if args.prb == 273:
        cfg = cell_mod.CellConfig()
    else:
        cfg = cell_mod.tiny_cell(nof_rb=args.prb, nof_ports=2)
    pc = cfg.pusch_cfg
    b = args.batch
    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, size=(cfg.tbs,), dtype=np.uint8))
    w = jnp.eye(cfg.nof_layers, cfg.nof_ports, dtype=jnp.complex64)
    iq = cell_mod.encode_slot_fused(tb, jnp.uint32(0x4601), w, cfg)
    nof_samples = iq.shape[-1]
    noise = hostio.to_device(
        ((rng.standard_normal((cfg.nof_ports, nof_samples))
          + 1j * rng.standard_normal((cfg.nof_ports, nof_samples)))
         * np.sqrt(0.5)).astype(np.complex64))
    sig = jnp.mean(jnp.abs(iq) ** 2)
    iq_rx = iq + noise * jnp.sqrt(sig * 10.0 ** (-3.0)).astype(jnp.complex64)
    iq_b = jnp.broadcast_to(iq_rx, (b,) + iq_rx.shape)
    rntis = jnp.full((b,), 0x4601, jnp.uint32)
    jax.block_until_ready((iq_b, rntis))

    def demod(x, r):
        return ofdm.demodulate_slot(x, cfg.nof_rb, cfg.scs, cfg.dft_size,
                                    cfg.cp, 0, f_center_hz=cfg.f_center_hz)

    def estimate(x, r):
        g = demod(x, r)
        return pusch._estimate_stage(g, pc)[:2]

    def equalize(x, r):
        g = demod(x, r)
        gflat, h, nv, snr = pusch._estimate_stage(g, pc)[:4]
        return pusch._equalize_stage(gflat, h, nv, pc)[0]

    def front(x, r):
        g = demod(x, r)
        return pusch._front_end(g, r, pc)[0]

    def dematch(x, r):
        llr = front(x, r)
        return _dematch_stage(llr, None, pc.sch)[1]

    def planes(x, r):
        """Front end + the fused path's bit-plane extraction only."""
        from srsran_project_tpu.phy.sch import _e_groups
        llr = front(x, r)
        qm = pc.sch.qm
        outs = []
        off = 0
        for _s, count, e in _e_groups(pc.sch.cb_e_bits):
            span = llr[off : off + count * e]
            p = span.reshape(count, e // qm, qm)
            outs.append(sum(p[..., b].astype(jnp.int32).sum() for b in range(qm)))
            off += count * e
        return sum(outs)

    def ldpc_fused(x, r):
        from srsran_project_tpu.phy.sch import _fused_decode
        llr = front(x, r)
        return _fused_decode(llr, pc.sch, pc.nof_ldpc_iterations,
                             early_stop=pc.ldpc_early_stop)[0]

    def full(x, r):
        g = demod(x, r)
        llr, nv, snr = pusch._front_end(g, r, pc)[:3]
        tb_, ok, _ = decode_transport_block(llr, pc.sch,
                                            pc.nof_ldpc_iterations, None,
                                            early_stop=pc.ldpc_early_stop)
        return ok

    ladder = [("ofdm_demod", demod), ("+estimate", estimate),
              ("+equalize", equalize), ("+demap+descramble", front),
              ("+plane_extract", planes),
              ("+ldpc_fused (bits)", ldpc_fused), ("+ldpc+crc (full)", full)]
    prev = 0.0
    rows = []
    for name, fn in ladder:
        f = jax.jit(jax.vmap(fn))
        jax.block_until_ready(f(iq_b, rntis))
        t, sync = timeit_rb(lambda f=f: f(iq_b, rntis), n=8)
        per_slot = t / b * 1e3
        rows.append({"stage": name, "cum_ms_per_slot": round(per_slot, 3),
                     "delta_ms": round(per_slot - prev, 3), "sync": sync})
        prev = per_slot
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
