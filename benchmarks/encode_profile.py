#!/usr/bin/env python3
"""Per-stage profile of the x32-batched fused DL encode on real hardware.

Partial-program ladder with the d2h-readback barrier, mirroring
benchmarks/decode_profile.py for the encode direction.

Usage: python benchmarks/encode_profile.py [--cpu] [--batch 32] [--prb 273]
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
    from srsran_project_tpu.ops import ofdm, scrambling
    from srsran_project_tpu.phy import pdsch
    from srsran_project_tpu.phy.sch import encode_transport_block

    if args.prb == 273:
        cfg = cell_mod.CellConfig()
    else:
        cfg = cell_mod.tiny_cell(nof_rb=args.prb, nof_ports=2)
    tx = cfg.pdsch_cfg if hasattr(cfg, "pdsch_cfg") else None
    b = args.batch
    rng = np.random.default_rng(0)
    tbs = jnp.asarray(rng.integers(0, 2, size=(b, cfg.tbs), dtype=np.uint8))
    rntis = jnp.asarray(np.arange(b, dtype=np.uint32) + 0x4601)
    w = jnp.eye(cfg.nof_layers, cfg.nof_ports, dtype=jnp.complex64)
    jax.block_until_ready((tbs, rntis, w))
    txc = cfg.pdsch_cfg

    # w passes as an ARGUMENT: closing over a device complex array at
    # trace time poisons this tunnel's session (round-3 probed rule).
    def bits(tb, r, _w):
        cw = encode_transport_block(tb, txc.sch)
        return scrambling.scramble_bits(cw, pdsch._pdsch_c_init(r, txc.n_id))

    def grid(tb, r, _w):
        return pdsch._grid_chain(bits(tb, r, _w), _w, txc)

    def full(tb, r, _w):
        g = grid(tb, r, _w)
        return ofdm.modulate_slot(g, cfg.scs, cfg.dft_size, cfg.cp, 0,
                                  f_center_hz=cfg.f_center_hz)

    ladder = [("bit_chain+scramble", bits), ("+map+dmrs+precode", grid),
              ("+ofdm_mod (full)", full)]
    prev = 0.0
    for name, fn in ladder:
        f = jax.jit(jax.vmap(fn, in_axes=(0, 0, None)))
        jax.block_until_ready(f(tbs, rntis, w))
        t, sync = timeit_rb(lambda f=f: f(tbs, rntis, w), n=8)
        per_slot = t / b * 1e3
        print(json.dumps({"stage": name,
                          "cum_ms_per_slot": round(per_slot, 3),
                          "delta_ms": round(per_slot - prev, 3),
                          "sync": sync}), flush=True)
        prev = per_slot


if __name__ == "__main__":
    main()
