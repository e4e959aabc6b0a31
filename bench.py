"""Headline benchmark: 100 MHz 4x4 cell — full-slot PDSCH encode (DL) +
PUSCH decode (UL) throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: real-time slot rate at 30 kHz SCS is 2000 slots/s (1000 DL encodes
+ 1000 UL decodes per second); vs_baseline = achieved rate / 2000
(BASELINE.md north-star target: sustained >= 2000 slots/s DL+UL combined).

The warmup pass runs with synchronous staging (strictly sequential program
compiles — the TPU remote-compile path wedges when compilations are queued
asynchronously); steady-state timing runs fully asynchronously.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from srsran_project_tpu.models import cell as cell_mod
    from srsran_project_tpu.support import staging

    cfg = cell_mod.CellConfig()  # 273 PRB, 4x4, 256QAM MCS27-like
    rng = np.random.default_rng(0)

    rnti = jnp.uint32(0x4601)
    w = jnp.eye(cfg.nof_layers, cfg.nof_ports, dtype=jnp.complex64)
    tb = jnp.asarray(rng.integers(0, 2, size=(cfg.tbs,), dtype=np.uint8))

    # ---- Warmup: compile every stage sequentially ----
    print("# warmup: encode", file=sys.stderr, flush=True)
    t0 = time.time()
    with staging.sync_stages():
        iq = cell_mod.encode_slot(tb, rnti, w, cfg)
        iq.block_until_ready()
        t_enc_compile = time.time() - t0
        print(f"# warmup: encode done {t_enc_compile:.1f}s", file=sys.stderr, flush=True)
        noise = (
            rng.standard_normal(iq.shape) + 1j * rng.standard_normal(iq.shape)
        ).astype(np.complex64) * np.sqrt(1e-4 / 2)
        iq_rx = iq + jnp.asarray(noise)
        t0 = time.time()
        out = cell_mod.decode_slot(iq_rx, rnti, cfg)
        ok = np.asarray(out["tb_crc_ok"])
        t_dec_compile = time.time() - t0
        print(f"# warmup: decode done {t_dec_compile:.1f}s", file=sys.stderr, flush=True)
    if not bool(ok):
        print(json.dumps({"metric": "error", "value": 0, "unit": "crc_failed", "vs_baseline": 0}))
        sys.exit(1)

    def bench(fn, n):
        fn(0)  # settle
        t0 = time.time()
        outs = [fn(i) for i in range(n)]
        jax.block_until_ready(outs)
        return (time.time() - t0) / n

    n = 20
    t_enc = bench(lambda i: cell_mod.encode_slot(tb, jnp.uint32(0x4601 + i), w, cfg), n)
    t_dec = bench(lambda i: cell_mod.decode_slot(iq_rx, jnp.uint32(0x4601), cfg)["tb_bits"], n)

    # DL+UL slot rate: one "slot of work" = 1 encode + 1 decode; the
    # real-time bar is 1000 such slot pairs per second (2000 slot ops/s).
    slot_ops_per_s = 1.0 / t_enc + 1.0 / t_dec
    mbps = cfg.tbs * (1.0 / t_enc + 1.0 / t_dec) / 1e6
    result = {
        "metric": "pdsch_encode+pusch_decode_slot_rate_100mhz_4x4",
        "value": round(slot_ops_per_s, 1),
        "unit": "slots/s",
        "vs_baseline": round(slot_ops_per_s / 2000.0, 3),
    }
    print(json.dumps(result))
    print(
        f"# tbs={cfg.tbs} bits/slot, encode {t_enc*1e3:.2f} ms/slot, "
        f"decode {t_dec*1e3:.2f} ms/slot, agg {mbps:.0f} Mbps, "
        f"compile {t_enc_compile:.1f}s/{t_dec_compile:.1f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
