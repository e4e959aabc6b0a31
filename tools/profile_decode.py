"""Per-stage wall-clock profile of the batched PUSCH decode path on the TPU.

Times each compiled stage of models.cell.decode_slot separately at slot-batch
B (default 32) to show where the decode milliseconds go:
  demod   — OFDM demodulation (CP strip + FFT + phase comp)
  est     — DM-RS channel estimation (all layer/port pairs)
  eq      — data-RE gather + MMSE equalization
  demap   — soft demap + quantize + descramble
  ldpc    — rate dematch + LDPC decode + CRC (decode_transport_block)
  full    — vmapped decode_slot end to end (includes inter-stage glue)

Usage: python tools/profile_decode.py [B]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from srsran_project_tpu.models import cell as cell_mod
from srsran_project_tpu.ops import ofdm as ofdm_mod
from srsran_project_tpu.phy import pusch as pusch_mod
from srsran_project_tpu.phy.sch import decode_transport_block
from srsran_project_tpu.support import staging


def timeit(fn, *args, n=8, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / n
    print(f"{label:8s} {dt*1e3:8.2f} ms/batch  {dt*1e3/B:7.3f} ms/slot", flush=True)
    return out


B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
cfg = cell_mod.CellConfig()
pcfg = cfg.pusch_cfg
rng = np.random.default_rng(0)

print(f"# profiling decode at slot batch {B} (273 PRB, 4x4, 256QAM)", flush=True)
rnti = jnp.uint32(0x4601)
w = jnp.eye(cfg.nof_layers, cfg.nof_ports, dtype=jnp.complex64)
tb = jnp.asarray(rng.integers(0, 2, size=(cfg.tbs,), dtype=np.uint8))
nof_samples = ofdm_mod.slot_nof_samples(cfg.scs, cfg.dft_size, cfg.cp, 0)
noise = jnp.asarray(
    ((rng.standard_normal((cfg.nof_ports, nof_samples))
      + 1j * rng.standard_normal((cfg.nof_ports, nof_samples))) * np.sqrt(1e-4 / 2)
     ).astype(np.complex64))
jax.block_until_ready((rnti, w, tb, noise))

with staging.sync_stages():
    iq = cell_mod.encode_slot(tb, rnti, w, cfg)
    iq.block_until_ready()
    iq_rx = iq + noise
    out = cell_mod.decode_slot(iq_rx, rnti, cfg)
    jax.block_until_ready(out["tb_bits"])
print("# single-slot warmup done", flush=True)

# Batched inputs (device-resident).
iq_b = jnp.stack([iq_rx] * B)
rntis = jnp.asarray(np.full(B, 0x4601, np.uint32))
jax.block_until_ready((iq_b, rntis))

demod1 = lambda x: ofdm_mod.demodulate_slot(
    x, cfg.nof_rb, cfg.scs, cfg.dft_size, cfg.cp, 0, f_center_hz=cfg.f_center_hz)
grid_b = jax.vmap(demod1)(iq_b)
jax.block_until_ready(grid_b)

def est1(g):
    gf, h, nv, _snr = pusch_mod._estimate_stage(g, pcfg)
    return gf, h, nv


gflat_b, h_b, nvar_b = jax.vmap(est1)(grid_b)
jax.block_until_ready(h_b)

eq1 = lambda gf, h, nv: pusch_mod._equalize_stage(gf, h, nv, pcfg)
x_b, eqn_b = jax.vmap(eq1)(gflat_b, h_b, nvar_b)
jax.block_until_ready((x_b, eqn_b))

demap1 = lambda x, nv, r: pusch_mod._demap_stage(x, nv, r, pcfg)[0]
llr_b = jax.vmap(demap1)(x_b, eqn_b, rntis)
jax.block_until_ready(llr_b)

ldpc1 = lambda l: decode_transport_block(l, pcfg.sch, pcfg.nof_ldpc_iterations)[0]
full1 = lambda x, r: cell_mod.decode_slot(x, r, cfg)["tb_bits"]

# Warmup all batched programs sequentially (tunnel safety).
with staging.sync_stages():
    jax.block_until_ready(jax.vmap(demod1)(iq_b))
    jax.block_until_ready(jax.vmap(est1)(grid_b))
    jax.block_until_ready(jax.vmap(eq1)(gflat_b, h_b, nvar_b))
    jax.block_until_ready(jax.vmap(demap1)(x_b, eqn_b, rntis))
    jax.block_until_ready(jax.vmap(ldpc1)(llr_b))
    jax.block_until_ready(jax.vmap(full1)(iq_b, rntis))
print("# batched warmup done", flush=True)

timeit(jax.vmap(demod1), iq_b, label="demod")
timeit(jax.vmap(est1), grid_b, label="est")
timeit(jax.vmap(eq1), gflat_b, h_b, nvar_b, label="eq")
timeit(jax.vmap(demap1), x_b, eqn_b, rntis, label="demap")
timeit(jax.vmap(ldpc1), llr_b, label="ldpc")
timeit(jax.vmap(full1), iq_b, rntis, label="full")

# --- Encode side ---
from srsran_project_tpu.phy import pdsch as pdsch_mod

tbs_b = jnp.stack([tb] * B)
jax.block_until_ready(tbs_b)
bit1 = lambda t, r: pdsch_mod._bit_chain(t, r, cfg.pdsch_cfg)
cw_b = jax.vmap(bit1)(tbs_b, rntis)
jax.block_until_ready(cw_b)
gridc1 = lambda c: pdsch_mod._grid_chain(c, w, cfg.pdsch_cfg)
gr_b = jax.vmap(gridc1)(cw_b)
jax.block_until_ready(gr_b)
mod1 = lambda g: ofdm_mod.modulate_slot(g, cfg.scs, cfg.dft_size, cfg.cp, 0,
                                        f_center_hz=cfg.f_center_hz)
efull1 = lambda t, r: cell_mod.encode_slot(t, r, w, cfg)
with staging.sync_stages():
    jax.block_until_ready(jax.vmap(bit1)(tbs_b, rntis))
    jax.block_until_ready(jax.vmap(gridc1)(cw_b))
    jax.block_until_ready(jax.vmap(mod1)(gr_b))
    jax.block_until_ready(jax.vmap(efull1)(tbs_b, rntis))
print("# encode batched warmup done", flush=True)
timeit(jax.vmap(bit1), tbs_b, rntis, label="bits")
timeit(jax.vmap(gridc1), cw_b, label="gridmap")
timeit(jax.vmap(mod1), gr_b, label="ofdmmod")
timeit(jax.vmap(efull1), tbs_b, rntis, label="efull")
