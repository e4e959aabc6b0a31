"""Compile/latency experiment: coarser program granularity on the TPU.

Decode today is 5 programs (demod/est/eq/demap/ldpc) and encode 3
(bits/gridmap/ofdmmod); the tunnel charges per-program dispatch per batch.
This measures the fused granularity (2 programs each way) at slot-batch B,
and CHECKS THE TIMING METHODOLOGY: after the timed dispatch+block loop, it
times the host readout of the last result — if block_until_ready returned
early (deferred execution), the readout absorbs the real compute time and
the loop numbers are bogus.

Usage: python tools/fuse_experiment.py [B]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from srsran_project_tpu.models import cell as cell_mod
from srsran_project_tpu.ops import ofdm as ofdm_mod
from srsran_project_tpu.phy import pdsch as pdsch_mod
from srsran_project_tpu.phy import pusch as pusch_mod
from srsran_project_tpu.phy.sch import decode_transport_block
from srsran_project_tpu.support import staging

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
cfg = cell_mod.CellConfig()
rng = np.random.default_rng(0)
rnti = jnp.uint32(0x4601)
w = jnp.eye(cfg.nof_layers, cfg.nof_ports, dtype=jnp.complex64)
tb = jnp.asarray(rng.integers(0, 2, size=(cfg.tbs,), dtype=np.uint8))
nof_samples = ofdm_mod.slot_nof_samples(cfg.scs, cfg.dft_size, cfg.cp, 0)
noise = jnp.asarray(
    ((rng.standard_normal((cfg.nof_ports, nof_samples))
      + 1j * rng.standard_normal((cfg.nof_ports, nof_samples))) * np.sqrt(1e-4 / 2)
     ).astype(np.complex64))
jax.block_until_ready((rnti, w, tb, noise))


@functools.partial(jax.jit, static_argnames=("c",))
def ul_front(iq_batch, r_batch, c):
    def one(iq1, r1):
        grid = ofdm_mod.demodulate_slot(
            iq1, c.nof_rb, c.scs, c.dft_size, c.cp, 0, f_center_hz=c.f_center_hz)
        return pusch_mod._front_end(grid, r1, c.pusch_cfg)
    return jax.vmap(one)(iq_batch, r_batch)


@functools.partial(jax.jit, static_argnames=("c",))
def dl_back(cw_batch, w_arg, c):
    def one(cw1):
        grid = pdsch_mod._grid_chain(cw1, w_arg, c.pdsch_cfg)
        return ofdm_mod.modulate_slot(grid, c.scs, c.dft_size, c.cp, 0,
                                      f_center_hz=c.f_center_hz)
    return jax.vmap(one)(cw_batch)


ldpc_b = jax.jit(jax.vmap(
    lambda l: decode_transport_block(l, cfg.pusch_cfg.sch, cfg.nof_ldpc_iterations)[:2]))
bit_b = jax.jit(jax.vmap(lambda t, r: pdsch_mod._bit_chain(t, r, cfg.pdsch_cfg)))

with staging.sync_stages():
    iq = cell_mod.encode_slot(tb, rnti, w, cfg)
    iq.block_until_ready()
    iq_rx = iq + noise
    iq_rx.block_until_ready()
    print("# single-slot warmup done", flush=True)
    iq_b = jnp.stack([iq_rx] * B)
    rntis = jnp.asarray(np.full(B, 0x4601, np.uint32))
    tbs_b = jnp.stack([tb] * B)
    jax.block_until_ready((iq_b, rntis, tbs_b))
    t0 = time.time()
    llr_b, nv_b, snr_b = ul_front(iq_b, rntis, cfg)
    jax.block_until_ready(llr_b)
    print(f"# ul_front compile+run {time.time()-t0:.1f} s", flush=True)
    t0 = time.time()
    tbb, okb = ldpc_b(llr_b)
    jax.block_until_ready((tbb, okb))
    print(f"# ldpc compile+run {time.time()-t0:.1f} s", flush=True)
    cw_b = bit_b(tbs_b, rntis)
    jax.block_until_ready(cw_b)
    t0 = time.time()
    iq_out = dl_back(cw_b, w, cfg)
    jax.block_until_ready(iq_out)
    print(f"# dl_back compile+run {time.time()-t0:.1f} s", flush=True)

# EARLY correctness readout (transfers die late in process life, so read
# the fused results to host NOW, then compile the staged reference under
# sync_stages and compare on host).
llr_fused_np = np.asarray(llr_b[0])
ok = bool(np.asarray(okb).all())
biterr = int(np.asarray((tbb[0] != tb).sum()))
iq_fused_np = np.asarray(iq_out[0])
tb_np = np.asarray(tb)
print(f"# fused: crc_all_ok={ok} biterr={biterr}", flush=True)
with staging.sync_stages():
    g1 = staging.checkpoint(ofdm_mod.demodulate_slot(
        iq_rx, cfg.nof_rb, cfg.scs, cfg.dft_size, cfg.cp, 0,
        f_center_hz=cfg.f_center_hz))
    llr_ref, _, _ = pusch_mod._front_end(g1, rnti, cfg.pusch_cfg)
    jax.block_until_ready(llr_ref)
llr_ref_np = np.asarray(llr_ref)
iq_ref_np = np.asarray(iq)
diff = int(np.abs(llr_fused_np.astype(np.int32) - llr_ref_np.astype(np.int32)).max())
ediff = float(np.abs(iq_fused_np - iq_ref_np).max())
print(f"# parity: |fused-staged| LLR max={diff}  "
      f"|enc_fused-enc_staged| max={ediff:.2e}", flush=True)


def timed(fn, *args, n=32, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / n
    # Deferred-execution check: if block didn't wait, this readout is slow.
    t0 = time.time()
    _ = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    t_read = time.time() - t0
    print(f"{label:9s} {dt*1e3:8.2f} ms/batch  {dt*1e3/B:7.3f} ms/slot  "
          f"(readout {t_read*1e3:.1f} ms)", flush=True)


def decode2(iqb, rb):
    llr, _, _ = ul_front(iqb, rb, cfg)
    return ldpc_b(llr)


def encode2(tbb_, rb):
    return dl_back(bit_b(tbb_, rb), w, cfg)


timed(ul_front, iq_b, rntis, cfg, label="ul_front")
timed(decode2, iq_b, rntis, label="decode2")
timed(encode2, tbs_b, rntis, label="encode2")
timed(decode2, iq_b, rntis, label="decode2", n=128)
timed(encode2, tbs_b, rntis, label="encode2", n=128)
