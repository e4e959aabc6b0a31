"""Shared measurement helpers for the benchmark harness.

The axon TPU tunnel acks ``block_until_ready`` at enqueue, so wall-clock
around it measures dispatch, not compute.  A device->host readback of a
small transfer-safe scalar is the only true barrier: the device executes
its stream in order, so reading a scalar derived from the LAST dispatched
program proves every earlier one completed.  ``timeit_rb`` times n async
dispatches against that barrier and subtracts the measured wire roundtrip;
on backends without a working transfer path it falls back to
block_until_ready and reports which method produced the number.
"""

from __future__ import annotations

import time

import numpy as np


def _scalarize(x):
    import jax.numpy as jnp

    return jnp.sum(jnp.real(jnp.asarray(x)).astype(jnp.float32))


def d2h_roundtrip_s(samples: int = 3) -> float:
    import jax
    import jax.numpy as jnp

    bump = jax.jit(lambda v: v + 1.0)
    y = bump(jnp.float32(1.0))
    float(np.asarray(y))  # warm
    ts = []
    for _ in range(samples):
        y = bump(jnp.float32(1.0))
        time.sleep(0.003)
        t0 = time.perf_counter()
        float(np.asarray(y))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timeit_rb(fn, n: int = 20) -> tuple[float, str]:
    """(seconds/call, sync_method) for n steady-state calls of fn."""
    import jax

    first = fn()
    leaf = jax.tree_util.tree_leaves(first)[0]
    try:
        float(np.asarray(_scalarize(leaf)))
        rt = d2h_roundtrip_s()
        t0 = time.perf_counter()
        outs = [fn() for _ in range(n)]
        last = jax.tree_util.tree_leaves(outs[-1])[0]
        float(np.asarray(_scalarize(last)))
        raw = time.perf_counter() - t0
        # Subtract the SMALLER of the before/after roundtrip samples: if
        # the wire drifted upward during the window, subtracting the
        # inflated value would over-report the rate; the conservative
        # choice only ever under-reports it.
        rt = min(rt, d2h_roundtrip_s())
        if raw <= rt * 1.05:
            # The whole timed window is within the wire roundtrip's noise
            # band: the subtraction would report near-zero (observed as a
            # 2e10/s "rate" when the roundtrip drifted upward between its
            # sampling and the measurement).  Report the UNsubtracted
            # time, honestly labeled — an upper bound, not a fiction.
            return raw / n, "d2h-readback-barrier-unsubtracted"
        return (raw - rt) / n, "d2h-readback-barrier"
    except Exception:
        jax.block_until_ready(first)
        t0 = time.time()
        outs = [fn() for _ in range(n)]
        jax.block_until_ready(outs)
        return (time.time() - t0) / n, "block_until_ready"
