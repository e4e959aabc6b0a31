"""Stage synchronization control for first-call (compile) robustness.

The axon TPU backend's remote compile service wedges when many program
compilations are queued asynchronously, and persistent-cache executable
loads are unimplemented.  Workaround: run one synchronous warmup pass
(blocking after every jitted stage so compiles are strictly sequential),
then switch back to fully asynchronous dispatch for steady state.

Usage:
    with staging.sync_stages():
        run_slot(...)          # warmup: compiles happen one-by-one
    run_slot(...)              # steady state: async pipelining
"""

from __future__ import annotations

import contextlib

import jax

_SYNC = False


def sync_enabled() -> bool:
    return _SYNC


def checkpoint(x):
    """Block on x if synchronous staging is active; returns x."""
    if _SYNC:
        jax.block_until_ready(x)
    return x


@contextlib.contextmanager
def sync_stages():
    global _SYNC
    prev = _SYNC
    _SYNC = True
    try:
        yield
    finally:
        _SYNC = prev
