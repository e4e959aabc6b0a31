"""MIMO channel equalization: ZF and MMSE, any ports x layers layout.

Counterpart of the reference's channel_equalizer_generic_impl
(lib/phy/upper/equalization/channel_equalizer_generic_impl.cpp) — which
hand-templates ZF 1-2 layers x 1/2/4 ports and stubs 3x4/4x4 behind an
enterprise flag — re-designed for TPU as one batched linear-algebra program:
RE-batched (H^H H + c I) solves run on the MXU for every (ports, layers)
combination uniformly, so full N-layer MMSE comes for free.

Inputs per RE: y (ports,), H (ports, layers), noise variance; outputs the
unbiased symbol estimates and the equivalent post-equalization noise
variance 1/SINR_l that the soft demapper consumes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("method",))
def equalize(
    y: jax.Array,
    h: jax.Array,
    noise_var: jax.Array,
    tx_scaling: float | jax.Array = 1.0,
    method: str = "mmse",
):
    """Equalize a batch of resource elements.

    y:         (..., nre, nof_ports) received symbols
    h:         (..., nre, nof_ports, nof_layers) channel estimates
    noise_var: broadcastable to (..., nre) noise variance (per RE)
    method:    "mmse" or "zf"

    Returns (x_hat (..., nre, nof_layers), eq_noise_var (..., nre, nof_layers)).
    eq_noise_var is the equivalent AWGN variance of the unbiased estimate
    (1/SINR); infinite-variance layers (ZF singularities) come out large.
    """
    nlayers = h.shape[-1]
    hh = jnp.conj(jnp.swapaxes(h, -1, -2))  # (..., L, P)
    gram = hh @ h  # (..., L, L)
    z = (hh @ y[..., None])[..., 0]  # (..., L) matched filter
    nv = jnp.maximum(jnp.asarray(noise_var, h.real.dtype), 1e-12)[..., None]
    beta2 = jnp.asarray(tx_scaling, h.real.dtype) ** 2

    eye = jnp.eye(nlayers, dtype=h.dtype)
    if method == "mmse":
        c = beta2 * gram + nv[..., None] * eye
    elif method == "zf":
        # Tiny diagonal loading keeps the solve finite for singular layouts.
        c = beta2 * gram + 1e-9 * eye
    else:
        raise ValueError(method)

    cinv = jnp.linalg.inv(c)  # (..., L, L); L <= 4, batched on device
    xt = (cinv @ z[..., None])[..., 0] * jnp.asarray(tx_scaling, h.dtype)

    if method == "mmse":
        # Bias mu_l = [C^-1 (beta^2 G)]_ll; unbiased estimate and 1/SINR.
        mu = jnp.einsum("...ij,...ji->...i", cinv, beta2 * gram).real
        mu = jnp.clip(mu, 1e-9, 1.0 - 1e-9)
        x_hat = xt / mu.astype(h.dtype)
        eq_nvar = (1.0 - mu) / mu
    else:
        x_hat = xt
        diag = jnp.einsum("...ii->...i", cinv).real
        eq_nvar = nv * diag / beta2
    return x_hat, eq_nvar
