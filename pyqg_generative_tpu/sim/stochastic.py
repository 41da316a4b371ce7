"""Noise time-samplers as in-scan state machines.

The reference wraps pyqg in a `stochastic_QGModel` carrying a mutable
`noise_sampler` with cross-step memory (reference tools/stochastic_pyqg.py).
Here the sampler is a pytree (`SamplerState`) threaded through `lax.scan`,
and each sampling policy is a pure update:

* AR1(nsteps): xi_t = a xi_{t-1} + b eps, a = 1 - 1/n, b = sqrt((2-1/n)/n);
  n = 1 is white noise, n < 0 freezes the initial noise
  (reference tools/stochastic_pyqg.py:30-54). Forcing recomputed every step.
* constant(nsteps): resample the noise AND the forcing every n-th step,
  *reusing the cached forcing in between* — the closure's CNN is skipped at
  runtime via `lax.cond` (reference tools/stochastic_pyqg.py:56-72 semantics,
  where `update` returning False skips the NN call).
* deterministic: the closure's ensemble-mean prediction every step.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["SamplerState", "init_sampler", "sample_forcing"]


@struct.dataclass
class SamplerState:
    noise: jnp.ndarray     # latent noise (model-defined shape)
    forcing: jnp.ndarray   # cached PV forcing (2, ny, nx)
    counter: jnp.ndarray   # int32 steps since last refresh
    key: jnp.ndarray       # PRNG key


def init_sampler(key, model, ny: int, nx: int, dtype) -> SamplerState:
    k1, k2 = jax.random.split(jax.random.PRNGKey(key)
                              if jnp.ndim(key) == 0 else key)
    noise = model.generate_latent_noise(k1, ny, nx)
    return SamplerState(noise=noise,
                        forcing=jnp.zeros((2, ny, nx), dtype),
                        counter=jnp.zeros((), jnp.int32),
                        key=k2)


def sample_forcing(model, compute: Callable, sstate: SamplerState,
                   sampling: str, nsteps: int,
                   mean_fn: Callable | None = None):
    """Return (forcing, new_state). `compute(noise) -> forcing` evaluates the
    closure on the current resolved state; `mean_fn() -> forcing` is the
    deterministic-mode prediction."""
    if sampling == "deterministic":
        f = mean_fn()
        return f, sstate

    key, sub = jax.random.split(sstate.key)
    shape = sstate.noise.shape
    eps = jax.random.normal(sub, shape, sstate.noise.dtype) \
        if sstate.noise.size else sstate.noise

    if sampling == "AR1":
        if nsteps > 0:
            a = 1.0 - 1.0 / nsteps
            b = (1.0 / nsteps * (2.0 - 1.0 / nsteps)) ** 0.5
        else:  # frozen noise
            a, b = 1.0, 0.0
        noise = a * sstate.noise + b * eps
        f = compute(noise).astype(sstate.forcing.dtype)
        return f, sstate.replace(noise=noise, forcing=f, key=key,
                                 counter=sstate.counter + 1)

    if sampling == "constant":
        refresh = sstate.counter % nsteps == 0

        def do_refresh(_):
            f = compute(eps).astype(sstate.forcing.dtype)
            return eps, f

        def reuse(_):
            return sstate.noise, sstate.forcing

        noise, f = jax.lax.cond(refresh, do_refresh, reuse, None)
        return f, sstate.replace(noise=noise, forcing=f, key=key,
                                 counter=sstate.counter + 1)

    raise ValueError(f"unknown sampling type {sampling}")
