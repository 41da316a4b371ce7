"""Numerical-health utilities (the framework's 'sanitizer' layer; the
reference has none — SURVEY §5.2-5.3)."""
from __future__ import annotations

import contextlib

import jax
import numpy as np

from . import xrlite as xr

__all__ = ["assert_finite", "debug_nans", "first_bad_step"]


def assert_finite(ds: xr.Dataset, keys=None):
    """Raise with the offending variable (and first bad time index) if any
    field contains NaN/Inf."""
    for k in (keys or list(ds.keys())):
        v = np.asarray(ds[k].values)
        if not np.isfinite(v).all():
            bad = np.argwhere(~np.isfinite(v))
            raise FloatingPointError(
                f"non-finite values in '{k}' (first at index "
                f"{tuple(bad[0].tolist())}, {(~np.isfinite(v)).sum()} total)")


@contextlib.contextmanager
def debug_nans():
    """Enable jax NaN debugging inside the context (slow; traps the first
    NaN-producing primitive)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def first_bad_step(p, q0, max_steps: int = 10000, chunk: int = 100,
                   parameterization=None):
    """Bisect the first step at which a run goes non-finite: advances in
    chunks, checks the carry on host, returns the step index or -1."""
    from ..sim.simulate import init_run_carry, advance_run

    carry = init_run_carry(p, q0, jax.random.PRNGKey(0),
                           parameterization["self"]
                           if parameterization else None, False)
    steps = 0
    while steps < max_steps:
        carry, _ = advance_run(carry, p, parameterization, n_snaps=1,
                               sampling_freq=chunk * p.dt, with_diags=False)
        steps += chunk
        qh = np.asarray(jax.device_get(jax.jit(
            lambda c: (abs(c[0].qh.real) + abs(c[0].qh.imag)).max())(carry)))
        if not np.isfinite(qh):
            return steps
    return -1
