"""TPU-native two-layer quasi-geostrophic pseudo-spectral core.

This is the from-scratch replacement for the external `pyqg` Cython kernel the
reference depends on (SURVEY §2.9; reference call surface documented at
`tools/operators.py:219-236,289-330`, `tools/simulate.py:108-145`). Design is
idiomatic JAX rather than a port:

* state is an immutable pytree (`QGState`) holding the spectral PV `qh` and the
  two Adams-Bashforth tendency lags;
* one model step is a pure function `state -> state` built from XLA rFFTs and
  elementwise spectral algebra — it fuses into a single XLA program and is
  scanned with `lax.scan` for time integration (see `qg.stepper`);
* ensembles are `vmap`s over the state pytree; nothing here ever touches the
  host.

Physics (two-layer QG on a beta-plane, doubly periodic):

    dq_i/dt + J(psi_i, q_i) + (U_i) dq_i/dx + Qy_i dpsi_i/dx = ssd  (i=1)
    ... + rek * lap(psi_2) = ssd                                    (i=2)
    q_i = lap(psi_i) + F_i (psi_{3-i} - psi_i)

with Qy_i the background PV gradients, `rek` linear bottom drag on the lower
layer and `ssd` an exponential spectral filter applied by the time stepper.
Advection is formed in flux form with real-space products (matching the
behavior the reference relies on through pyqg's `_do_advection`).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .grid import SpectralGrid, make_grid
from .params import QGParams

__all__ = [
    "QGState", "grid_for", "init_state", "invert", "fields",
    "advection_tendency", "tendency", "ab3_update", "step", "Fields",
    "cfl", "total_ke",
]


def grid_for(p: QGParams) -> SpectralGrid:
    return make_grid(p.nx, p.ny_, p.L, p.W_, p.filterfac)


@struct.dataclass
class QGState:
    """Scannable solver state. All leaves are jax arrays.

    `qh` is the spectral PV, shape (2, nl, nk) complex; `dqhdt{,_p,_pp}` are the
    AB3 tendency history (current is recomputed each step; _p/_pp are lags);
    `t` is model time in seconds and `tc` the step counter.
    """
    qh: jnp.ndarray
    dqhdt_p: jnp.ndarray
    dqhdt_pp: jnp.ndarray
    t: jnp.ndarray
    tc: jnp.ndarray


class Fields(NamedTuple):
    """Derived per-step fields shared between the stepper, closures and
    diagnostics (computed once; cf. pyqg `_invert`/`_calc_derived_fields`)."""
    ph: jnp.ndarray   # (2, nl, nk) complex streamfunction
    q: jnp.ndarray    # (2, ny, nx) real PV
    u: jnp.ndarray    # (2, ny, nx) real zonal perturbation velocity
    v: jnp.ndarray    # (2, ny, nx) real meridional velocity


# --------------------------------------------------------------------------
# spectral helpers
# --------------------------------------------------------------------------

def _rfft2(x):
    return jnp.fft.rfftn(x, axes=(-2, -1))


def _irfft2(xh, ny, nx):
    return jnp.fft.irfftn(xh, s=(ny, nx), axes=(-2, -1))


def invert(qh: jnp.ndarray, p: QGParams) -> jnp.ndarray:
    """Streamfunction from PV: solve the per-wavenumber 2x2 stretching system.

        [[-(wv2+F1),      F1    ],   [p1h]   [q1h]
         [    F2,     -(wv2+F2) ]] x [p2h] = [q2h]

    Mean mode (wv2 = 0) is gauge-fixed to zero, matching pyqg `_invert`.
    """
    g = grid_for(p)
    cdt = p.dtype_complex
    wv2 = jnp.asarray(g.wv2, p.dtype_real)
    F1, F2 = p.F1, p.F2
    det = wv2 * (wv2 + F1 + F2)
    inv_det = jnp.where(det > 0, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    q1h, q2h = qh[0], qh[1]
    p1h = (-(wv2 + F2) * q1h - F1 * q2h) * inv_det
    p2h = (-F2 * q1h - (wv2 + F1) * q2h) * inv_det
    return jnp.stack([p1h, p2h]).astype(cdt)


def fields(state_qh: jnp.ndarray, p: QGParams) -> Fields:
    """Invert PV and bring (q, u, v) to real space. The three inverse
    transforms are stacked into ONE batched irfft2 so XLA issues a single
    larger FFT (better VPU utilization at small grids)."""
    g = grid_for(p)
    ph = invert(state_qh, p)
    il = jnp.asarray(g.il, p.dtype_complex)
    ik = jnp.asarray(g.ik, p.dtype_complex)
    stacked = jnp.concatenate([state_qh, -il * ph, ik * ph], axis=0)
    quv = _irfft2(stacked, g.ny, g.nx).astype(p.dtype_real)
    nz = state_qh.shape[0]
    return Fields(ph=ph, q=quv[:nz], u=quv[nz:2 * nz], v=quv[2 * nz:])


def advection_tendency(q, u, v, ph, p: QGParams) -> jnp.ndarray:
    """Spectral PV tendency from advection + background flow/PV gradients.

    Flux form with real-space products:
        dqh/dt = -ik*F[(u+U_i) q] - il*F[v q] - ik*Qy_i*ph
    (the ssd filter provides dealiasing, as in the reference configuration).
    """
    g = grid_for(p)
    cdt = p.dtype_complex
    ik = jnp.asarray(g.ik, cdt)
    il = jnp.asarray(g.il, cdt)
    Ubg = jnp.asarray(p.Ubg, p.dtype_real)[:, None, None]
    Qy = jnp.asarray(p.Qy, p.dtype_real)[:, None, None]
    # one batched rfft2 over the stacked flux fields
    flux = jnp.concatenate([(u + Ubg) * q, v * q], axis=0)
    fh = _rfft2(flux)
    nz = q.shape[0]
    uqh, vqh = fh[:nz], fh[nz:]
    return (-(ik * uqh + il * vqh) - ik * (Qy * ph)).astype(cdt)


def friction_tendency(ph, p: QGParams) -> jnp.ndarray:
    """Linear bottom drag on the lower layer: dq2h/dt += rek * wv2 * p2h."""
    g = grid_for(p)
    wv2 = jnp.asarray(g.wv2, p.dtype_real)
    bottom = (p.rek * wv2) * ph[-1]
    return jnp.concatenate([jnp.zeros_like(ph[:-1]), bottom[None]], axis=0)


def tendency(flds: Fields, qh, p: QGParams,
             forcing: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full spectral RHS: advection + friction (+ closure forcing).

    `forcing` is a real-space PV tendency (2, ny, nx) — the contract of the
    reference's `pyqg.QParameterization.__call__` hook
    (reference models/parameterization.py:23-34).
    """
    dqhdt = advection_tendency(flds.q, flds.u, flds.v, flds.ph, p)
    dqhdt = dqhdt + friction_tendency(flds.ph, p)
    if forcing is not None:
        dqhdt = dqhdt + _rfft2(forcing.astype(p.dtype_real)).astype(p.dtype_complex)
    return dqhdt


def ab3_update(state: QGState, dqhdt: jnp.ndarray, p: QGParams) -> QGState:
    """Filtered Adams-Bashforth step (Euler -> AB2 -> AB3 startup), pyqg
    semantics: qh <- filtr * (qh + dt*(a*f + b*f_p + c*f_pp))."""
    g = grid_for(p)
    rdt = p.dtype_real
    tc = state.tc
    a = jnp.where(tc == 0, 1.0, jnp.where(tc == 1, 1.5, 23.0 / 12.0))
    b = jnp.where(tc == 0, 0.0, jnp.where(tc == 1, -0.5, -16.0 / 12.0))
    c = jnp.where(tc <= 1, 0.0, 5.0 / 12.0)
    dt = jnp.asarray(p.dt, rdt)
    filtr = jnp.asarray(g.filtr, rdt)
    qtend = dt * (a.astype(rdt) * dqhdt
                  + b.astype(rdt) * state.dqhdt_p
                  + c.astype(rdt) * state.dqhdt_pp)
    qh = (filtr * (state.qh + qtend)).astype(p.dtype_complex)
    return state.replace(qh=qh, dqhdt_p=dqhdt, dqhdt_pp=state.dqhdt_p,
                         t=state.t + dt, tc=tc + 1)


def step(state: QGState, p: QGParams,
         forcing: Optional[jnp.ndarray] = None) -> QGState:
    """One unparameterized (or externally forced) model step."""
    flds = fields(state.qh, p)
    dqhdt = tendency(flds, state.qh, p, forcing)
    return ab3_update(state, dqhdt, p)


# --------------------------------------------------------------------------
# initialization
# --------------------------------------------------------------------------

from functools import partial


@partial(jax.jit, static_argnames=("p",))
def _init_state_impl(q, t, p: QGParams) -> QGState:
    qh = _rfft2(jnp.asarray(q, p.dtype_real)).astype(p.dtype_complex)
    zeros = jnp.zeros_like(qh)
    return QGState(qh=qh, dqhdt_p=zeros, dqhdt_pp=zeros,
                   t=jnp.asarray(t, p.dtype_real),
                   tc=jnp.asarray(0, jnp.int32))


def init_state(q: jnp.ndarray, p: QGParams, t: float = 0.0) -> QGState:
    """Build a state pytree from a real-space PV field (2, ny, nx).

    Jitted: complex ops must never run eagerly (the TPU runtime here has no
    eager complex kernels)."""
    return _init_state_impl(jnp.asarray(q, p.dtype_real),
                            jnp.asarray(t, p.dtype_real), p)


def default_initial_q(p: QGParams, key=None, rng: np.random.Generator | None = None):
    """JAMES-paper initial condition (reference tools/simulate.py:147-168):
    zero-mean 1d+2d white noise, amplitude scaled with resolution so spectral
    power density is resolution-independent, truncated to the 32^2-model band;
    only the upper layer is perturbed."""
    g = grid_for(p)
    if rng is None:
        rng = np.random.default_rng(0 if key is None else np.asarray(key)[-1])
    q2d = 1e-7 * rng.random((g.ny, g.nx))
    q2d -= q2d.mean(axis=(-2, -1), keepdims=True)
    q2d *= np.sqrt(g.nx * g.ny / 64 ** 2)
    q1d = 1e-6 * (np.ones((g.ny, 1)) * rng.random((1, g.nx)))
    q1d -= q1d.mean(axis=(-2, -1), keepdims=True)
    q1d *= np.sqrt(g.nx / 64)
    noise = q1d + q2d
    nh = np.fft.rfftn(noise)
    noise = np.fft.irfftn(nh * (g.wv < np.pi / (p.L / 32)), s=(g.ny, g.nx),
                          axes=(-2, -1))
    q = np.stack([noise, np.zeros_like(noise)])
    return jnp.asarray(q, p.dtype_real)


# --------------------------------------------------------------------------
# scalar monitors
# --------------------------------------------------------------------------

def cfl(flds: Fields, p: QGParams) -> jnp.ndarray:
    g = grid_for(p)
    Ubg = jnp.asarray(p.Ubg, p.dtype_real)[:, None, None]
    umax = jnp.abs(flds.u + Ubg).max()
    vmax = jnp.abs(flds.v).max()
    return jnp.maximum(umax / g.dx, vmax / g.dy) * p.dt


def total_ke(flds: Fields, p: QGParams) -> jnp.ndarray:
    """Depth-weighted mean kinetic energy 0.5*<u^2+v^2> (perturbation)."""
    dels = jnp.asarray([p.del1, p.del2], p.dtype_real)[:, None, None]
    return (0.5 * dels * (flds.u ** 2 + flds.v ** 2)).mean() * 2.0
