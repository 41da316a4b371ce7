"""In-scan spectral diagnostics for the two-layer QG core.

TPU-native replacement for pyqg's accumulated diagnostics that the reference
reads from `to_dataset()` (reference `tools/comparison_tools.py:222-225,
365-368` lists the keys). Every formula below is *derived from this solver's
own RHS* so that the spectral energy budget closes by construction — the
invariant the reference checks through `Energysumr`
(`tools/comparison_tools.py:252-257`). Derivation sketch:

With layer weights del_i = H_i/H and c = del1*del2/rd^2, the total energy per
mode is  E(k,l) = -(1/2 M^2) Re sum_i del_i conj(ph_i) qh_i
              = (1/2 M^2)[sum_i del_i wv2 |ph_i|^2 + c |p1h - p2h|^2].
Because the weighted inversion operator is symmetric (del1*F1 = del2*F2 = c),
any spectral PV tendency T_i contributes
    dE/dt (k,l) = -(1/M^2) Re sum_i del_i conj(ph_i) T_i .
Splitting T into advection / mean-flow / friction / closure terms yields the
named diagnostics; beta terms and mean-advection of relative vorticity drop
out identically (they are i*k times real quantities).

All diagnostics are 2D rfft-layout arrays (lev?, nl, nk); isotropization with
conjugate-symmetry bookkeeping happens later in `qg.spectral.calc_ispec`.
Accumulation is a running mean gated on `t >= tavestart`, sampled every
`taveints` steps, matching pyqg's sampling scheme.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from .core import Fields, QGState, grid_for, invert, _rfft2
from .params import QGParams

__all__ = ["DIAG_KEYS", "DiagAccumulator", "init_diags", "compute_diagnostics",
           "accumulate", "maybe_accumulate", "finalize"]

# keys with a leading `lev` dimension
LAYERED_KEYS = ("KEspec", "Ensspec")
# depth-summed (single 2D plane) keys
FLAT_KEYS = ("KEflux", "APEflux", "APEgenspec", "KEfrictionspec",
             "ENSflux", "ENSgenspec", "ENSfrictionspec", "entspec",
             "Dissspec", "ENSDissspec")
PARAM_KEYS = ("paramspec", "paramspec_KEflux", "paramspec_APEflux",
              "ENSparamspec")
DIAG_KEYS = LAYERED_KEYS + FLAT_KEYS + PARAM_KEYS


@struct.dataclass
class DiagAccumulator:
    sums: dict
    count: jnp.ndarray  # float scalar

    def replace_(self, **kw):
        return self.replace(**kw)


def init_diags(p: QGParams, with_param: bool) -> DiagAccumulator:
    g = grid_for(p)
    rdt = p.dtype_real
    shp2 = (g.nl, g.nk)
    sums = {}
    for k in LAYERED_KEYS:
        sums[k] = jnp.zeros((2,) + shp2, rdt)
    for k in FLAT_KEYS:
        sums[k] = jnp.zeros(shp2, rdt)
    if with_param:
        for k in PARAM_KEYS:
            sums[k] = jnp.zeros(shp2, rdt)
    return DiagAccumulator(sums=sums, count=jnp.zeros((), rdt))


def _advect_spec(var, u, v, g, cdt):
    """Spectral advective tendency -ik*F[u var] - il*F[v var] (flux form)."""
    ik = jnp.asarray(g.ik, cdt)
    il = jnp.asarray(g.il, cdt)
    return -(ik * _rfft2(u * var) + il * _rfft2(v * var))


def compute_diagnostics(flds: Fields, qh: jnp.ndarray, p: QGParams,
                        forcing_h: Optional[jnp.ndarray] = None,
                        dqhdt_post: Optional[jnp.ndarray] = None) -> dict:
    """Instantaneous 2D spectral diagnostics.

    forcing_h: spectral closure tendency (2, nl, nk) or None.
    dqhdt_post: the full RHS actually used by the stepper (for the filter
        dissipation estimate); optional.
    """
    g = grid_for(p)
    rdt, cdt = p.dtype_real, p.dtype_complex
    M2 = jnp.asarray(g.M ** 2, rdt)
    wv2 = jnp.asarray(g.wv2, rdt)
    dels = jnp.asarray([p.del1, p.del2], rdt)
    c_ape = p.del1 * p.del2 * p.rd ** -2
    ph = flds.ph
    tauh = ph[0] - ph[1]

    out = {}
    out["KEspec"] = (wv2[None] * jnp.abs(ph) ** 2) / M2
    out["Ensspec"] = 0.5 * jnp.abs(qh) ** 2 / M2

    # -- nonlinear transfers ------------------------------------------------
    # KE flux: advection of relative vorticity by perturbation velocities
    xih = -wv2[None] * ph
    xi = jnp.fft.irfftn(xih, s=(g.ny, g.nx), axes=(-2, -1)).astype(rdt)
    # dKE/dt from the xi tendency Jpxi: KE = wv2|ph|^2/2M^2, dph = -Jpxi/wv2
    Jpxi = _advect_spec(xi, flds.u, flds.v, g, cdt)
    out["KEflux"] = -jnp.einsum(
        "i,ilk->lk", dels, (jnp.conj(ph) * Jpxi).real) / M2
    # APE flux: advection of baroclinic streamfunction by barotropic flow
    ubt = p.del1 * flds.u[0] + p.del2 * flds.u[1]
    vbt = p.del1 * flds.v[0] + p.del2 * flds.v[1]
    tau = jnp.fft.irfftn(tauh, s=(g.ny, g.nx), axes=(-2, -1)).astype(rdt)
    Jptpc = _advect_spec(tau, ubt, vbt, g, cdt)
    out["APEflux"] = c_ape * (jnp.conj(tauh) * Jptpc).real / M2

    # -- mean-flow energy generation (exact for this RHS; see module docstring)
    ik = jnp.asarray(g.ik, cdt)
    out["APEgenspec"] = c_ape * (
        ik * (p.U1 * jnp.conj(ph[0]) * ph[1]
              + p.U2 * jnp.conj(ph[1]) * ph[0])).real / M2

    # -- bottom drag ----------------------------------------------------------
    out["KEfrictionspec"] = -p.rek * p.del2 * wv2 * jnp.abs(ph[1]) ** 2 / M2

    # -- enstrophy budget (weights del_i, quadratic invariant sum del_i q_i^2/2)
    adv = _advect_spec(flds.q, flds.u, flds.v, g, cdt)  # perturbation advection
    out["ENSflux"] = jnp.einsum(
        "i,ilk->lk", dels, (jnp.conj(qh) * adv).real) / M2
    Qy = jnp.asarray(p.Qy, rdt)
    out["ENSgenspec"] = -jnp.einsum(
        "i,ilk->lk", dels * Qy, (ik * jnp.conj(qh) * ph).real) / M2
    out["ENSfrictionspec"] = (p.rek * p.del2 * wv2
                              * (jnp.conj(qh[1]) * ph[1]).real) / M2

    # -- depth-averaged PV ("entropy") spectrum -------------------------------
    out["entspec"] = jnp.abs(p.del1 * qh[0] + p.del2 * qh[1]) ** 2 / M2

    # -- small-scale filter dissipation (effective tendency of the ssd filter)
    if dqhdt_post is not None:
        filtr = jnp.asarray(g.filtr, rdt)
        T_filt = (filtr - 1.0) * (qh + p.dt * dqhdt_post) / p.dt
        out["Dissspec"] = -jnp.einsum(
            "i,ilk->lk", dels, (jnp.conj(ph) * T_filt).real) / M2
        out["ENSDissspec"] = jnp.einsum(
            "i,ilk->lk", dels, (jnp.conj(qh) * T_filt).real) / M2
    else:
        out["Dissspec"] = jnp.zeros_like(out["KEflux"])
        out["ENSDissspec"] = jnp.zeros_like(out["KEflux"])

    # -- closure contribution -------------------------------------------------
    if forcing_h is not None:
        out["paramspec"] = -jnp.einsum(
            "i,ilk->lk", dels, (jnp.conj(ph) * forcing_h).real) / M2
        dph = invert(forcing_h, p)  # A^{-1} T: streamfunction tendency
        out["paramspec_KEflux"] = jnp.einsum(
            "i,ilk->lk", dels * 1.0, wv2[None] * (jnp.conj(ph) * dph).real) / M2
        out["paramspec_APEflux"] = c_ape * (
            jnp.conj(tauh) * (dph[0] - dph[1])).real / M2
        out["ENSparamspec"] = jnp.einsum(
            "i,ilk->lk", dels, (jnp.conj(qh) * forcing_h).real) / M2
    return out


def accumulate(acc: DiagAccumulator, diags: dict) -> DiagAccumulator:
    sums = {k: acc.sums[k] + diags[k] for k in acc.sums}
    return acc.replace(sums=sums, count=acc.count + 1.0)


def diag_gate(state: QGState, p: QGParams) -> jnp.ndarray:
    """True when diagnostics should be sampled this step: t >= tavestart and
    every `taveints` steps (integer step arithmetic — exact in f32 runs)."""
    start_step = int(np.ceil(p.tavestart / p.dt))
    return jnp.logical_and(state.tc >= start_step,
                           state.tc % p.taveints == 0)


def maybe_accumulate(acc: DiagAccumulator, state: QGState, diags: dict,
                     p: QGParams) -> DiagAccumulator:
    """Accumulate when t >= tavestart and tc % taveints == 0 (pyqg sampling)."""
    on = diag_gate(state, p)
    w = on.astype(acc.count.dtype)
    sums = {k: acc.sums[k] + w * diags[k] for k in acc.sums}
    return acc.replace(sums=sums, count=acc.count + w)


def finalize(acc: DiagAccumulator) -> dict:
    """Running means (host- or device-side)."""
    denom = jnp.maximum(acc.count, 1.0)
    return {k: v / denom for k, v in acc.sums.items()}
