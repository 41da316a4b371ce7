"""Simulation drivers: fused online runs and subgrid-forcing generation.

The reference's hot loop shuttles every solver step between the CPU (pyqg)
and the GPU (torch CNN) through numpy (reference tools/simulate.py:108-145 +
models/parameterization.py:23-34) — the central inefficiency this module
eliminates: here the closure's network, the noise sampler state machine, the
spectral solver step and the diagnostics accumulate inside ONE jitted
`lax.scan`, so an entire simulation (all members, all steps, all snapshots)
is a single XLA program on the TPU.

Public surface mirrors the reference CLI driver:
* `run_simulation(params, parameterization, q_init, sampling_freq)` -> Dataset
  of (time, lev, y, x) snapshots (q, u, v, psi) + time-averaged spectral
  diagnostics + attrs (reference tools/simulate.py:108-145, drop_vars
  semantics: float32, psi naming, time in days);
* `run_ensemble(..., n_ens)` -> same with a leading `run` dim, members
  vmapped on-device (replaces SLURM job arrays, reference
  scripts/run_parameterized.py:63);
* `generate_subgrid_forcing(Nc, params, ...)` -> dict of per-(operator,
  resolution) training datasets (reference tools/simulate.py:62-106).
"""
from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..qg import core, diagnostics
from ..qg.grid import make_grid
from ..qg.operators import OPERATORS, PV_subgrid_forcing
from ..qg.params import ANDREW_1000_STEPS, DAY, QGParams
from ..utils import xrlite as xr

__all__ = ["run_simulation", "run_ensemble", "generate_subgrid_forcing",
           "set_initial_condition", "make_online_step", "init_run_carry",
           "advance_run", "run_with_snapshots"]


def set_initial_condition(p: QGParams, key: int | jax.Array = 0):
    """JAMES-paper initial condition (reference tools/simulate.py:147-168)."""
    seed = int(key) if jnp.ndim(key) == 0 else int(np.asarray(key)[-1])
    return core.default_initial_q(p, rng=np.random.default_rng(seed))


def _normalize_parameterization(parameterization):
    """Accept the reference dict format {'self': model, 'sampling': ...,
    'nsteps': ...} or a bare model."""
    if parameterization is None:
        return None, "AR1", 1
    if isinstance(parameterization, Mapping):
        return (parameterization["self"],
                parameterization.get("sampling", "AR1"),
                int(parameterization.get("nsteps", 1)))
    return parameterization, "AR1", 1


def make_online_step(p: QGParams, model=None, sampling: str = "AR1",
                     nsteps: int = 1, with_diags: bool = True):
    """Build the fused per-step transition on carry
    (QGState, SamplerState|None, DiagAccumulator|None)."""
    from .stochastic import sample_forcing

    def step(carry):
        state, sstate, acc = carry
        flds = core.fields(state.qh, p)

        forcing_h = None
        if model is not None:
            def compute(noise):
                return model.online_forcing(flds, noise, p).astype(p.dtype_real)

            def mean_fn():
                return model.online_mean_forcing(flds, p).astype(p.dtype_real)

            forcing, sstate = sample_forcing(model, compute, sstate,
                                             sampling, nsteps, mean_fn)
            forcing_h = jnp.fft.rfftn(forcing, axes=(-2, -1)).astype(
                p.dtype_complex)

        dqhdt = core.advection_tendency(flds.q, flds.u, flds.v, flds.ph, p)
        dqhdt = dqhdt + core.friction_tendency(flds.ph, p)
        if forcing_h is not None:
            dqhdt = dqhdt + forcing_h

        if acc is not None:
            def add(a):
                d = diagnostics.compute_diagnostics(
                    flds, state.qh, p, forcing_h=forcing_h, dqhdt_post=dqhdt)
                return diagnostics.accumulate(a, d)

            acc = jax.lax.cond(diagnostics.diag_gate(state, p), add,
                               lambda a: a, acc)

        state = core.ab3_update(state, dqhdt, p)
        return state, sstate, acc

    return step


def _snapshot(state: core.QGState, p: QGParams):
    flds = core.fields(state.qh, p)
    g = make_grid(p.nx, p.ny_, p.L, p.W_, p.filterfac)
    psi = jnp.fft.irfftn(flds.ph, s=(g.ny, g.nx), axes=(-2, -1)).astype(
        jnp.float32)
    return {"q": flds.q.astype(jnp.float32), "u": flds.u.astype(jnp.float32),
            "v": flds.v.astype(jnp.float32), "psi": psi}


def init_run_carry(p: QGParams, q0, key, model=None, with_diags=True):
    """Initial scan carry (QGState, SamplerState|None, DiagAccumulator|None)
    — this pytree IS the checkpointable simulation state (solver fields, AB3
    tendency lags, noise memory, cached forcing, PRNG key, diagnostic
    accumulators; SURVEY §5.4)."""
    from .stochastic import init_sampler

    state = core.init_state(q0, p)
    sstate = None
    if model is not None:
        sstate = init_sampler(key, model, p.ny_, p.nx, p.dtype_real)
    acc = diagnostics.init_diags(p, with_param=model is not None) \
        if with_diags else None
    return (state, sstate, acc)


def _advance_program(p: QGParams, model, sampling, nsteps,
                     steps_per_snap: int, n_snaps: int, with_diags: bool):
    """(carry) -> (carry, snapshots, running diag means): jittable resumable
    segment of a simulation."""
    step = make_online_step(p, model, sampling, nsteps, with_diags)

    def advance(carry):
        def chunk(c, _):
            def inner(cc, _):
                return step(cc), None
            c, _ = jax.lax.scan(inner, c, None, length=steps_per_snap)
            return c, _snapshot(c[0], p)

        carry, snaps = jax.lax.scan(chunk, carry, None, length=n_snaps)
        diags = diagnostics.finalize(carry[2]) if with_diags else {}
        return carry, snaps, diags

    return advance


def _simulate_program(p: QGParams, model, sampling, nsteps,
                      steps_per_snap: int, n_snaps: int, with_diags: bool):
    """The whole simulation as one jittable function of (q0, key)."""
    advance = _advance_program(p, model, sampling, nsteps, steps_per_snap,
                               n_snaps, with_diags)

    def run(q0, key):
        carry = init_run_carry(p, q0, key, model, with_diags)
        _, snaps, diags = advance(carry)
        return snaps, diags

    return run


def _grid_coords(p: QGParams) -> dict:
    g = make_grid(p.nx, p.ny_, p.L, p.W_, p.filterfac)
    return {"x": g.x[0, :], "y": g.y[:, 0], "lev": np.array([1, 2]),
            "l": g.ll, "k": g.kk}


def _build_dataset(snaps: dict, diags: dict, p: QGParams,
                   sampling_freq: float, n_snaps: int,
                   run_dim: bool = False) -> xr.Dataset:
    coords = _grid_coords(p)
    time_days = (np.arange(1, n_snaps + 1) * sampling_freq) / DAY
    lead = ("run", "time") if run_dim else ("time",)
    ds = xr.Dataset(attrs={"pyqg_params": str(p.to_dict())})
    for k, v in snaps.items():
        ds[k] = xr.DataArray(np.asarray(v), lead + ("lev", "y", "x"),
                             {"time": time_days, **coords})
    for k, v in diags.items():
        v = np.asarray(v, dtype=np.float32)
        dims = ("lev", "l", "k") if v.ndim - (1 if run_dim else 0) == 3 \
            else ("l", "k")
        ds[k] = xr.DataArray(v, (("run",) if run_dim else ()) + dims, coords)
    ds["time"] = xr.DataArray(time_days, ("time",),
                              attrs={"units": "days"})
    return ds


def advance_run(carry, pyqg_params: QGParams, parameterization=None,
                n_snaps: int = 1,
                sampling_freq: float = ANDREW_1000_STEPS,
                with_diags: bool = True):
    """Advance a (possibly checkpoint-restored) run carry by `n_snaps`
    snapshot intervals. Returns (carry, Dataset segment). Together with
    `init_run_carry` and `utils.checkpoints` this gives exact mid-run
    checkpoint/resume — a capability the reference lacks (SURVEY §5.4)."""
    p = pyqg_params
    model, sampling, nsteps = _normalize_parameterization(parameterization)
    steps_per_snap = max(1, int(round(sampling_freq / p.dt)))
    tc0 = int(jax.device_get(carry[0].tc))
    advance = jax.jit(_advance_program(
        p, model, sampling, nsteps, steps_per_snap, n_snaps, with_diags))
    carry, snaps, diags = advance(carry)
    ds = _build_dataset(jax.device_get(snaps), jax.device_get(diags), p,
                        steps_per_snap * p.dt, n_snaps)
    # shift the time coordinate by the carry's starting step
    t0_days = tc0 * p.dt / DAY
    times = ds["time"].values + t0_days
    for k in list(ds.keys()):
        if "time" in ds[k].coords:
            ds[k].coords["time"] = times
    ds["time"] = xr.DataArray(times, ("time",), attrs={"units": "days"})
    return carry, ds


def run_with_snapshots(pyqg_params: QGParams, parameterization=None,
                       q_init=None,
                       sampling_freq: float = ANDREW_1000_STEPS,
                       key: int = 0, with_diags: bool = True):
    """Generator yielding one Dataset segment per snapshot interval —
    API parity with pyqg's `run_with_snapshots(tsnapint)` loop the reference
    drives (reference tools/simulate.py:137). Each yield returns (t_seconds,
    Dataset with the single newest snapshot + running diagnostics); the
    device program is the same fused scan, advanced chunk by chunk."""
    p = pyqg_params
    model, sampling, nsteps = _normalize_parameterization(parameterization)
    q0 = jnp.asarray(q_init, p.dtype_real) if q_init is not None \
        else set_initial_condition(p, key)
    carry = init_run_carry(p, q0, jax.random.PRNGKey(key), model, with_diags)
    steps_per_snap = max(1, int(round(sampling_freq / p.dt)))
    n_snaps = max(1, int(p.tmax // (steps_per_snap * p.dt)))
    for _ in range(n_snaps):
        carry, ds = advance_run(carry, p, parameterization, n_snaps=1,
                                sampling_freq=sampling_freq,
                                with_diags=with_diags)
        yield float(jax.device_get(carry[0].t)), ds


def run_simulation(pyqg_params: QGParams, parameterization=None,
                   q_init=None, sampling_freq: float = ANDREW_1000_STEPS,
                   key: int = 0, with_diags: bool = True) -> xr.Dataset:
    """Single-member online simulation as one fused XLA program."""
    p = pyqg_params
    model, sampling, nsteps = _normalize_parameterization(parameterization)
    steps_per_snap = max(1, int(round(sampling_freq / p.dt)))
    n_snaps = max(1, int(p.tmax // (steps_per_snap * p.dt)))
    q0 = jnp.asarray(q_init, p.dtype_real) if q_init is not None \
        else set_initial_condition(p, key)
    program = jax.jit(_simulate_program(
        p, model, sampling, nsteps, steps_per_snap, n_snaps, with_diags))
    snaps, diags = program(q0, jax.random.PRNGKey(key))
    return _build_dataset(jax.device_get(snaps), jax.device_get(diags), p,
                          steps_per_snap * p.dt, n_snaps)


def run_ensemble(pyqg_params: QGParams, parameterization=None,
                 n_ens: int = 10, q_init=None,
                 sampling_freq: float = ANDREW_1000_STEPS,
                 key: int = 0, with_diags: bool = True,
                 sharding=None) -> xr.Dataset:
    """N online members in one vmapped XLA program (the TPU-native
    equivalent of the reference's SLURM job arrays). Per-member PRNG keys
    drive both initial conditions and latent noise. If `sharding` is given
    (a jax NamedSharding over the member axis), members are sharded across
    the device mesh."""
    p = pyqg_params
    model, sampling, nsteps = _normalize_parameterization(parameterization)
    steps_per_snap = max(1, int(round(sampling_freq / p.dt)))
    n_snaps = max(1, int(p.tmax // (steps_per_snap * p.dt)))
    if q_init is not None:
        q0 = jnp.asarray(q_init, p.dtype_real)
        if q0.ndim == 3:
            q0 = jnp.broadcast_to(q0, (n_ens,) + q0.shape)
    else:
        q0 = jnp.stack([set_initial_condition(p, key * 1000 + j)
                        for j in range(n_ens)])
    keys = jax.random.split(jax.random.PRNGKey(key), n_ens)
    if sharding is not None:
        q0 = jax.device_put(q0, sharding)
        keys = jax.device_put(keys, sharding)
    program = jax.jit(jax.vmap(_simulate_program(
        p, model, sampling, nsteps, steps_per_snap, n_snaps, with_diags)))
    snaps, diags = program(q0, keys)
    # snapshots come out (run, snap, ...) after vmap of scan outputs
    return _build_dataset(jax.device_get(snaps), jax.device_get(diags), p,
                          steps_per_snap * p.dt, n_snaps, run_dim=True)


def run_ensemble_segmented(pyqg_params: QGParams, parameterization=None,
                           n_ens: int = 10, q_init=None,
                           sampling_freq: float = ANDREW_1000_STEPS,
                           key: int = 0, with_diags: bool = True,
                           n_segments: int = 4) -> xr.Dataset:
    """`run_ensemble` split into `n_segments` device programs with a host
    synchronization between them. Functionally identical (the carry is the
    exact scan state); use for very long scans that exceed a runtime's
    single-program limits (e.g. the 86,400-step two-CNN GZ program that
    overruns this environment's TPU worker — docs/VALIDATION.md round-2
    GZ note)."""
    p = pyqg_params
    model, sampling, nsteps = _normalize_parameterization(parameterization)
    steps_per_snap = max(1, int(round(sampling_freq / p.dt)))
    n_snaps = max(1, int(p.tmax // (steps_per_snap * p.dt)))
    if q_init is not None:
        q0 = jnp.asarray(q_init, p.dtype_real)
        if q0.ndim == 3:
            q0 = jnp.broadcast_to(q0, (n_ens,) + q0.shape)
    else:
        q0 = jnp.stack([set_initial_condition(p, key * 1000 + j)
                        for j in range(n_ens)])
    keys = jax.random.split(jax.random.PRNGKey(key), n_ens)
    carry = jax.vmap(lambda q, k: init_run_carry(p, q, k, model,
                                                 with_diags))(q0, keys)

    bounds = np.linspace(0, n_snaps, n_segments + 1).astype(int)
    seg_snaps = []
    diags = None
    # One compiled program per distinct segment length: equal-length
    # segments (the common case) reuse a single jitted executable instead
    # of recompiling the full fused program every iteration.
    adv_cache: dict = {}
    for i in range(n_segments):
        m = int(bounds[i + 1] - bounds[i])
        if m == 0:
            continue
        if m not in adv_cache:
            adv_cache[m] = jax.jit(jax.vmap(_advance_program(
                p, model, sampling, nsteps, steps_per_snap, m, with_diags)))
        carry, snaps, diags = adv_cache[m](carry)
        seg_snaps.append(jax.device_get(snaps))   # host sync per segment
    merged = {k: np.concatenate([s[k] for s in seg_snaps], axis=1)
              for k in seg_snaps[0]}
    return _build_dataset(merged, jax.device_get(diags), p,
                          steps_per_snap * p.dt, n_snaps, run_dim=True)


def _forcing_program(Nc: Sequence[int], p: QGParams, sampling_freq: float,
                     operators: Sequence[str], dealias: str):
    """The scanned DNS + per-snapshot coarse-graining program shared by the
    single-run and batched forcing generators. Returns
    (program(q0) -> {combo: {var: (time, lev, y, x)}}, n_snaps,
    steps_per_snap)."""
    steps_per_snap = max(1, int(round(sampling_freq / p.dt)))
    n_snaps = max(1, int(p.tmax // (steps_per_snap * p.dt)))
    step = make_online_step(p, None, with_diags=False)

    def program(q0):
        state = core.init_state(q0, p)

        def chunk(state, _):
            def inner(c, _):
                return step((c, None, None))[0], None
            state, _ = jax.lax.scan(inner, state, None,
                                    length=steps_per_snap)
            q = jnp.fft.irfftn(state.qh, s=(p.ny_, p.nx),
                               axes=(-2, -1)).astype(p.dtype_real)
            out = {}
            for op_name in operators:
                op = OPERATORS[op_name]
                for nc in Nc:
                    S, (qc, uc, vc, psic) = PV_subgrid_forcing(
                        q, nc, op, p, dealias)
                    out[f"{op_name}-{nc}-dealias"] = {
                        "q_forcing_advection": S.astype(jnp.float32),
                        "q": qc.astype(jnp.float32),
                        "u": uc.astype(jnp.float32),
                        "v": vc.astype(jnp.float32),
                        "psi": psic.astype(jnp.float32)}
            return state, out

        return jax.lax.scan(chunk, state, None, length=n_snaps)[1]

    return program, n_snaps, steps_per_snap


def _forcing_to_datasets(outs: dict, p: QGParams, n_snaps: int,
                         steps_per_snap: int) -> dict:
    time_days = (np.arange(1, n_snaps + 1) * steps_per_snap * p.dt) / DAY
    result = {}
    for cname, data in outs.items():
        nc = int(cname.split("-")[1])
        pc = p.replace(nx=nc, ny=None)
        coords = _grid_coords(pc)
        ds = xr.Dataset(attrs={"pyqg_params": str(p.to_dict())})
        for vname, arr in data.items():
            ds[vname] = xr.DataArray(np.asarray(arr),
                                     ("time", "lev", "y", "x"),
                                     {"time": time_days, **coords})
        ds["time"] = xr.DataArray(time_days, ("time",),
                                  attrs={"units": "days"})
        result[cname] = ds
    return result


def generate_subgrid_forcing(Nc: Sequence[int], pyqg_params: QGParams,
                             sampling_freq: float = ANDREW_1000_STEPS,
                             operators: Sequence[str] = ("Operator2",
                                                         "Operator5"),
                             dealias: str = "3/2-rule",
                             key: int = 0) -> dict:
    """Run the DNS and emit per-(operator, resolution) training datasets of
    (S, q̄, ū, v̄, ψ̄), all inside one scanned XLA program
    (reference tools/simulate.py:62-106)."""
    p = pyqg_params
    program, n_snaps, steps_per_snap = _forcing_program(
        Nc, p, sampling_freq, operators, dealias)
    q0 = set_initial_condition(p, key)
    outs = jax.device_get(jax.jit(program)(q0))
    return _forcing_to_datasets(outs, p, n_snaps, steps_per_snap)


def generate_subgrid_forcing_batch(Nc: Sequence[int],
                                   pyqg_params: QGParams,
                                   sampling_freq: float = ANDREW_1000_STEPS,
                                   operators: Sequence[str] = ("Operator2",
                                                               "Operator5"),
                                   dealias: str = "3/2-rule",
                                   keys: Sequence[int] = (0,)) -> list:
    """Batched forcing generation: vmap the DNS + coarse-graining program
    over independent members (one per key) so several 256^2 runs share one
    XLA program and fill the chip (the serial per-run path leaves the MXU
    mostly idle at this grid size). Returns a list of per-key dicts, each
    identical in layout to :func:`generate_subgrid_forcing`'s result.

    No reference counterpart: the reference runs each forcing member as a
    separate SLURM job (scripts/run_forcing_datasets.py:24-25)."""
    p = pyqg_params
    program, n_snaps, steps_per_snap = _forcing_program(
        Nc, p, sampling_freq, operators, dealias)
    q0 = jnp.stack([set_initial_condition(p, k) for k in keys])
    outs = jax.device_get(jax.jit(jax.vmap(program))(q0))
    results = []
    for j in range(len(keys)):
        member = {c: {v: a[j] for v, a in d.items()}
                  for c, d in outs.items()}
        results.append(
            _forcing_to_datasets(member, p, n_snaps, steps_per_snap))
    return results
