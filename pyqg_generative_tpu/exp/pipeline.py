"""The JAMES-paper experiment matrix as device-parallel python functions —
the TPU replacement for the reference's SLURM stage scripts
(scripts/run_reference.py, run_forcing_datasets.py,
train_parameterizations.py, run_parameterized.py, run_forecasting.py,
compute_online_metrics.py).

Every stage is an ordinary function; scale knobs default to the paper's
values but can be shrunk for smoke runs. Folder layout mirrors the
reference so downstream analysis is drop-in."""
from __future__ import annotations

import json
import os

from ..eval.comparison import (coarsegrain_reference_dataset,
                               diagnostic_differences)
from ..models import MODEL_REGISTRY, load_model
from ..qg.params import ANDREW_1000_STEPS, EDDY_PARAMS, JET_PARAMS, YEAR
from ..sim import generate_subgrid_forcing, run_ensemble
from ..utils import xrlite as xr

CONFIGURATIONS = {"eddy": EDDY_PARAMS, "jet": JET_PARAMS}


def run_reference(base: str, configuration: str = "eddy",
                  resolutions=(48, 64, 96, 128, 256), n_ens: int = 10,
                  years: float = 20.0,
                  sampling_freq: float = ANDREW_1000_STEPS):
    """10-member unparameterized references at each resolution
    (reference scripts/run_reference.py:19-32)."""
    p0 = CONFIGURATIONS[configuration]
    for nx in resolutions:
        p = p0.with_nx(nx).replace(tmax=years * YEAR,
                                   tavestart=years * YEAR / 2)
        folder = os.path.join(base, configuration,
                              f"reference_{nx}")
        os.makedirs(folder, exist_ok=True)
        ds = run_ensemble(p, n_ens=n_ens, sampling_freq=sampling_freq)
        for j in range(n_ens):
            ds.isel(run=j).to_npz(os.path.join(folder, f"{j}.npz"))


def run_forcing_datasets(base: str, configuration: str = "eddy",
                         n_runs: int = 300, Nc=(32, 48, 64, 96, 128),
                         dns_nx: int = 256, years: float = 10.0,
                         sampling_freq: float = ANDREW_1000_STEPS):
    """High-res DNS runs emitting per-(operator, resolution) forcing datasets
    (reference scripts/run_forcing_datasets.py:10-25)."""
    p = CONFIGURATIONS[configuration].with_nx(dns_nx).replace(
        tmax=years * YEAR)
    for run in range(n_runs):
        out = generate_subgrid_forcing(list(Nc), p, sampling_freq, key=run)
        for name, ds in out.items():
            folder = os.path.join(base, configuration, name)
            os.makedirs(folder, exist_ok=True)
            ds.to_npz(os.path.join(folder, f"{run}.npz"))


def train_parameterizations(base: str, configuration: str = "eddy",
                            models=("MeanVarModel", "CGANRegression",
                                    "CVAERegression"),
                            operators=("Operator1", "Operator2"),
                            resolutions=(48, 64, 96), realizations=5,
                            fit_kw=None, ensemble_size: int = 1000,
                            train_frac=(0.0, 0.833, 0.917, 1.0)):
    """{GZ, GAN, VAE} x operators x resolutions x seeds training matrix
    (reference scripts/train_parameterizations.py:26-52)."""
    for model_name in models:
        for op in operators:
            for nx in resolutions:
                data = os.path.join(base, configuration,
                                    f"{op}-{nx}-dealias", "*.npz")
                ds = xr.open_mfdataset(data, "run")
                nrun = ds["q"].sizes()["run"]
                cuts = [int(f * nrun) for f in train_frac]
                ds_train = ds.isel(run=slice(cuts[0], cuts[1]))
                ds_val = ds.isel(run=slice(cuts[1], cuts[2]))
                ds_test = ds.isel(run=slice(cuts[2], cuts[3]))
                for seed in range(realizations):
                    folder = os.path.join(
                        base, configuration, f"models_{op}_{nx}",
                        f"{model_name}-{seed}")
                    if os.path.exists(os.path.join(folder,
                                                   "model_args.json")):
                        continue
                    kw = dict(fit_kw or {})
                    if model_name == "CGANRegression":
                        kw.setdefault("nx", nx)
                        model = MODEL_REGISTRY[model_name](
                            folder=folder, nx=nx)
                        kw.pop("nx", None)
                    else:
                        model = MODEL_REGISTRY[model_name](folder=folder)
                    model.fit(ds_train, ds_val, key=seed, **kw) \
                        if model_name != "MeanVarModel" else \
                        model.fit(ds_train, ds_val, **kw)
                    model.test_offline(ds_test, ensemble_size).to_npz(
                        os.path.join(folder, "offline_test.npz"))


def run_parameterized(base: str, model_folder: str,
                      configuration: str = "eddy", nx: int = 64,
                      n_ens: int = 10, years: float = 20.0,
                      sampling: str = "AR1", nsteps: int = 1,
                      subfolder: str = "online",
                      sampling_freq: float = ANDREW_1000_STEPS):
    """10-member online runs of a trained closure
    (reference scripts/run_parameterized.py:38-67)."""
    p = CONFIGURATIONS[configuration].with_nx(nx).replace(
        tmax=years * YEAR, tavestart=years * YEAR / 2)
    model = load_model(model_folder)
    ds = run_ensemble(p, {"self": model, "sampling": sampling,
                          "nsteps": nsteps},
                      n_ens=n_ens, sampling_freq=sampling_freq)
    folder = os.path.join(model_folder, subfolder)
    os.makedirs(folder, exist_ok=True)
    for j in range(n_ens):
        ds.isel(run=j).to_npz(os.path.join(folder, f"{j}.npz"))
    return ds


def forecast_initial_conditions(reference_glob: str, nx: int,
                                operator: str, n_ic: int = 15):
    """The reference's forecast IC recipe
    (scripts/run_forecasting.py:52-56): IC number j < 10 takes the *last*
    snapshot of 256^2 reference run j; j >= 10 takes snapshot -30 of run
    j-10; each coarse-grained to the forecast resolution with the training
    operator. Yields (number, q_init) with q_init of shape (lev, nx, nx)."""
    import glob as _glob

    import numpy as np

    from ..qg.operators import OPERATORS
    op = OPERATORS[operator]

    def _run_number(path):
        stem = os.path.splitext(os.path.basename(path))[0]
        return int(stem) if stem.isdigit() else -1

    # Map run number -> file by the number embedded in the filename (the
    # reference builds path = dir + str(run) + '.nc' directly); positional
    # indexing of a lexicographic sort breaks past 10 runs ('10' < '2').
    by_number = {_run_number(f): f for f in _glob.glob(reference_glob)
                 if _run_number(f) >= 0}
    for number in range(n_ic):
        run, tsel = (number, -1) if number < 10 else (number - 10, -30)
        if run not in by_number:
            continue
        ic = xr.Dataset.from_npz(by_number[run])
        q = ic["q"].isel(time=tsel).values
        if q.ndim == 4:  # (run, lev, y, x) member file saved with run dim
            q = q[0]
        yield number, np.asarray(op(q, nx))


def run_forecasting(base: str, model_folder: str | None,
                    ic_glob: str, configuration: str = "eddy",
                    nx: int = 64, n_ic: int = 15, n_ens: int = 15,
                    decorrelations=(0, 12, 24, 36, 48), days: float = 90.0,
                    sampling: str = "AR1", operator: str = "Operator2",
                    subfolder: str = "forecast", epoch: str = "final"):
    """Ensemble forecasts: n_ic initial conditions x n_ens members x
    noise-decorrelation times, saving member-0, the ensemble mean, and the
    ensemble std of (q, u, v, psi) at daily resolution
    (reference scripts/run_forecasting.py:8-62 + tools/simulate.py:254-293).
    `ic_glob` points at 256^2 reference runs; each IC is coarse-grained to
    `nx` with `operator` as the reference does. `decorrelations` are in
    hours; 0 means white noise (nsteps=1). The std field feeds
    eval.forecast.spread_skill_dataset."""
    from ..qg.params import DAY
    p0 = CONFIGURATIONS[configuration].with_nx(nx)
    p = p0.replace(tmax=days * DAY, tavestart=days * DAY)
    model = load_model(model_folder) if model_folder else None
    if model is not None and epoch != "final":
        # generator-epoch selection: offline-optimal (G_opt.msgpack) or
        # online-stability-selected (G_stable.msgpack) weights
        loaders = {"opt": getattr(model, "use_optimal_epoch", lambda: False),
                   "stable": getattr(model, "use_stable_epoch",
                                     lambda: False)}
        if epoch not in loaders:
            raise ValueError(
                f"epoch must be one of 'final', 'opt', 'stable'; "
                f"got {epoch!r}")
        ok = loaders[epoch]()
        if not ok:
            raise FileNotFoundError(
                f"no banked '{epoch}' generator weights in {model_folder}")
    ics = list(forecast_initial_conditions(ic_glob, nx, operator, n_ic))
    for dec in decorrelations:
        nsteps = max(1, int(round(dec * 3600.0 / p.dt)))
        for number, q_init in ics:
            param = None if model is None else \
                {"self": model, "sampling": sampling, "nsteps": nsteps}
            ds = run_ensemble(p, param, n_ens=n_ens, q_init=q_init,
                              sampling_freq=DAY, key=number,
                              with_diags=False)
            out = xr.Dataset(attrs=ds.attrs)
            # Member-0 is the verifying member; the saved mean/std are over
            # the remaining n_ens-1 members so that RMSE vs member-0 is
            # unbiased and the sqrt((M+1)/M) reliability factor (with
            # M = n_ens-1) is exact for a reliable ensemble. (The reference
            # format includes member-0 in the mean — a known bias.)
            for var in ("q", "u", "v", "psi"):
                out[var] = ds[var].isel(run=0)
                rest = ds[var].isel(run=slice(1, None))
                out[var + "_mean"] = rest.mean("run")
                out[var + "_std"] = rest.std("run")
            out.attrs["n_ens_stat"] = n_ens - 1
            folder = os.path.join(base, subfolder, f"decorrelation-{dec}h")
            os.makedirs(folder, exist_ok=True)
            out.to_npz(os.path.join(folder, f"{number}.npz"))


def run_forecast_truth(base: str, ic_glob: str, configuration: str = "eddy",
                       nx: int = 64, operator: str = "Operator2",
                       n_ic: int = 15, days: float = 90.0,
                       subfolder: str = "forecast", truth_nx: int = 256):
    """Independent verifying truth for the ensemble forecasts: continue the
    256^2 reference trajectory from each forecast IC for `days` and save the
    coarse-grained (q, u, v, psi) at daily resolution as
    {base}/{subfolder}/truth_{number}.npz.

    The reference verifies forecasts against ensemble member 0 (a
    perfect-model protocol; its truth runs are just more members of the
    same coarse model). Verifying against the coarse-grained continuation
    of the *high-resolution* trajectory measures real predictive skill,
    including coarse-model error. The 256^2 state is re-started from the
    stored PV snapshot (the AB3 restart transient is a few steps of ~1e-4
    relative amplitude — negligible over 90 days)."""
    import glob as _glob

    import numpy as np

    from ..qg.operators import OPERATORS
    from ..qg.params import DAY
    op = OPERATORS[operator]
    p256 = CONFIGURATIONS[configuration].with_nx(truth_nx).replace(
        tmax=days * DAY, tavestart=days * DAY, precision="single")

    def _run_number(path):
        stem = os.path.splitext(os.path.basename(path))[0]
        return int(stem) if stem.isdigit() else -1

    by_number = {_run_number(f): f for f in _glob.glob(ic_glob)
                 if _run_number(f) >= 0}
    folder = os.path.join(base, subfolder)
    os.makedirs(folder, exist_ok=True)
    for number in range(n_ic):
        out_path = os.path.join(folder, f"truth_{number}.npz")
        if os.path.exists(out_path):
            continue
        run, tsel = (number, -1) if number < 10 else (number - 10, -30)
        if run not in by_number:
            continue
        ic = xr.Dataset.from_npz(by_number[run])
        q = ic["q"].isel(time=tsel).values
        if q.ndim == 4:
            q = q[0]
        ds = run_ensemble(p256, None, n_ens=1, q_init=np.asarray(q),
                          sampling_freq=DAY, key=number, with_diags=False)
        out = xr.Dataset(attrs={"ic_number": number, "operator": operator,
                                "nx": nx})
        for var in ("q", "u", "v", "psi"):
            hi = ds[var].isel(run=0).values  # (time, lev, 256, 256)
            import jax
            import jax.numpy as jnp
            coarse = np.asarray(jax.jit(
                lambda a: op(a, nx))(jnp.asarray(hi)))
            out[var] = xr.DataArray(coarse.astype("float32"),
                                    ("time", "lev", "y", "x"))
        out.to_npz(out_path)


def train_ANN(base: str, configurations=("eddy", "jet"),
              resolutions=(48, 96), operator: str = "Operator2",
              folder_name: str = "ann_model", fit_kw=None):
    """Joint multi-configuration ANN training (eddy+jet x resolutions) with
    cross-config offline testing (reference tools/train_ANN.py:19-37)."""
    from ..models.ann_model import ANNModel
    train_sets, test_sets = [], []
    for cfg in configurations:
        for nx in resolutions:
            data = os.path.join(base, cfg, f"{operator}-{nx}-dealias",
                                "*.npz")
            ds = xr.open_mfdataset(data, "run")
            nrun = ds["q"].sizes()["run"]
            train_sets.append(ds.isel(run=slice(0, int(0.9 * nrun))))
            test_sets.append(ds.isel(run=slice(int(0.9 * nrun), nrun)))
    folder = os.path.join(base, folder_name)
    model = ANNModel(folder=folder)
    model.fit(train_sets, test_sets, **(fit_kw or {}))
    for cfg_ds, name in zip(test_sets, [f"{c}-{n}" for c in configurations
                                        for n in resolutions]):
        model.test_offline(cfg_ds, ensemble_size=2).to_npz(
            os.path.join(folder, f"offline_{name}.npz"))
    return model


def coarse_target_cached(reference_glob: str, operator: str,
                         resolution: int) -> "xr.Dataset":
    """Coarse-grained reference target for one (operator, resolution) cell,
    built on demand and cached next to the reference runs (the reference
    builds it eagerly in scripts/compute_online_metrics.py:19-48; lazy
    construction lets probes/scorers run before any metrics stage has)."""
    cache = os.path.join(os.path.dirname(reference_glob),
                         f".coarse_{operator}_{resolution}.npz")
    if os.path.exists(cache):
        return xr.Dataset.from_npz(cache)
    ref = xr.open_mfdataset(reference_glob, "run")
    target = coarsegrain_reference_dataset(ref, resolution, operator)
    try:
        target.to_npz(cache)  # to_npz is atomic (tmp + os.replace inside)
    except OSError:
        pass
    return target


def compute_online_metrics(base: str, model_folder: str, reference_glob: str,
                           operator: str, resolution: int,
                           subfolder: str = "online",
                           save_file: str = "metrics.json", T: int = 128):
    """Coarsegrain the reference, compare, write one JSON per run
    (reference scripts/compute_online_metrics.py:19-48)."""
    model_ds = xr.open_mfdataset(
        os.path.join(model_folder, subfolder, "*.npz"), "run")
    target = coarse_target_cached(reference_glob, operator, resolution)
    norm, diffs, scales = diagnostic_differences(model_ds, target, T=T)
    from ..eval.comparison import distrib_score, spectral_score
    norm["distrib_score"] = distrib_score(norm)
    norm["spectral_score"] = spectral_score(norm)
    norm["key"] = os.path.basename(model_folder)
    path = os.path.join(model_folder, save_file)
    with open(path, "w") as f:
        json.dump(norm, f)
    return norm
