"""Forecast skill metrics (eval/forecast.py) against hand-computable
synthetic ensembles, plus the reference IC recipe
(reference scripts/run_forecasting.py:30-62)."""
import numpy as np
import pytest

from pyqg_generative_tpu.eval import forecast as fc
from pyqg_generative_tpu.utils import xrlite as xr

DELTA = 0.25


def _synthetic_forecast(seed, nt=5, nlev=2, n=8, err_scale=0.1,
                        spread_scale=0.2):
    """Member-0 'truth' q plus a mean offset of known RMS and a constant
    std field, as written by exp.pipeline.run_forecasting."""
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(nt, nlev, n, n))
    ds = xr.Dataset()
    ds["q"] = xr.DataArray(q, ("time", "lev", "y", "x"))
    ds["q_mean"] = xr.DataArray(q * (1.0 - err_scale),
                                ("time", "lev", "y", "x"))
    ds["q_std"] = xr.DataArray(np.full_like(q, spread_scale),
                               ("time", "lev", "y", "x"))
    return ds


def _ave_lev(a):
    return (DELTA * a[..., 0] + a[..., 1]) / (1 + DELTA)


def test_ensemble_skill_known_error():
    ds = _synthetic_forecast(0, err_scale=0.1)
    skill = fc.ensemble_skill(ds, "q", DELTA)
    # mean = (1 - 0.1) * truth => err = 0.1 * truth => normalized RMSE = 0.1
    assert skill.shape == (5,)
    assert np.allclose(skill, 0.1, rtol=1e-6)


def test_ensemble_spread_known_std():
    ds = _synthetic_forecast(1, spread_scale=0.2)
    spread = fc.ensemble_spread(ds, "q", DELTA)
    amp = np.sqrt((ds["q"].values ** 2).mean(axis=(-2, -1)))
    expected = 0.2 / _ave_lev(np.moveaxis(amp, 1, -1))
    assert np.allclose(spread, expected, rtol=1e-6)


def test_spread_skill_dataset_aggregates(tmp_path):
    folder = tmp_path / "decorrelation-0h"
    folder.mkdir()
    for j in range(3):
        _synthetic_forecast(j).to_npz(str(folder / f"{j}.npz"))
    out = fc.spread_skill_dataset(str(folder), "q", n_ens=15)
    assert out.attrs["n_ic"] == 3
    assert np.allclose(out["rmse"].values, 0.1, rtol=1e-6)
    # ratio carries the sqrt((M+1)/M) reliability factor
    expected_ratio = np.sqrt(16 / 15) * out["spread"].values / \
        out["rmse"].values
    assert np.allclose(out["ratio"].values, expected_ratio)


def test_forecast_skill_table(tmp_path):
    base = tmp_path
    for dec in (0, 24):
        folder = base / "forecast" / f"decorrelation-{dec}h"
        folder.mkdir(parents=True)
        for j in range(2):
            _synthetic_forecast(10 * dec + j).to_npz(str(folder / f"{j}.npz"))
    table = fc.forecast_skill_table(str(base), decorrelations=(0, 24, 48),
                                    n_ens=15, days=(1, 3, 5))
    assert set(table) == {0, 24}  # 48h folder absent -> skipped
    assert set(table[0]["rmse"]) == {1, 3, 5}
    assert table[0]["rmse"][1] == pytest.approx(0.1, rel=1e-6)


def test_forecast_initial_conditions_recipe(tmp_path):
    """IC j<10 -> (run=j, time=-1); j>=10 -> (run=j-10, time=-30); operator
    applied (reference scripts/run_forecasting.py:52-56)."""
    from pyqg_generative_tpu.exp.pipeline import forecast_initial_conditions
    from pyqg_generative_tpu.qg.operators import Operator2

    rng = np.random.default_rng(0)
    nt, n = 32, 32
    runs = []
    for r in range(2):
        q = rng.normal(size=(nt, 2, n, n))
        ds = xr.Dataset()
        ds["q"] = xr.DataArray(q, ("time", "lev", "y", "x"))
        ds.to_npz(str(tmp_path / f"{r}.npz"))
        runs.append(q)

    ics = dict(forecast_initial_conditions(
        str(tmp_path / "*.npz"), 16, "Operator2", n_ic=12))
    # j=0 -> run 0 last snapshot; j=11 -> run 1 snapshot -30
    assert set(ics) == {0, 1, 10, 11}
    assert np.allclose(ics[0], np.asarray(Operator2(runs[0][-1], 16)))
    assert np.allclose(ics[11], np.asarray(Operator2(runs[1][-30], 16)))
    assert ics[0].shape == (2, 16, 16)


def test_ensemble_skill_vs_independent_truth():
    """With ds_truth given, the skill verifies against the independent
    trajectory, not member-0 (VERDICT round-2 weak #6)."""
    ds = _synthetic_forecast(3, err_scale=0.0)  # mean == member-0 exactly
    truth = xr.Dataset()
    truth["q"] = xr.DataArray(ds["q"].values * 1.2, ("time", "lev", "y", "x"))
    # vs member-0 the error is 0; vs truth it is |1 - 1/1.2| of truth RMS
    assert np.allclose(fc.ensemble_skill(ds, "q", DELTA), 0.0)
    skill = fc.ensemble_skill(ds, "q", DELTA, ds_truth=truth)
    assert np.all(skill > 0.1)


def test_run_forecasting_epoch_guard(tmp_path, monkeypatch):
    """epoch='opt'/'stable' raises when the model has no banked weights,
    instead of silently forecasting with the final epoch."""
    import pytest
    from pyqg_generative_tpu.exp import pipeline

    class NoBank:
        pass

    monkeypatch.setattr(pipeline, "load_model", lambda f: NoBank())
    with pytest.raises(FileNotFoundError, match="stable"):
        pipeline.run_forecasting(str(tmp_path), "some/folder", "*.npz",
                                 epoch="stable")


def test_run_forecast_truth_and_skill(tmp_path):
    """run_forecast_truth continues the trajectory at truth_nx, coarse-
    grains to nx, and spread_skill_dataset auto-detects the truth files."""
    from pyqg_generative_tpu.exp.pipeline import (run_forecast_truth,
                                                  run_forecasting)
    from pyqg_generative_tpu.qg.params import EDDY_PARAMS, DAY
    from pyqg_generative_tpu.sim import run_ensemble

    base = str(tmp_path)
    # one tiny 'reference' run at 64^2 standing in for the 256^2 DNS
    p = EDDY_PARAMS.with_nx(64).replace(tmax=2 * DAY, tavestart=2 * DAY,
                                        precision="single")
    ds0 = run_ensemble(p, None, n_ens=1, key=5, with_diags=False,
                       sampling_freq=DAY)
    ds0.isel(run=0).to_npz(f"{base}/0.npz")

    run_forecasting(base, None, f"{base}/[0-9].npz", "eddy", nx=32,
                    n_ic=1, n_ens=3, decorrelations=(0,), days=2.0,
                    operator="Operator2")
    run_forecast_truth(base, f"{base}/[0-9].npz", "eddy", nx=32,
                       operator="Operator2", n_ic=1, days=2.0,
                       subfolder="forecast/decorrelation-0h", truth_nx=64)
    folder = f"{base}/forecast/decorrelation-0h"
    import os
    assert os.path.exists(f"{folder}/truth_0.npz")
    sk = fc.spread_skill_dataset(folder, "q")
    # coarse-model error vs the 64^2 truth is nonzero from day 1
    assert np.all(sk["rmse"].values > 0)
    assert np.isfinite(sk["rmse"].values).all()
