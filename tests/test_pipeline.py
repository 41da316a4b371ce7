"""End-to-end mini pipeline: forcing datasets -> train -> online run ->
online metrics (the reference's 6-stage JAMES pipeline at smoke scale)."""
import json
import os

import numpy as np
import pytest

from pyqg_generative_tpu.eval.comparison import (
    coarsegrain_reference_dataset, diagnostic_differences, distrib_score,
    spectral_score)
from pyqg_generative_tpu.models import OLSModel, load_model
from pyqg_generative_tpu.qg.params import QGParams
from pyqg_generative_tpu.sim import (generate_subgrid_forcing, run_ensemble,
                                     run_simulation)
from pyqg_generative_tpu.utils import xrlite as xr

DT = 14400.0


@pytest.mark.slow
def test_mini_james_pipeline(tmp_path):
    base = str(tmp_path)
    # stage 1+3: small DNS producing forcing data for a 16^2 coarse model
    p_dns = QGParams(nx=64, dt=3600.0, tmax=60 * 3600.0, precision="double")
    for run in range(3):
        out = generate_subgrid_forcing([16], p_dns,
                                       sampling_freq=10 * 3600.0, key=run)
        ds = out["Operator2-16-dealias"]
        folder = os.path.join(base, "Operator2-16-dealias")
        os.makedirs(folder, exist_ok=True)
        ds.to_npz(os.path.join(folder, f"{run}.npz"))

    # stage 2: coarse-grained reference target
    p_ref = QGParams(nx=64, dt=3600.0, tmax=40 * 3600.0,
                     tavestart=10 * 3600.0, taveint=3600.0,
                     precision="double")
    ref = run_ensemble(p_ref, n_ens=2, sampling_freq=10 * 3600.0)
    target = coarsegrain_reference_dataset(ref, 16, "Operator2")

    # stage 4: train the deterministic baseline on the forcing data
    data = xr.open_mfdataset(os.path.join(
        base, "Operator2-16-dealias", "*.npz"), "run")
    ds_train = data.isel(run=slice(0, 2))
    ds_test = data.isel(run=slice(2, 3))
    folder = os.path.join(base, "model")
    m = OLSModel(hidden_channels=(8, 8), folder=folder)
    m.fit(ds_train, ds_test, num_epochs=3, batch_size=8, verbose=False)
    offline = m.test_offline(ds_test, ensemble_size=2)
    assert "L2_mean" in offline

    # stage 5: online parameterized run at 16^2
    p_online = QGParams(nx=16, dt=DT, tmax=40 * DT, tavestart=10 * DT,
                        taveint=DT, precision="double")
    model = load_model(folder)
    ds_online = run_ensemble(
        p_online, {"self": model, "sampling": "AR1", "nsteps": 1},
        n_ens=2, sampling_freq=10 * DT)
    assert np.isfinite(ds_online["q"].values).all()

    # stage 6: online metrics vs the coarse-grained reference
    norm, diffs, scales = diagnostic_differences(ds_online, target, T=4)
    assert np.isfinite(distrib_score(norm))
    assert np.isfinite(spectral_score(norm))
    with open(os.path.join(base, "metrics.json"), "w") as f:
        json.dump(norm, f)


def test_cli_reference_and_metrics(tmp_path):
    from pyqg_generative_tpu.exp.cli import main
    sub = str(tmp_path / "ref")
    main(["reference", "--nx", "16",
          "--params", json.dumps({"dt": DT, "tmax": 20 * DT,
                                  "tavestart": 5 * DT,
                                  "precision": "double"}),
          "--sampling-freq", str(10 * DT),
          "--subfolder", sub, "--n-ens", "2"])
    assert os.path.exists(os.path.join(sub, "0.npz"))
    assert os.path.exists(os.path.join(sub, "1.npz"))
    ds = xr.Dataset.from_npz(os.path.join(sub, "0.npz"))
    assert "KEspec" in ds

    save = str(tmp_path / "m.json")
    main(["metrics", "--model-path", os.path.join(sub, "*.npz"),
          "--target-path", os.path.join(sub, "0.npz"),
          "--save-file", save, "--T", "2", "--key-name", "self"])
    with open(save) as f:
        out = json.load(f)
    assert out["key"] == "self"
    assert np.isfinite(list(v for k, v in out.items() if k != "key")).all()


def test_cli_folderless_closure(tmp_path):
    """Physical closures by registry name, incl. the molecular-viscosity
    Laplace branch (reference tools/simulate.py:206-236)."""
    from pyqg_generative_tpu.exp.cli import main
    out = str(tmp_path / "lap")
    main(["parameterized", "--nx", "16",
          "--params", json.dumps({"dt": DT, "tmax": 10 * DT,
                                  "tavestart": 0.0, "precision": "double"}),
          "--sampling-freq", str(5 * DT),
          "--closure", "Laplace",
          "--closure-args", json.dumps({"nu": 50.0, "PV": True}),
          "--sampling", "deterministic",
          "--subfolder", out])
    ds = xr.Dataset.from_npz(os.path.join(out, "0.npz"))
    assert np.isfinite(ds["q"].values).all()
    assert "paramspec" in ds


def test_cli_train_and_parameterized(tmp_path):
    from pyqg_generative_tpu.exp.cli import main
    # forcing data via CLI
    sub = str(tmp_path)
    for member in range(4):
        main(["forcing", "--nx", "32",
              "--params", json.dumps({"dt": 3600.0, "tmax": 30 * 3600.0,
                                      "precision": "double"}),
              "--sampling-freq", str(10 * 3600.0), "--nc", "[16]",
              "--subfolder", sub, "--ensemble-member", str(member)])
    data_glob = os.path.join(sub, "Operator2-16-dealias", "*.npz")
    folder = str(tmp_path / "model")
    main(["train", "--model", "OLSModel",
          "--model-args", json.dumps({"hidden_channels": [8, 8]}),
          "--fit-args", json.dumps({"num_epochs": 2, "batch_size": 8,
                                    "verbose": False}),
          "--model-folder", folder, "--train-path", data_glob,
          "--splits", "[0,2,3,4]", "--ensemble-size", "2"])
    assert os.path.exists(os.path.join(folder, "model_args.json"))

    online = str(tmp_path / "online")
    main(["parameterized", "--nx", "16",
          "--params", json.dumps({"dt": DT, "tmax": 20 * DT,
                                  "precision": "double"}),
          "--sampling-freq", str(10 * DT), "--model-folder", folder,
          "--subfolder", online, "--n-ens", "2"])
    ds = xr.Dataset.from_npz(os.path.join(online, "0.npz"))
    assert "paramspec" in ds
    assert np.isfinite(ds["q"].values).all()


def test_coarse_target_cached_builds_then_loads(tmp_path):
    """The on-demand coarse-target cache must materialize under its EXACT
    name and be read back on the second call (regression: np.savez's
    implicit '.npz' suffix broke the tmp+os.replace publish, the cache
    never existed, and every scorer silently rebuilt the target from the
    256^2 reference)."""
    from pyqg_generative_tpu.exp.pipeline import coarse_target_cached

    p_ref = QGParams(nx=32, dt=14400.0, tmax=40 * 14400.0,
                     tavestart=10 * 14400.0, taveint=14400.0,
                     precision="double")
    ref = run_simulation(p_ref, sampling_freq=10 * 14400.0, key=3)
    refdir = tmp_path / "reference_32"
    refdir.mkdir()
    ref.to_npz(str(refdir / "0.npz"))
    glob_pat = str(refdir / "*.npz")

    built = coarse_target_cached(glob_pat, "Operator2", 16)
    cache = refdir / ".coarse_Operator2_16.npz"
    assert cache.exists(), "cache must exist under its exact name"
    assert not list(refdir.glob("*.part")) and \
        not list(refdir.glob("*.tmp*")), "no orphaned partial files"

    loaded = coarse_target_cached(glob_pat, "Operator2", 16)
    np.testing.assert_array_equal(built["q"].values, loaded["q"].values)
    np.testing.assert_allclose(built["KEspec"].values,
                               loaded["KEspec"].values)
