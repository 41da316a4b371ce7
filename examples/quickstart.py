"""Minimal end-to-end smoke (CPU-friendly, ~2 min): tiny forcing dataset,
OLS baseline training, fused online run, online metrics."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pyqg_generative_tpu.utils.cache import configure_compilation_cache

configure_compilation_cache()

from pyqg_generative_tpu.eval.comparison import (diagnostic_differences,
                                                 distrib_score)
from pyqg_generative_tpu.models import OLSModel, load_model
from pyqg_generative_tpu.qg.params import QGParams
from pyqg_generative_tpu.sim import generate_subgrid_forcing, run_simulation
from pyqg_generative_tpu.utils import xrlite as xr


def main(workdir="/tmp/quickstart"):
    os.makedirs(workdir, exist_ok=True)
    # 1. forcing data from a small DNS
    p_dns = QGParams(nx=64, dt=3600.0, tmax=100 * 3600.0)
    data = []
    for run in range(3):
        out = generate_subgrid_forcing([16], p_dns, sampling_freq=10 * 3600.0,
                                       operators=("Operator2",), key=run)
        data.append(out["Operator2-16-dealias"])
    ds = xr.concat(data, "run")
    print("forcing data:", ds["q"].shape)

    # 2. train the deterministic baseline
    folder = os.path.join(workdir, "model")
    model = OLSModel(hidden_channels=(16, 16), folder=folder)
    model.fit(ds.isel(run=slice(0, 2)), ds.isel(run=slice(2, 3)),
              num_epochs=10, batch_size=16, verbose=False)
    print("offline L2_mean:",
          float(model.test_offline(ds.isel(run=slice(2, 3)),
                                   ensemble_size=2)["L2_mean"].values))

    # 3. fused online run with the closure inside the solver step
    p = QGParams(nx=16, dt=14400.0, tmax=100 * 14400.0,
                 tavestart=50 * 14400.0)
    online = run_simulation(p, {"self": load_model(folder),
                                "sampling": "AR1", "nsteps": 1},
                            sampling_freq=25 * 14400.0)
    print("online run finite:", bool(np.isfinite(online["q"].values).all()))
    online.to_npz(os.path.join(workdir, "online.npz"))

    # 4. online similarity vs an unparameterized twin
    twin = run_simulation(p, sampling_freq=25 * 14400.0, key=1)
    norm, _, _ = diagnostic_differences(online, twin, T=2)
    print("distrib score vs twin:", f"{distrib_score(norm):.3f}")


if __name__ == "__main__":
    main()
