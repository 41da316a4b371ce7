"""Grid-convergence study (reference notebooks/grid_convergence.ipynb):
run the eddy configuration at several resolutions and compare equilibrium
KE levels and isotropic KE spectra in the commonly resolved band."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json

import numpy as np

from pyqg_generative_tpu.utils.cache import configure_compilation_cache

configure_compilation_cache()

from pyqg_generative_tpu.qg.params import EDDY_PARAMS, YEAR
from pyqg_generative_tpu.qg.spectral import calc_ispec
from pyqg_generative_tpu.sim import run_simulation


def main(resolutions=(48, 64, 96, 128, 256), years=10.0,
         out="/tmp/grid_convergence.json"):
    results = {}
    spectra = {}
    for nx in resolutions:
        p = EDDY_PARAMS.with_nx(nx).replace(
            tmax=years * YEAR, tavestart=years * YEAR / 2,
            precision="single")
        ds = run_simulation(p, sampling_freq=100 * p.dt)
        late = ds["q"].values[ds["q"].shape[0] // 2:]
        u = ds["u"].values[ds["q"].shape[0] // 2:]
        v = ds["v"].values[ds["q"].shape[0] // 2:]
        ke = float(0.5 * (u ** 2 + v ** 2).mean())
        k, sp = calc_ispec(nx, ds["KEspec"].values[0])
        results[nx] = {"q_std": float(late.std()), "KE": ke}
        spectra[nx] = (k, sp)
        print(f"nx={nx}: q std {late.std():.3e}  KE {ke:.3e}", flush=True)

    # spectral convergence: each resolution vs the finest, over the coarse band
    kf, spf = spectra[max(resolutions)]
    for nx in resolutions[:-1]:
        k, sp = spectra[nx]
        nk = min(len(k), len(kf)) * 2 // 3
        rel = np.sqrt(np.mean((np.log10(sp[:nk] + 1e-30) -
                               np.log10(spf[:nk] + 1e-30)) ** 2))
        results[nx]["log10_KEspec_rms_vs_finest"] = float(rel)
        print(f"nx={nx}: log10 KE-spectrum RMS vs {max(resolutions)}: "
              f"{rel:.3f}", flush=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
