"""Round-3 campaign A: run the PUBLISHED pretrained weights online.

VERDICT round-2 next-round #1: the published Colab checkpoints (ported to
flax by scripts/port_reference_weights.py, forward-verified < 2e-6) are run
online at the exact published configuration — EDDY nx=48, dt=7200 s,
tmax=20 yr, sampling='AR1', nsteps=1 (white noise), reference
Google-Colab/online-simulations.ipynb cell 11 — and scored against the
coarse-grained 256^2 reference.

This splits the eddy-GAN online-stability question: if the published GAN is
stable and reproduces its published scores (0.0348/0.2213) here, the solver
and coupling are validated and the round-2 instability is a training-dynamics
property; if it runs hot too, the coupling/solver audit gets a concrete
published-weights reproducer.

It also executes VERDICT item 4 (lores distributional-gap audit): the
published notebook scores a SINGLE 20-yr run against reference MEMBER 0 of
the zarr 'eddy/48/hires-sharp' dataset (cells 29-33: `reference.isel(run=0)`,
`lores.isel(run=0)`), while round 2 scored 10-member ensembles against the
full Operator2-coarsened reference — so every (operator, protocol) combo is
scored here: operator in {Operator1, Operator2, Operator5} x protocol in
{run0-vs-run0 (published), ensemble-vs-ensemble (round 2)}.

Restartable: stages skip existing outputs.
Run: python scripts/campaign_r3_published_weights.py
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyqg_generative_tpu.utils.cache import configure_compilation_cache

configure_compilation_cache()

BASE = "/root/repo/data_r2"
TM = "/root/repo/trained_models"
OUT_JSON = os.path.join(BASE, "eddy", "published_weights_r3.json")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def published_params(years=20.0):
    from pyqg_generative_tpu.qg.params import EDDY_PARAMS, YEAR
    return EDDY_PARAMS.with_nx(48).replace(
        dt=7200.0, tmax=years * YEAR, tavestart=5 * YEAR,
        precision="single")


def run_stage(jobs, n_ens=10, years=20.0, n_segments=4):
    """jobs: list of (model_folder, subfolder, sampling, nsteps)."""
    from pyqg_generative_tpu.models import load_model
    from pyqg_generative_tpu.qg.params import ANDREW_1000_STEPS
    from pyqg_generative_tpu.sim.simulate import run_ensemble_segmented

    p = published_params(years)
    for model_folder, subfolder, sampling, nsteps in jobs:
        folder = os.path.join(model_folder, subfolder)
        if os.path.exists(os.path.join(folder, f"{n_ens - 1}.npz")):
            log(f"skip existing {folder}")
            continue
        t0 = time.time()
        model = load_model(model_folder) if model_folder != "lores" else None
        param = None if model is None else \
            {"self": model, "sampling": sampling, "nsteps": nsteps}
        ds = run_ensemble_segmented(p, param, n_ens=n_ens,
                                    sampling_freq=ANDREW_1000_STEPS,
                                    n_segments=n_segments)
        os.makedirs(folder, exist_ok=True)
        for j in range(n_ens):
            ds.isel(run=j).to_npz(os.path.join(folder, f"{j}.npz"))
        import numpy as np
        q = ds["q"].values
        nt = q.shape[1]
        std_late = float(np.std(q[:, nt // 2:]))
        log(f"ran {folder}: q std (2nd half) = {std_late:.3e} "
            f"({time.time() - t0:.0f}s)")


def get_target(operator, resolution=48):
    """Coarse-grained 256^2 reference for one operator (cached sidecar)."""
    from pyqg_generative_tpu.eval.comparison import \
        coarsegrain_reference_dataset
    from pyqg_generative_tpu.utils import xrlite as xr
    ref_dir = os.path.join(BASE, "eddy", "reference_256")
    cache = os.path.join(ref_dir, f".coarse_{operator}_{resolution}.npz")
    if os.path.exists(cache):
        return xr.Dataset.from_npz(cache)
    ref = xr.open_mfdataset(os.path.join(ref_dir, "[0-9].npz"), "run")
    target = coarsegrain_reference_dataset(ref, resolution, operator)
    target.to_npz(cache)
    return target


def score_stage(run_dirs, operators=("Operator1", "Operator2", "Operator5"),
                protocols=("run0", "ensemble")):
    """Score every run dir under every (operator, protocol) combination."""
    from pyqg_generative_tpu.eval.comparison import (diagnostic_differences,
                                                     distrib_score,
                                                     spectral_score)
    from pyqg_generative_tpu.utils import xrlite as xr

    results = {}
    if os.path.exists(OUT_JSON):
        with open(OUT_JSON) as f:
            results = json.load(f)
    targets = {}
    for name, folder in run_dirs.items():
        files = os.path.join(folder, "[0-9].npz")
        import glob as _glob
        if not _glob.glob(files):
            log(f"score: no runs in {folder}, skipping")
            continue
        ds_all = xr.open_mfdataset(files, "run")
        for operator in operators:
            if operator not in targets:
                targets[operator] = get_target(operator)
            target = targets[operator]
            for protocol in protocols:
                key = f"{name}|{operator}|{protocol}"
                if key in results:
                    continue
                if protocol == "run0":
                    dsm = ds_all.isel(run=slice(0, 1))
                    dst = target.isel(run=slice(0, 1))
                else:
                    dsm, dst = ds_all, target
                norm, _, _ = diagnostic_differences(dsm, dst, T=128)
                norm["distrib_score"] = distrib_score(norm)
                norm["spectral_score"] = spectral_score(norm)
                results[key] = norm
                log(f"{key}: distrib={norm['distrib_score']:.4f} "
                    f"spectral={norm['spectral_score']:.4f}")
                with open(OUT_JSON, "w") as f:
                    json.dump(results, f, indent=1)
    return results


def print_table(results):
    pub = {"colab_gan": (0.0348, 0.2213), "colab_vae": (0.0414, 0.2144),
           "colab_gz": (0.2089, 0.4819), "lores": (0.1888, 0.5054)}
    print("\n=== published-weights online scores "
          "(distrib / spectral; published in []) ===")
    for key in sorted(results):
        n = results[key]
        tag = key.split("|")[0].rsplit("_48", 1)[0]
        extra = ""
        for p, v in pub.items():
            if tag.startswith(p):
                extra = f"  [pub {v[0]:.4f}/{v[1]:.4f}]"
        print(f"{key:55s} {n['distrib_score']:.4f} / "
              f"{n['spectral_score']:.4f}{extra}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--years", type=float, default=20.0)
    ap.add_argument("--n-ens", type=int, default=10)
    ap.add_argument("--stage", default="all",
                    choices=["all", "run", "score"])
    args = ap.parse_args()

    jobs = [
        (f"{TM}/colab_gan_48", "published-AR1-1", "AR1", 1),
        (f"{TM}/colab_vae_48", "published-AR1-1", "AR1", 1),
        (f"{TM}/colab_gz_48", "published-AR1-1", "AR1", 1),
    ]
    if args.stage in ("all", "run"):
        run_stage(jobs, n_ens=args.n_ens, years=args.years)

    run_dirs = {
        "colab_gan_48": f"{TM}/colab_gan_48/published-AR1-1",
        "colab_vae_48": f"{TM}/colab_vae_48/published-AR1-1",
        "colab_gz_48": f"{TM}/colab_gz_48/published-AR1-1",
        # round-2 lores at the same published config (on disk)
        "lores_48": os.path.join(BASE, "eddy", "lores_48", "eddy-none-0"),
    }
    if args.stage in ("all", "score"):
        results = score_stage(run_dirs)
        print_table(results)


if __name__ == "__main__":
    main()
