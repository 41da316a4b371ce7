"""End-to-end JAMES pipeline demo on one TPU chip (reduced scale).

Stages (reference README.md:29-41):
  1. 256^2 eddy reference ensemble (online-metric target)
  2. coarse-grain the reference to 64^2 (Operator2)
  3. N_forcing 256^2 DNS runs emitting Operator2-64 forcing datasets
  4. train the GAN closure on them
  5. 10-member online GAN-parameterized 64^2 ensemble
  6. online similarity metrics (Wasserstein + spectral) vs the target,
     compared against the unparameterized low-resolution baseline

Writes all artifacts under --workdir and a metrics JSON at the end.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pyqg_generative_tpu.utils.cache import configure_compilation_cache

configure_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/james_demo")
    ap.add_argument("--n-forcing", type=int, default=30)
    ap.add_argument("--n-ref", type=int, default=5)
    ap.add_argument("--ref-years", type=float, default=10.0)
    ap.add_argument("--online-years", type=float, default=10.0)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--operator", default="Operator2")
    args = ap.parse_args()

    from pyqg_generative_tpu.eval.comparison import (
        coarsegrain_reference_dataset, diagnostic_differences,
        distrib_score, spectral_score)
    from pyqg_generative_tpu.models import CGANRegression
    from pyqg_generative_tpu.qg.params import EDDY_PARAMS, YEAR
    from pyqg_generative_tpu.sim import (generate_subgrid_forcing,
                                         run_ensemble)
    from pyqg_generative_tpu.utils import xrlite as xr

    os.makedirs(args.workdir, exist_ok=True)
    log = lambda *a: print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

    # ---- stage 1: high-res reference --------------------------------------
    ref_path = os.path.join(args.workdir, "reference256.npz")
    if not os.path.exists(ref_path):
        log(f"stage 1: {args.n_ref}-member 256^2 reference, "
            f"{args.ref_years} yr")
        p_ref = EDDY_PARAMS.with_nx(256).replace(
            tmax=args.ref_years * YEAR, tavestart=args.ref_years * YEAR / 2,
            precision="single")
        t0 = time.time()
        ref = run_ensemble(p_ref, n_ens=args.n_ref)
        log(f"  done in {time.time() - t0:.0f}s")
        ref.to_npz(ref_path)
    ref = xr.Dataset.from_npz(ref_path)

    # ---- stage 2: coarse-grain the target ----------------------------------
    log("stage 2: coarse-grain reference ->", args.nx)
    target = coarsegrain_reference_dataset(ref, args.nx, args.operator)

    # ---- stage 3: forcing datasets -----------------------------------------
    combo = f"{args.operator}-{args.nx}-dealias"
    fdir = os.path.join(args.workdir, combo)
    os.makedirs(fdir, exist_ok=True)
    p_dns = EDDY_PARAMS.with_nx(256).replace(tmax=10 * YEAR,
                                             precision="single")
    for run in range(args.n_forcing):
        path = os.path.join(fdir, f"{run}.npz")
        if os.path.exists(path):
            continue
        t0 = time.time()
        out = generate_subgrid_forcing([args.nx], p_dns,
                                       operators=(args.operator,), key=run)
        out[combo].to_npz(path)
        log(f"stage 3: forcing run {run + 1}/{args.n_forcing} "
            f"({time.time() - t0:.0f}s)")

    data = xr.open_mfdataset(os.path.join(fdir, "*.npz"), "run")
    nrun = data["q"].sizes()["run"]
    ds_train = data.isel(run=slice(0, int(0.8 * nrun)))
    ds_test = data.isel(run=slice(int(0.8 * nrun), nrun))
    log(f"training data: {nrun} runs x {data['q'].shape[1]} snapshots")

    # ---- stage 4: train the GAN --------------------------------------------
    model_dir = os.path.join(args.workdir, f"gan_model_{args.nx}")
    model = CGANRegression(nx=args.nx, folder=model_dir)
    if model.vars_G is None:
        log(f"stage 4: GAN training, {args.epochs} epochs")
        t0 = time.time()
        model.fit(ds_train, ds_test, num_epochs=args.epochs, nruns=2,
                  verbose=True)
        log(f"  trained in {time.time() - t0:.0f}s")
    offline = model.test_offline(ds_test, ensemble_size=64)
    log(f"offline: L2_mean={float(offline['L2_mean'].values):.3f} "
        f"L2_total={float(offline['L2_total'].values):.3f} "
        f"L2_residual={float(offline['L2_residual'].values):.3f} "
        f"var_ratio={np.mean(offline['var_ratio'].values):.3f}")
    offline.to_npz(os.path.join(model_dir, "offline_test.npz"))

    # ---- stage 5: online runs ----------------------------------------------
    p_online = EDDY_PARAMS.with_nx(args.nx).replace(
        tmax=args.online_years * YEAR,
        tavestart=args.online_years * YEAR / 2, precision="single")
    log("stage 5: 10-member online GAN ensemble at", args.nx)
    t0 = time.time()
    online = run_ensemble(p_online, {"self": model, "sampling": "AR1",
                                     "nsteps": 1}, n_ens=10)
    log(f"  done in {time.time() - t0:.0f}s")
    online.to_npz(os.path.join(args.workdir, "online_gan.npz"))
    log("stage 5b: 10-member unparameterized lores baseline")
    lores = run_ensemble(p_online, n_ens=10)
    lores.to_npz(os.path.join(args.workdir, "online_lores.npz"))

    # ---- stage 6: online metrics -------------------------------------------
    log("stage 6: online metrics")
    results = {}
    for name, ds in (("GAN", online), ("lores", lores)):
        norm, _, _ = diagnostic_differences(ds, target, T=128)
        results[name] = {"distrib_score": distrib_score(norm),
                         "spectral_score": spectral_score(norm), **norm}
        log(f"  {name}: distrib={results[name]['distrib_score']:.4f} "
            f"spectral={results[name]['spectral_score']:.4f}")
    with open(os.path.join(args.workdir, "online_metrics.json"), "w") as f:
        json.dump(results, f, indent=1)
    log("reference JAMES values at 48^2: GAN 0.035/0.221, lores 0.189/0.505")


if __name__ == "__main__":
    main()
