"""Supplementary online passes for trained 48^2 eddy models:
  * AR1 white-noise at the dt-table step (14400 s) — the configuration
    round-1 validated; doubled numerical dissipation stabilizes marginal
    GAN realizations;
  * optional decorrelation sweep at the published dt.

Run: python scripts/online_extra.py [--dt 14400] [--models glob]
"""
import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyqg_generative_tpu.utils.cache import configure_compilation_cache

configure_compilation_cache()

BASE = "/root/repo/data_r2"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="eddy")
    ap.add_argument("--nx", type=int, default=48)
    ap.add_argument("--operator", default="Operator2")
    ap.add_argument("--dt", type=float, default=14400.0)
    ap.add_argument("--sampling", default="AR1")
    ap.add_argument("--nsteps", type=int, default=1)
    ap.add_argument("--models", default="CGANRegression-*")
    ap.add_argument("--with-opt", action="store_true")
    ap.add_argument("--also-lores", action="store_true")
    ap.add_argument("--n-ens", type=int, default=10)
    args = ap.parse_args()

    from pyqg_generative_tpu.exp.pipeline import compute_online_metrics
    from pyqg_generative_tpu.models import load_model
    from pyqg_generative_tpu.qg.params import (ANDREW_1000_STEPS,
                                               EDDY_PARAMS, JET_PARAMS, YEAR)
    from pyqg_generative_tpu.sim import run_ensemble

    cfg, op, nx = args.cfg, args.operator, args.nx
    ref_glob = os.path.join(BASE, cfg, "reference_256", "*.npz")
    p = (EDDY_PARAMS if cfg == "eddy" else JET_PARAMS).with_nx(nx).replace(
        tmax=20 * YEAR, tavestart=5 * YEAR, dt=args.dt, precision="single")
    tag = f"{cfg}-{args.sampling}-{args.nsteps - 1 if args.sampling == 'constant' else args.nsteps}-dt{int(args.dt)}"

    def one(model_folder, sub, use_opt):
        metr = os.path.join(model_folder, f"metrics_{sub}.json")
        if os.path.exists(metr):
            return json.load(open(metr))
        model = None
        if model_folder != os.path.join(BASE, cfg, f"lores_{nx}"):
            model = load_model(model_folder)
            if use_opt and not model.use_optimal_epoch():
                return None
        t0 = time.time()
        param = None if model is None else \
            {"self": model, "sampling": args.sampling, "nsteps": args.nsteps}
        ds = run_ensemble(p, param, n_ens=args.n_ens,
                          sampling_freq=ANDREW_1000_STEPS)
        folder = os.path.join(model_folder, sub)
        os.makedirs(folder, exist_ok=True)
        for j in range(args.n_ens):
            ds.isel(run=j).to_npz(os.path.join(folder, f"{j}.npz"))
        norm = compute_online_metrics(BASE, model_folder, ref_glob, op, nx,
                                      subfolder=sub,
                                      save_file=f"metrics_{sub}.json")
        print(f"[{time.strftime('%H:%M:%S')}] {model_folder}/{sub}: "
              f"distrib={norm['distrib_score']:.3f} "
              f"spectral={norm['spectral_score']:.3f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        return norm

    if args.also_lores:
        ldir = os.path.join(BASE, cfg, f"lores_{nx}")
        os.makedirs(ldir, exist_ok=True)
        one(ldir, tag, False)
    for mf in sorted(glob.glob(os.path.join(
            BASE, cfg, f"models_{op}_{nx}", args.models))):
        if not os.path.exists(os.path.join(mf, "model_args.json")):
            continue
        one(mf, tag, False)
        if args.with_opt:
            one(mf, tag + "-opt", True)


if __name__ == "__main__":
    main()
