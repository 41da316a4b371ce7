"""Round-3 stable-epoch selection for GAN realizations whose final epoch
runs hot online (docs/VALIDATION.md round-2 eddy-GAN note): probe the banked
epochs (fit(retain_every=...)) with short coupled rollouts scored on
equilibrium amplitude + KE-spectrum shape, install the stable generator,
then run + score the full published-configuration online ensemble.

Run:  python scripts/r3_stable_epoch.py --models data_r2/eddy/models_Operator1_48/CGANRegression-0 [...]
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


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import numpy as np

    from pyqg_generative_tpu.exp.pipeline import (CONFIGURATIONS,
                                                  compute_online_metrics)
    from pyqg_generative_tpu.models import load_model
    from pyqg_generative_tpu.qg.params import ANDREW_1000_STEPS, YEAR
    from pyqg_generative_tpu.sim.simulate import run_ensemble_segmented
    from pyqg_generative_tpu.utils import xrlite as xr

    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", required=True)
    ap.add_argument("--cfg", default="eddy")
    ap.add_argument("--operator", default=None,
                    help="default: inferred from the model path's "
                         "models_{Operator}_{nx} component")
    ap.add_argument("--nx", type=int, default=None)
    ap.add_argument("--dt", type=float, default=None,
                    help="default: 7200 at 48^2 (published), dt-table above")
    ap.add_argument("--probe-years", type=float, default=3.0)
    ap.add_argument("--years", type=float, default=20.0)
    ap.add_argument("--n-ens", type=int, default=10)
    args = ap.parse_args()

    # Infer (operator, nx) from the first model's models_{op}_{nx} path
    # component — the 2026-08-18 chain probed a 64^2 model against the
    # 48^2 default target because the flags were omitted.
    cell = None
    for part in os.path.normpath(args.models[0]).split(os.sep):
        if part.startswith("models_Operator"):
            op_name, nx_s = part[len("models_"):].rsplit("_", 1)
            cell = (op_name, int(nx_s))
    if args.operator is None:
        if cell is None:
            ap.error("--operator not given and not inferable from the "
                     "model path")
        args.operator = cell[0]
    if args.nx is None:
        if cell is None:
            ap.error("--nx not given and not inferable from the model path")
        args.nx = cell[1]
    if cell is not None and (args.operator, args.nx) != cell:
        log(f"WARNING: flags ({args.operator},{args.nx}) disagree with "
            f"model path cell {cell}")
    if args.dt is None:
        args.dt = 7200.0 if args.nx == 48 else 14400.0 if args.nx <= 64 \
            else 7200.0

    from pyqg_generative_tpu.exp.pipeline import coarse_target_cached
    ref_glob = os.path.join(BASE, args.cfg, "reference_256", "*.npz")
    target = coarse_target_cached(ref_glob, args.operator, args.nx)
    tq = target["q"].values
    q_init = np.asarray(tq[0, -1] if tq.ndim == 5 else tq[-1],
                        np.float64)      # (lev, nx, nx) last snapshot, run 0
    target_std = float(np.std(tq))
    kespec = target["KEspec"].values
    if kespec.ndim == 4:
        kespec = kespec.mean(axis=0)

    # Physics params follow --cfg (round-4 advisor: probing a jet GAN with
    # eddy physics would silently produce invalid jet validation artifacts).
    p = CONFIGURATIONS[args.cfg].with_nx(args.nx).replace(
        tmax=args.years * YEAR, tavestart=5 * YEAR, dt=args.dt,
        precision="single")

    for folder in args.models:
        model = load_model(folder)
        if os.path.exists(os.path.join(folder, "G_stable.msgpack")):
            # probe already ran (restart): reuse the selected weights
            model.use_stable_epoch()
            best = "saved"
            log(f"{folder}: reusing saved G_stable.msgpack")
        else:
            t0 = time.time()
            best, results = model.select_stable_epoch(
                pyqg_params=p.replace(
                    tmax=args.probe_years * YEAR,
                    tavestart=0.5 * args.probe_years * YEAR),
                q_init=q_init, target_std=target_std, target_kespec=kespec)
            log(f"{folder}: stable epoch {best} "
                f"({(time.time() - t0) / 60:.1f} min probe)")
            with open(os.path.join(folder, "stable_epoch.json"), "w") as f:
                json.dump({"best": best,
                           "probe": {str(k): v for k, v in results.items()}},
                          f)
            if best is None:
                continue
        sub = f"{args.cfg}-constant-0-stable"
        metr = os.path.join(folder, f"metrics_{sub}.json")
        if os.path.exists(metr):
            continue
        ds = run_ensemble_segmented(
            p, {"self": model, "sampling": "constant", "nsteps": 1},
            n_ens=args.n_ens, sampling_freq=ANDREW_1000_STEPS, n_segments=4)
        os.makedirs(os.path.join(folder, sub), exist_ok=True)
        for j in range(args.n_ens):
            ds.isel(run=j).to_npz(os.path.join(folder, sub, f"{j}.npz"))
        norm = compute_online_metrics(BASE, folder, ref_glob, args.operator,
                                      args.nx, subfolder=sub,
                                      save_file=f"metrics_{sub}.json")
        log(f"online {os.path.basename(folder)}/{sub}: "
            f"distrib={norm['distrib_score']:.3f} "
            f"spectral={norm['spectral_score']:.3f}")


if __name__ == "__main__":
    main()
