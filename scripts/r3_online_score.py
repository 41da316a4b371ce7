"""Generic one-off online scorer: run a trained closure (or the
unparameterized baseline) as a 10-member 20-yr coupled ensemble at a chosen
(operator, nx, dt) cell and score it against the coarse-grained 256^2
reference — the reference's run_parameterized.py + comparison_tools flow for
a single cell.

Run:  python scripts/r3_online_score.py --model data_r2/eddy/models_Operator2_48/MeanVarModel-0 \
          --operator Operator2 --nx 48 --dt 7200 --sub eddy-constant-0-dt7200 [--epoch stable] [--segments 12]
"""
import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="model folder, or 'lores' for the baseline")
    ap.add_argument("--cfg", default="eddy")
    ap.add_argument("--operator", default="Operator2")
    ap.add_argument("--nx", type=int, default=48)
    ap.add_argument("--dt", type=float, default=None,
                    help="override the resolution dt-table value")
    ap.add_argument("--years", type=float, default=20.0)
    ap.add_argument("--n-ens", type=int, default=10)
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--sampling", default="constant")
    ap.add_argument("--nsteps", type=int, default=1)
    ap.add_argument("--sub", required=True, help="output subfolder name")
    ap.add_argument("--epoch", default="final",
                    choices=["final", "opt", "stable"])
    ap.add_argument("--online-backend", default="xla",
                    choices=["xla", "pallas"],
                    help="online CNN backend (GAN/GZ support 'pallas' — "
                         "the fused VMEM-resident kernel; also a different "
                         "compiled program, useful when the XLA conv "
                         "program trips the axon worker at 96^2)")
    args = ap.parse_args()

    from pyqg_generative_tpu.exp.pipeline import (CONFIGURATIONS,
                                                  compute_online_metrics)
    from pyqg_generative_tpu.models import load_model
    from pyqg_generative_tpu.qg.params import ANDREW_1000_STEPS, YEAR
    from pyqg_generative_tpu.sim.simulate import run_ensemble_segmented

    ref_glob = os.path.join(BASE, args.cfg, "reference_256", "*.npz")
    p = CONFIGURATIONS[args.cfg].with_nx(args.nx).replace(
        tmax=args.years * YEAR, tavestart=5 * YEAR, precision="single")
    if args.dt is not None:
        p = p.replace(dt=args.dt)

    if args.model == "lores":
        mdir = os.path.join(BASE, args.cfg, f"lores_{args.nx}")
        param = None
    else:
        mdir = args.model
        model = load_model(mdir)
        if args.online_backend != "xla" and \
                hasattr(model, "online_backend"):
            model.online_backend = args.online_backend
        if args.epoch != "final":
            ok = {"opt": getattr(model, "use_optimal_epoch", lambda: False),
                  "stable": getattr(model, "use_stable_epoch",
                                    lambda: False)}[args.epoch]()
            if not ok:
                raise FileNotFoundError(
                    f"no '{args.epoch}' weights in {mdir}")
        param = {"self": model, "sampling": args.sampling,
                 "nsteps": args.nsteps}

    metr_file = os.path.join(mdir, f"metrics_{args.sub}.json")
    if os.path.exists(metr_file):
        log(f"{metr_file} exists — skipping")
        return
    t0 = time.time()
    out = os.path.join(mdir, args.sub)
    if not os.path.exists(os.path.join(out, f"{args.n_ens - 1}.npz")):
        ds = run_ensemble_segmented(p, param, n_ens=args.n_ens,
                                    sampling_freq=ANDREW_1000_STEPS,
                                    n_segments=args.segments)
        os.makedirs(out, exist_ok=True)
        for j in range(args.n_ens):
            ds.isel(run=j).to_npz(os.path.join(out, f"{j}.npz"))
    norm = compute_online_metrics(BASE, mdir, ref_glob, args.operator,
                                  args.nx, subfolder=args.sub,
                                  save_file=f"metrics_{args.sub}.json")
    log(f"{os.path.basename(mdir)}/{args.sub}: "
        f"distrib={norm['distrib_score']:.3f} "
        f"spectral={norm['spectral_score']:.3f} "
        f"({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
