"""Round-2 forecasting campaign: the reference's ensemble-forecast matrix
(scripts/run_forecasting.py:8-62) with skill metrics.

15 ICs (coarse-grained 256^2 reference snapshots) x 15 members x
decorrelation in {0,12,24,36,48} h x 90 days, for the chosen trained model;
then eval.forecast skill/spread tables per decorrelation.

Run:  python scripts/campaign_r2_forecast.py --model <folder> [--nx 48]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--cfg", default="eddy")
    ap.add_argument("--nx", type=int, default=48)
    ap.add_argument("--operator", default="Operator2")
    ap.add_argument("--n-ic", type=int, default=15)
    ap.add_argument("--n-ens", type=int, default=15)
    ap.add_argument("--days", type=float, default=90.0)
    ap.add_argument("--decorrelations", type=int, nargs="+",
                    default=[0, 12, 24, 36, 48])
    ap.add_argument("--out-base", default=None)
    ap.add_argument("--truth", action="store_true",
                    help="also run the 256^2 truth continuations for "
                         "independent-truth verification")
    ap.add_argument("--epoch", default="final",
                    choices=["final", "opt", "stable"],
                    help="generator weights to forecast with")
    args = ap.parse_args()

    from pyqg_generative_tpu.eval.forecast import forecast_skill_table
    from pyqg_generative_tpu.exp.pipeline import (run_forecast_truth,
                                                  run_forecasting)

    out_base = args.out_base or os.path.join(
        BASE, args.cfg, f"forecast_{os.path.basename(args.model)}")
    ic_glob = os.path.join(BASE, args.cfg, "reference_256", "*.npz")

    t0 = time.time()
    if args.truth:
        # independent verifying truth: continue the 256^2 trajectory from
        # each IC and coarse-grain (shared across decorrelation subfolders;
        # spread_skill_dataset auto-detects truth_{n}.npz one level up)
        run_forecast_truth(out_base, ic_glob, configuration=args.cfg,
                           nx=args.nx, operator=args.operator,
                           n_ic=args.n_ic, days=args.days)
        print(f"[{time.strftime('%H:%M:%S')}] truth continuations done "
              f"({time.time() - t0:.0f}s)", flush=True)
    for dec in args.decorrelations:
        folder = os.path.join(out_base, "forecast", f"decorrelation-{dec}h")
        if os.path.isdir(folder) and \
                len(os.listdir(folder)) >= args.n_ic:
            continue
        run_forecasting(out_base, args.model, ic_glob,
                        configuration=args.cfg, nx=args.nx,
                        n_ic=args.n_ic, n_ens=args.n_ens,
                        decorrelations=(dec,), days=args.days,
                        operator=args.operator, epoch=args.epoch)
        print(f"[{time.strftime('%H:%M:%S')}] decorrelation {dec}h done "
              f"({time.time() - t0:.0f}s)", flush=True)

    table = forecast_skill_table(out_base, args.decorrelations,
                                 n_ens=args.n_ens)
    path = os.path.join(out_base, "skill_table.json")
    with open(path, "w") as f:
        json.dump(table, f, indent=1)
    print("wrote", path)
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
