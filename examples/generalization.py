"""Generalization (eddy <-> jet) workflow — the reference's
notebooks/generalization.ipynb: how well does a closure trained on one
configuration predict the subgrid forcing of the other?

Reads the offline_test.npz / offline_transfer.npz files produced by
scripts/campaign_r2_quality.py (--transfer-cfg) and prints the in-domain vs
out-of-domain skill table; optionally plots the R^2 comparison.

Usage:  python examples/generalization.py --base /root/repo/data_r2
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/repo/data_r2")
    ap.add_argument("--nx", type=int, default=48)
    ap.add_argument("--operator", default="Operator2")
    ap.add_argument("--plot", default=None,
                    help="optional output PNG path")
    args = ap.parse_args()

    from pyqg_generative_tpu.utils import xrlite as xr

    rows = []
    for cfg in ("eddy", "jet"):
        mdir = os.path.join(args.base, cfg,
                            f"models_{args.operator}_{args.nx}")
        for folder in sorted(glob.glob(os.path.join(mdir, "*"))):
            name = os.path.basename(folder)
            test_f = os.path.join(folder, "offline_test.npz")
            trans_f = os.path.join(folder, "offline_transfer.npz")
            if not os.path.exists(test_f):
                continue
            row = {"trained_on": cfg, "model": name}
            for label, path in (("in-domain", test_f),
                                ("transfer", trans_f)):
                if not os.path.exists(path):
                    continue
                ds = xr.Dataset.from_npz(path)
                row[label] = {
                    "L2_mean": float(ds["L2_mean"].values),
                    "L2_total": float(ds["L2_total"].values),
                    "var_ratio": float(np.mean(ds["var_ratio"].values)),
                }
            rows.append(row)

    if not rows:
        print("no offline test files found — run "
              "scripts/campaign_r2_quality.py (--transfer-cfg) first")
        return

    hdr = (f"{'trained on':<8} {'model':<22} "
           f"{'L2_mean in/out':<18} {'L2_total in/out':<18} "
           f"{'var_ratio in/out'}")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        i = r.get("in-domain", {})
        o = r.get("transfer", {})

        def pair(k):
            a = i.get(k)
            b = o.get(k)
            fa = f"{a:.3f}" if a is not None else "--"
            fb = f"{b:.3f}" if b is not None else "--"
            return f"{fa}/{fb}"

        print(f"{r['trained_on']:<8} {r['model']:<22} "
              f"{pair('L2_mean'):<18} {pair('L2_total'):<18} "
              f"{pair('var_ratio')}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(5, 4))
        for r in rows:
            if "in-domain" in r and "transfer" in r:
                ax.scatter(r["in-domain"]["L2_total"],
                           r["transfer"]["L2_total"],
                           c="C0" if r["trained_on"] == "eddy" else "C1",
                           label=r["trained_on"])
        lim = ax.get_xlim()
        ax.plot(lim, lim, "k--", lw=0.8)
        ax.set_xlabel("L2_total in-domain")
        ax.set_ylabel("L2_total transfer")
        handles, labels = ax.get_legend_handles_labels()
        uniq = dict(zip(labels, handles))
        ax.legend(uniq.values(), uniq.keys())
        fig.tight_layout()
        fig.savefig(args.plot, dpi=130)
        print("wrote", args.plot)


if __name__ == "__main__":
    main()
