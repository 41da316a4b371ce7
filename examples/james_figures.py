"""Reproduce the JAMES paper's headline figures from campaign outputs
(the reference's JAMES_figures.ipynb / online-simulations.ipynb workflow):

  Fig A — upper-layer PV snapshots: coarse-grained truth vs GAN vs lores;
  Fig B — isotropized KE spectra (both layers) of each run vs the
          coarse-grained 256^2 reference;
  Fig C — online score scatter (distributional vs spectral Wasserstein
          scores) for every model/realization in the quality campaign JSON.

Usage:  python examples/james_figures.py --base /root/repo/data_r2 \
            [--nx 48 --operator Operator2]
Writes PNGs under --out (default /tmp/james_figures).
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/repo/data_r2")
    ap.add_argument("--cfg", default="eddy")
    ap.add_argument("--nx", type=int, default=48)
    ap.add_argument("--operator", default="Operator2")
    ap.add_argument("--out", default="/tmp/james_figures")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pyqg_generative_tpu.eval.comparison import (
        coarsegrain_reference_dataset, dataset_statistics)
    from pyqg_generative_tpu.utils import xrlite as xr
    from pyqg_generative_tpu.utils.plot import (default_rcParams, imshow,
                                                set_letters)

    default_rcParams()
    os.makedirs(args.out, exist_ok=True)
    cfg, nx, op = args.cfg, args.nx, args.operator

    ref = xr.open_mfdataset(
        os.path.join(args.base, cfg, "reference_256", "*.npz"), "run")
    target = coarsegrain_reference_dataset(ref, nx, op)

    qjson = os.path.join(args.base, cfg, f"quality_{op}_{nx}.json")
    results = json.load(open(qjson)) if os.path.exists(qjson) else {}

    def runs_of(key):
        name, sub = key.split("/")
        folder = "lores" in name and \
            os.path.join(args.base, cfg, f"lores_{nx}", sub) or \
            os.path.join(args.base, cfg, f"models_{op}_{nx}", name, sub)
        return sorted(glob.glob(os.path.join(folder, "*.npz")))

    best = {}
    for key, r in results.items():
        fam = ("lores" if "lores" in key else
               "GAN" if "CGAN" in key else
               "VAE" if "CVAE" in key else "GZ")
        if fam not in best or r["distrib_score"] < best[fam][1]["distrib_score"]:
            best[fam] = (key, r)

    # ---- Fig A: PV snapshots ------------------------------------------
    panels = [("coarse-grained truth", target["q"])]
    for fam in ("GAN", "VAE", "GZ", "lores"):
        if fam in best:
            files = runs_of(best[fam][0])
            if files:
                ds = xr.Dataset.from_npz(files[0])
                panels.append((fam, ds["q"]))
    fig, axes = plt.subplots(1, len(panels), figsize=(3 * len(panels), 3))
    axes = np.atleast_1d(axes)
    for ax, (name, q) in zip(axes, panels):
        arr = q.values
        while arr.ndim > 2:
            arr = arr[-1] if arr.shape[0] > 4 else arr[0]
        imshow(arr, ax=ax)
        ax.set_title(name)
    set_letters(axes)
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "figA_pv_snapshots.png"), dpi=130)
    print("wrote figA_pv_snapshots.png")

    # ---- Fig B: KE spectra --------------------------------------------
    tstats = dataset_statistics(target)
    fig, axes = plt.subplots(1, 2, figsize=(9, 3.6))
    for lev in (0, 1):
        ax = axes[lev]
        sp = tstats["KEspec"].isel(lev=lev)
        ax.loglog(tstats["KEspec"].coords.get("kr", np.arange(sp.shape[-1])),
                  sp.values, "k-", lw=2, label="coarse-grained 256$^2$")
        for fam, style in (("GAN", "C0-"), ("VAE", "C2-"), ("GZ", "C4-"),
                           ("lores", "C1--")):
            if fam not in best:
                continue
            files = runs_of(best[fam][0])
            if not files:
                continue
            ds = xr.open_mfdataset(os.path.join(
                os.path.dirname(files[0]), "*.npz"), "run")
            st = dataset_statistics(ds)
            spm = st["KEspec"].isel(lev=lev)
            ax.loglog(st["KEspec"].coords.get(
                "kr", np.arange(spm.shape[-1])), spm.values, style,
                label=fam)
        ax.set_title(f"KE spectrum, layer {lev + 1}")
        ax.set_xlabel("k [m$^{-1}$]")
        if lev == 0:
            ax.set_ylabel("KE spectral density")
            ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "figB_ke_spectra.png"), dpi=130)
    print("wrote figB_ke_spectra.png")

    # ---- Fig C: online score scatter ----------------------------------
    if results:
        fig, ax = plt.subplots(figsize=(5, 4))
        for key, r in results.items():
            fam = ("lores" if "lores" in key else
                   "GAN" if "CGAN" in key else
                   "VAE" if "CVAE" in key else "GZ")
            color = {"GAN": "C0", "VAE": "C2", "GZ": "C4",
                     "lores": "C1"}[fam]
            marker = "*" if key == best.get(fam, (None,))[0] else "o"
            ax.scatter(r["distrib_score"], r["spectral_score"], c=color,
                       marker=marker, s=90 if marker == "*" else 30,
                       label=fam if marker == "*" else None)
        ax.set_xlabel("distributional score (lower = better)")
        ax.set_ylabel("spectral score")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "figC_online_scores.png"),
                    dpi=130)
        print("wrote figC_online_scores.png")


if __name__ == "__main__":
    main()
