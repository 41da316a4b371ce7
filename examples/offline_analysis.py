"""Offline analysis of a trained closure (parity with the reference's
Google-Colab/offline-analysis.ipynb workflow): load a pretrained model,
evaluate the full offline metric dataset on held-out forcing data, and save
the standard figures (forcing snapshots, power spectra, energy-flux
cospectra, sigma-normalized PDFs)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pyqg_generative_tpu.utils.cache import configure_compilation_cache

configure_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-folder",
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "trained_models", "eddy_gan_48"))
    ap.add_argument("--data", default="/tmp/james_demo/Operator2-48-dealias",
                    help="folder of forcing .npz runs; generated if missing")
    ap.add_argument("--out", default="/tmp/offline_analysis")
    ap.add_argument("--ensemble-size", type=int, default=64)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pyqg_generative_tpu.models import load_model
    from pyqg_generative_tpu.qg.params import EDDY_PARAMS, YEAR
    from pyqg_generative_tpu.sim import generate_subgrid_forcing
    from pyqg_generative_tpu.utils import xrlite as xr
    from pyqg_generative_tpu.utils.plot import default_rcParams, imshow

    default_rcParams()
    os.makedirs(args.out, exist_ok=True)
    model = load_model(args.model_folder)
    nx = model.nx

    if os.path.isdir(args.data):
        import glob
        files = sorted(glob.glob(os.path.join(args.data, "*.npz")))[-2:]
        ds = xr.open_mfdataset(files, "run")
    else:
        p = EDDY_PARAMS.with_nx(256).replace(tmax=5 * YEAR,
                                             precision="single")
        out = generate_subgrid_forcing([nx], p, operators=("Operator2",),
                                       key=999)
        ds = out[f"Operator2-{nx}-dealias"]

    offline = model.test_offline(ds, ensemble_size=args.ensemble_size)
    print("scalar metrics:")
    for k in ("R2_mean", "R2_total", "R2_residual", "L2_mean", "L2_total",
              "L2_residual"):
        print(f"  {k}: {float(offline[k].values):.4f}")
    print(f"  var_ratio: {np.mean(offline['var_ratio'].values):.4f}")

    # figure 1: true vs generated forcing snapshots
    fig, axes = plt.subplots(1, 3, figsize=(10, 3.2))
    t = offline["q_forcing_advection"].shape[1] - 1
    imshow(offline["q_forcing_advection"].values[0, t, 0], ax=axes[0])
    axes[0].set_title("true forcing (upper)")
    imshow(offline["q_forcing_advection_gen"].values[0, t, 0], ax=axes[1])
    axes[1].set_title("GAN sample")
    imshow(offline["q_forcing_advection_mean"].values[0, t, 0], ax=axes[2])
    axes[2].set_title("GAN mean")
    fig.savefig(os.path.join(args.out, "forcing_snapshots.png"))
    plt.close(fig)

    # figure 2: spectra
    fig, axes = plt.subplots(1, 2, figsize=(9, 3.5))
    k = offline["PSD"].coords["k"]
    for name, style in (("PSD", "k-"), ("PSD_gen", "r--"),
                        ("PSD_mean", "b:")):
        axes[0].loglog(k, offline[name].values[0], style, label=name)
    axes[0].legend()
    axes[0].set_title("forcing power spectra (upper layer)")
    for name, style in (("Eflux", "k-"), ("Eflux_gen", "r--")):
        axes[1].semilogx(k, offline[name].values[0], style, label=name)
    axes[1].legend()
    axes[1].set_title("energy-flux cospectrum")
    fig.savefig(os.path.join(args.out, "spectra.png"))
    plt.close(fig)

    # figure 3: PDFs
    fig, axes = plt.subplots(1, 2, figsize=(9, 3.5))
    for suffix, style in (("", "k-"), ("_gen", "r--")):
        axes[0].semilogy(offline[f"PDF{suffix}0"].coords["q_0"],
                         offline[f"PDF{suffix}0"].values, style)
    axes[0].set_title("forcing PDF (upper)")
    for suffix, style in (("_res", "k-"), ("_gen_res", "r--")):
        axes[1].semilogy(offline[f"PDF{suffix}0"].coords["dq_0"],
                         offline[f"PDF{suffix}0"].values, style)
    axes[1].set_title("residual PDF (upper)")
    fig.savefig(os.path.join(args.out, "pdfs.png"))
    plt.close(fig)
    print("figures saved to", args.out)


if __name__ == "__main__":
    main()
