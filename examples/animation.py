"""Animation workflow: upper-layer PV movie of a GAN-parameterized run next
to the unparameterized low-resolution baseline (the reference's
notebooks/Animation.ipynb workflow).

Runs two short 48^2 simulations (GAN closure vs none), renders each snapshot
with the percentile-clipped balance colormap, and writes side-by-side GIF
frames via utils.plot.create_animation.

Usage:  python examples/animation.py [--model trained_models/eddy_gan_48_r3]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pyqg_generative_tpu.utils.cache import configure_compilation_cache

configure_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="trained_models/eddy_gan_48_r3")
    ap.add_argument("--out", default="/tmp/pv_animation.gif")
    ap.add_argument("--years", type=float, default=2.0)
    ap.add_argument("--nx", type=int, default=48)
    ap.add_argument("--fps", type=int, default=12)
    args = ap.parse_args()

    from pyqg_generative_tpu.models import load_model
    from pyqg_generative_tpu.qg.params import DAY, EDDY_PARAMS, YEAR
    from pyqg_generative_tpu.sim import run_simulation
    from pyqg_generative_tpu.utils.plot import create_animation

    p = EDDY_PARAMS.with_nx(args.nx).replace(
        tmax=args.years * YEAR, tavestart=args.years * YEAR,
        precision="single")
    model = load_model(args.model)

    print("running GAN-parameterized simulation...")
    ds_gan = run_simulation(p, {"self": model, "sampling": "constant",
                                "nsteps": 1}, sampling_freq=5 * DAY)
    print("running unparameterized baseline...")
    ds_lo = run_simulation(p, None, sampling_freq=5 * DAY)

    q_gan = ds_gan["q"].isel(lev=0).values
    q_lo = ds_lo["q"].isel(lev=0).values
    vmax = np.percentile(np.abs(q_gan), 99)
    pad = np.full((q_gan.shape[1], 2), np.nan)
    frames = [np.concatenate([a / vmax, pad, b / vmax], axis=1)
              for a, b in zip(q_gan, q_lo)]
    create_animation(frames, args.out, fps=args.fps)
    print(f"wrote {args.out} ({len(frames)} frames; "
          "left: GAN closure, right: unparameterized)")


if __name__ == "__main__":
    main()
