"""Round-5 (VERDICT round-4 item 9): train one CGANRegression with the
DeepInversion U-Net generator at 48^2 and take it through the same
offline + epoch-banking pipeline as the AndrewCNN cells, matching the
reference's `CGANRegression-Unet` forecasting variant
(/root/reference/scripts/run_forecasting.py:25; generator defined in
/root/reference/pyqg_generative/tools/deep_inversion.py).

The online score afterwards goes through scripts/r3_online_score.py (the
model folder's model_args.json records generator='DeepInversion'; the
U-Net is pallas-ineligible so the online backend stays 'xla').

Run:  python scripts/r5_unet_gan.py [--nx 48] [--operator Operator1]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyqg_generative_tpu.utils.cache import configure_compilation_cache

configure_compilation_cache()

BASE = "/root/repo/data_r2"


def main():
    from campaign_r2_quality import load_split, log

    from pyqg_generative_tpu.models.cgan_regression import CGANRegression

    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="eddy")
    ap.add_argument("--operator", default="Operator1")
    ap.add_argument("--nx", type=int, default=48)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data-cap", type=int, default=300)
    ap.add_argument("--epochs", type=int, default=0,
                    help="0 = family default")
    ap.add_argument("--retain-every", type=int, default=10)
    args = ap.parse_args()

    folder = os.path.join(BASE, args.cfg,
                          f"models_{args.operator}_{args.nx}",
                          f"CGANRegression-Unet-{args.seed}")
    if os.path.exists(os.path.join(folder, "model_args.json")):
        log(f"{folder} already trained — nothing to do")
        return

    ds_train, ds_val, ds_test = load_split(
        args.cfg, args.operator, args.nx, args.data_cap)

    t0 = time.time()
    kw = {}
    if args.epochs:
        kw["num_epochs"] = args.epochs
    model = CGANRegression(folder=folder, nx=args.nx,
                           generator="DeepInversion")
    model.fit(ds_train, ds_val, key=args.seed, verbose=False,
              retain_every=args.retain_every, **kw)
    off = model.test_offline(ds_test, ensemble_size=1000)
    off.to_npz(os.path.join(folder, "offline_test.npz"))
    log(f"trained CGANRegression-Unet-{args.seed} at "
        f"{args.operator}x{args.nx} in {(time.time() - t0) / 60:.1f} min; "
        f"L2_mean={float(off['L2_mean'].values):.3f} "
        f"L2_total={float(off['L2_total'].values):.3f}")


if __name__ == "__main__":
    main()
