"""Vmapped multi-replica training driver (ml.multifit): K GAN or VAE
realizations — across seeds and/or operators — in ONE XLA program on one
chip, replacing the reference's 5-SLURM-jobs-per-configuration protocol
(scripts/train_parameterizations.py:26-35).

Replica spec: `operator:seed`, e.g.
  python scripts/train_multi.py --model CGANRegression --nx 48 \
      --replicas Operator1:0 Operator1:1 Operator1:2 Operator1:3 Operator1:4 \
      --retain-every 10
  python scripts/train_multi.py --model CGANRegression --nx 96 \
      --replicas Operator1:0 Operator2:0 --data-cap 150 --retain-every 10

Skip-existing per replica folder; offline test written per replica as in
campaign_r2_quality.train_stage.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyqg_generative_tpu.utils.cache import configure_compilation_cache

configure_compilation_cache()

from campaign_r2_quality import BASE, load_split, log


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="eddy")
    ap.add_argument("--nx", type=int, default=48)
    ap.add_argument("--model", default="CGANRegression",
                    choices=["CGANRegression", "CVAERegression"])
    ap.add_argument("--replicas", nargs="+", required=True,
                    help="operator:seed specs, e.g. Operator1:0 Operator2:0")
    ap.add_argument("--data-cap", type=int, default=300)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--nruns", type=int, default=5)
    ap.add_argument("--retain-every", type=int, default=0)
    args = ap.parse_args()

    from pyqg_generative_tpu.ml.multifit import (fit_gan_ensemble,
                                                 fit_vae_ensemble)
    from pyqg_generative_tpu.models import MODEL_REGISTRY

    specs = []
    for spec in args.replicas:
        op, seed = spec.split(":")
        specs.append((op, int(seed)))

    splits = {}
    for op, _ in specs:
        if op not in splits:
            splits[op] = load_split(args.cfg, op, args.nx, args.data_cap)

    nets, ds_trains, ds_tests, keys, kept = [], [], [], [], []
    for op, seed in specs:
        folder = os.path.join(BASE, args.cfg, f"models_{op}_{args.nx}",
                              f"{args.model}-{seed}")
        if os.path.exists(os.path.join(folder, "model_args.json")):
            log(f"skip existing {folder}")
            continue
        kw = {"nx": args.nx} if args.model == "CGANRegression" else {}
        nets.append(MODEL_REGISTRY[args.model](folder=folder, **kw))
        ds_trains.append(splits[op][0])
        ds_tests.append(splits[op][1])
        keys.append(seed)
        kept.append((op, seed))
    if not nets:
        log("nothing to train")
        return

    t0 = time.time()
    if args.model == "CGANRegression":
        fit_gan_ensemble(nets, ds_trains, ds_tests, num_epochs=args.epochs,
                         batch_size=args.batch_size, nruns=args.nruns,
                         keys=keys, verbose=True,
                         retain_every=args.retain_every)
    else:
        fit_vae_ensemble(nets, ds_trains, ds_tests, num_epochs=args.epochs,
                         batch_size=args.batch_size, nruns=args.nruns,
                         keys=keys, verbose=True)
    log(f"trained {len(nets)} replicas in {(time.time() - t0) / 60:.1f} min")

    for net, (op, seed) in zip(nets, kept):
        ds_test_full = splits[op][2]
        off = net.test_offline(ds_test_full, ensemble_size=1000)
        off.to_npz(os.path.join(net.folder, "offline_test.npz"))
        log(f"{os.path.basename(net.folder)} ({op}): "
            f"L2_mean={float(off['L2_mean'].values):.3f} "
            f"L2_total={float(off['L2_total'].values):.3f}")


if __name__ == "__main__":
    main()
