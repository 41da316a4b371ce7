"""Round-2 quality campaign: the paper's 48^2 eddy experiment at full scale.

Per VERDICT round-1 items 2-4: 300-run training data, 5 realizations per
closure, optimal-epoch GAN/VAE variants, the published online recipe
(sampling='constant', nsteps=1 — reference scripts/run_parameterized.py:50),
noise-decorrelation sweep for the best model, online Wasserstein/spectral
metrics vs the coarse-grained 256^2 reference.

Restartable: every stage skips existing outputs.

Run:  python scripts/campaign_r2_quality.py [--nx 48] [--operator Operator2]
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


def load_split(cfg, op, nx, data_cap=300):
    """Train/val/test datasets for one (configuration, operator, nx) cell.

    Reference splits: 0-250 train / 250-275 validate / 275-300 test
    (tools/train_model.py:41-46), scaled to the available run count, with
    the reference's small-dataset duplication (tools/train_model.py:41-44).
    """
    from pyqg_generative_tpu.utils import xrlite as xr

    data = os.path.join(BASE, cfg, f"{op}-{nx}-dealias", "*.npz")
    ds = xr.open_mfdataset(data, "run")
    nrun = min(ds["q"].sizes()["run"], data_cap)
    ds = ds.isel(run=slice(0, nrun))
    cuts = [int(f * nrun) for f in (0.833, 0.917)]
    ds_train = ds.isel(run=slice(0, cuts[0]))
    ds_val = ds.isel(run=slice(cuts[0], cuts[1]))
    ds_test = ds.isel(run=slice(cuts[1], nrun))
    if cuts[0] < 250:
        nstacks = max(1, 250 // cuts[0])
        if nstacks > 1:
            ds_train = xr.concat([ds_train] * nstacks, "run")
    log(f"data {cfg}/{op}-{nx}: {nrun} runs "
        f"({cuts[0]}/{cuts[1] - cuts[0]}/{nrun - cuts[1]}; train stacked to "
        f"{ds_train['q'].sizes()['run']})")
    return ds_train, ds_val, ds_test


def train_stage(cfg, op, nx, models, realizations, data_cap=300,
                transfer_cfg=None, retain_every=0):
    from pyqg_generative_tpu.models import MODEL_REGISTRY
    from pyqg_generative_tpu.utils import xrlite as xr

    ds_train, ds_val, ds_test = load_split(cfg, op, nx, data_cap)

    ds_transfer = None
    if transfer_cfg:
        tglob = os.path.join(BASE, transfer_cfg, f"{op}-{nx}-dealias",
                             "*.npz")
        import glob as _glob
        if _glob.glob(tglob):
            # first 25 runs of the other configuration
            # (reference tools/train_model.py:47,54)
            ds_transfer = xr.open_mfdataset(tglob, "run")
            ntr = min(25, ds_transfer["q"].sizes()["run"])
            ds_transfer = ds_transfer.isel(run=slice(0, ntr))

    for model_name in models:
        n_seeds = realizations if model_name in (
            "CGANRegression", "CVAERegression") else 1
        for seed in range(n_seeds):
            folder = os.path.join(BASE, cfg, f"models_{op}_{nx}",
                                  f"{model_name}-{seed}")
            tr_file = os.path.join(folder, "offline_transfer.npz")
            if os.path.exists(os.path.join(folder, "model_args.json")):
                if ds_transfer is not None and not os.path.exists(tr_file):
                    from pyqg_generative_tpu.models import load_model
                    model = load_model(folder)
                    model.test_offline(ds_transfer, 1000).to_npz(tr_file)
                    log(f"transfer-tested existing {model_name}-{seed}")
                continue
            t0 = time.time()
            if model_name == "CGANRegression":
                model = MODEL_REGISTRY[model_name](folder=folder, nx=nx)
                model.fit(ds_train, ds_val, key=seed, verbose=False,
                          retain_every=retain_every)
            elif model_name == "CVAERegression":
                model = MODEL_REGISTRY[model_name](folder=folder)
                model.fit(ds_train, ds_val, key=seed, verbose=False)
            else:  # MeanVarModel / OLSModel: deterministic fits, 1 seed
                model = MODEL_REGISTRY[model_name](folder=folder)
                model.fit(ds_train, ds_val, verbose=False)
            off = model.test_offline(ds_test, ensemble_size=1000)
            off.to_npz(os.path.join(folder, "offline_test.npz"))
            if ds_transfer is not None:
                model.test_offline(ds_transfer, 1000).to_npz(tr_file)
            log(f"trained {model_name}-{seed} in {(time.time()-t0)/60:.1f}"
                f" min; L2_mean={float(off['L2_mean'].values):.3f} "
                f"L2_total={float(off['L2_total'].values):.3f}")


def online_stage_isolated(cfg, op, nx, jobs, years=20.0, n_ens=10,
                          segments=4):
    """Subprocess-per-job online stage: an axon TPU-worker crash
    (JaxRuntimeError UNAVAILABLE) poisons the whole client process, so an
    in-process loop loses every remaining job when one long scan trips the
    runtime. Each job runs scripts/r3_online_score.py in its own process;
    a crash costs that one job and the loop continues."""
    import subprocess

    results = {}
    script = os.path.join(os.path.dirname(__file__), "r3_online_score.py")
    for model_folder, subfolder, sampling, nsteps, use_opt in jobs:
        out_dir = os.path.join(BASE, cfg, f"lores_{nx}") \
            if model_folder == "lores" else model_folder
        metr_file = os.path.join(out_dir, f"metrics_{subfolder}.json")
        if not os.path.exists(metr_file):
            from pyqg_generative_tpu.utils.health import wait_for_backend
            if not wait_for_backend(deadline_s=900):
                # a wedged pool grant hangs every new client in backend
                # init; skip remaining jobs instead of burning their
                # timeouts (the jobs are idempotent — re-run later)
                log("backend down >15 min — skipping remaining online jobs")
                break
            dt = 7200.0 if nx == 48 else None
            cmd = [sys.executable, "-u", script, "--model", model_folder,
                   "--cfg", cfg, "--operator", op, "--nx", str(nx),
                   "--years", str(years), "--n-ens", str(n_ens),
                   "--segments", str(segments), "--sampling", sampling,
                   "--nsteps", str(nsteps), "--sub", subfolder,
                   "--epoch", "opt" if use_opt else "final"]
            if dt is not None:
                cmd += ["--dt", str(dt)]
            # a hung job must cost only itself: treat TimeoutExpired
            # exactly like a nonzero return code (retry once, then skip)
            # instead of letting it abort the whole stage
            def _run(c):
                try:
                    return subprocess.run(c, timeout=7200).returncode
                except subprocess.TimeoutExpired:
                    log(f"job {c} timed out after 7200 s")
                    return -9
            rc = _run(cmd)
            if rc != 0:
                # axon worker crashes correlate with long per-segment
                # scans: one retry at 3x finer segmentation rescued every
                # 48^2/64^2 GZ cell that failed at the default (round-3
                # campaign logs); the subfolder is idempotent so a retry
                # resumes cleanly.
                seg_i = cmd.index("--segments") + 1
                cmd[seg_i] = str(3 * int(cmd[seg_i]))
                log(f"job {model_folder}/{subfolder} failed rc={rc} — "
                    f"retrying once with --segments {cmd[seg_i]}")
                rc = _run(cmd)
            if rc != 0:
                log(f"job {model_folder}/{subfolder} failed rc={rc} "
                    f"— continuing")
                continue
        if os.path.exists(metr_file):
            with open(metr_file) as f:
                results[f"{os.path.basename(model_folder)}/{subfolder}"] = \
                    json.load(f)
    return results


def online_stage(cfg, op, nx, jobs, years=20.0, n_ens=10):
    """jobs: list of (model_folder, subfolder, sampling, nsteps,
    use_optimal)."""
    from pyqg_generative_tpu.exp.pipeline import (compute_online_metrics,
                                                  run_parameterized)
    from pyqg_generative_tpu.models import load_model
    from pyqg_generative_tpu.qg.params import (ANDREW_1000_STEPS,
                                               EDDY_PARAMS, JET_PARAMS, YEAR)
    from pyqg_generative_tpu.sim.simulate import run_ensemble_segmented
    from pyqg_generative_tpu.utils import xrlite as xr

    # segmented runner (bit-exact vs run_ensemble, tests/test_sim.py): the
    # monolithic 86,400-step two-CNN GZ program overruns this environment's
    # TPU worker (docs/VALIDATION.md round-2 GZ note)
    def run_ensemble(p, param, n_ens, sampling_freq):
        return run_ensemble_segmented(p, param, n_ens=n_ens,
                                      sampling_freq=sampling_freq,
                                      n_segments=4)

    ref_glob = os.path.join(BASE, cfg, "reference_256", "*.npz")
    p0 = (EDDY_PARAMS if cfg == "eddy" else JET_PARAMS).with_nx(nx)
    p = p0.replace(tmax=years * YEAR, tavestart=5 * YEAR,
                   precision="single")
    if nx == 48:
        # the published 48^2 online table ran 86,400 steps over 20 years
        # => dt = 7200 s (reference Google-Colab/online-simulations.ipynb
        # cell 12), not the dt-table's 14400
        p = p.replace(dt=7200.0)

    results = {}
    for model_folder, subfolder, sampling, nsteps, use_opt in jobs:
        out_dir = os.path.join(BASE, cfg, f"lores_{nx}")             if model_folder == "lores" else model_folder
        metr_file = os.path.join(out_dir, f"metrics_{subfolder}.json")
        if os.path.exists(metr_file):
            with open(metr_file) as f:
                results[f"{os.path.basename(model_folder)}/{subfolder}"] = \
                    json.load(f)
            continue
        t0 = time.time()
        if model_folder == "lores":
            # unparameterized baseline
            mdir = out_dir
            os.makedirs(os.path.join(mdir, subfolder), exist_ok=True)
            ds = run_ensemble(p, None, n_ens=n_ens,
                              sampling_freq=ANDREW_1000_STEPS)
            for j in range(n_ens):
                ds.isel(run=j).to_npz(
                    os.path.join(mdir, subfolder, f"{j}.npz"))
            norm = compute_online_metrics(
                BASE, mdir, ref_glob, op, nx, subfolder=subfolder,
                save_file=f"metrics_{subfolder}.json")
        else:
            model = load_model(model_folder)
            if use_opt:
                ok = model.use_optimal_epoch()
                if not ok:
                    log(f"skip {model_folder} ({subfolder}): no opt weights")
                    continue
            ds = run_ensemble(p, {"self": model, "sampling": sampling,
                                  "nsteps": nsteps}, n_ens=n_ens,
                              sampling_freq=ANDREW_1000_STEPS)
            folder = os.path.join(model_folder, subfolder)
            os.makedirs(folder, exist_ok=True)
            for j in range(n_ens):
                ds.isel(run=j).to_npz(os.path.join(folder, f"{j}.npz"))
            norm = compute_online_metrics(
                BASE, model_folder, ref_glob, op, nx, subfolder=subfolder,
                save_file=f"metrics_{subfolder}.json")
        key = f"{os.path.basename(str(model_folder))}/{subfolder}"
        results[key] = norm
        log(f"online {key}: distrib={norm['distrib_score']:.3f} "
            f"spectral={norm['spectral_score']:.3f} "
            f"({time.time()-t0:.0f}s)")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="eddy")
    ap.add_argument("--nx", type=int, default=48)
    ap.add_argument("--operator", default="Operator2")
    ap.add_argument("--realizations", type=int, default=5)
    ap.add_argument("--models", nargs="+",
                    default=["MeanVarModel", "CGANRegression",
                             "CVAERegression"])
    ap.add_argument("--skip-training", action="store_true")
    ap.add_argument("--skip-online", action="store_true",
                    help="train/offline-test only; online runs are launched "
                         "separately (e.g. via r3_online_score.py with "
                         "--online-backend pallas at 96^2)")
    ap.add_argument("--no-sweep", action="store_true",
                    help="skip the decorrelation sweep stage")
    ap.add_argument("--no-lores", action="store_true",
                    help="skip the unparameterized baseline job (when a "
                         "parallel stream runs it)")
    ap.add_argument("--transfer-cfg", default=None,
                    help="other configuration for offline transfer tests")
    ap.add_argument("--no-isolate", action="store_true",
                    help="run online jobs in-process instead of one "
                         "subprocess per job (crash isolation)")
    ap.add_argument("--data-cap", type=int, default=300,
                    help="max training runs (the published protocol is "
                         "300; 150 halves 96^2 training cost — the "
                         "'GAN (150 runs)' precedent in VALIDATION)")
    ap.add_argument("--retain-every", type=int, default=0,
                    help="bank GAN generator weights every N epochs for "
                         "select_stable_epoch")
    args = ap.parse_args()
    cfg, op, nx = args.cfg, args.operator, args.nx

    if not args.skip_training:
        train_stage(cfg, op, nx, args.models, args.realizations,
                    data_cap=args.data_cap,
                    transfer_cfg=args.transfer_cfg,
                    retain_every=args.retain_every)
    if args.skip_online:
        log("--skip-online: training/offline stage complete")
        return

    mdir = os.path.join(BASE, cfg, f"models_{op}_{nx}")
    jobs = [] if args.no_lores else \
        [("lores", f"{cfg}-none-0", "constant", 1, False)]
    for seed in range(args.realizations):
        for name, has_opt in (("CGANRegression", True),
                              ("CVAERegression", True)):
            if name not in args.models:
                continue
            f = os.path.join(mdir, f"{name}-{seed}")
            if not os.path.exists(os.path.join(f, "model_args.json")):
                continue
            jobs.append((f, f"{cfg}-constant-0", "constant", 1, False))
            jobs.append((f, f"{cfg}-constant-0-opt", "constant", 1, True))
    if "MeanVarModel" in args.models:
        f = os.path.join(mdir, "MeanVarModel-0")
        if os.path.exists(os.path.join(f, "model_args.json")):
            jobs.append((f, f"{cfg}-constant-0", "constant", 1, False))

    stage = online_stage if args.no_isolate else online_stage_isolated
    results = stage(cfg, op, nx, jobs)

    def _merge_write(out, new_rows):
        """Merge into any existing quality JSON instead of clobbering it:
        separate invocations per model family share one per-cell file, and
        an overwrite loses the other families' rows (lost the GZ Op1-64
        row on 2026-08-18 until restored from the stage log)."""
        merged = {}
        if os.path.exists(out):
            try:
                with open(out) as fh:
                    merged = json.load(fh)
            except (json.JSONDecodeError, OSError):
                pass
        merged.update(new_rows)
        with open(out, "w") as fh:
            json.dump(merged, fh, indent=1)
        return merged

    # decorrelation sweep on the best GAN realization
    if args.no_sweep:
        out = os.path.join(BASE, cfg, f"quality_{op}_{nx}.json")
        _merge_write(out, results)
        log("wrote", out, "(no sweep)")
        return
    best_gan, best_score = None, 1e9
    for key, r in results.items():
        if "CGANRegression" in key and r["distrib_score"] < best_score:
            best_score = r["distrib_score"]
            best_gan = key
    if best_gan:
        name, sub = best_gan.split("/")
        use_opt = sub.endswith("-opt")
        f = os.path.join(mdir, name)
        dt = 7200.0 if nx == 48 else (14400.0 if nx <= 64 else 7200.0)
        sweep = []
        for dec in (12, 24, 36, 48):
            nsteps = max(1, int(round(dec * 3600.0 / dt)))
            sweep.append((f, f"{cfg}-AR1-{dec}" + ("-opt" if use_opt else ""),
                          "AR1", nsteps, use_opt))
        results.update(stage(cfg, op, nx, sweep))

    out = os.path.join(BASE, cfg, f"quality_{op}_{nx}.json")
    results = _merge_write(out, results)
    log("wrote", out)
    for k, v in sorted(results.items(),
                       key=lambda kv: kv[1]["distrib_score"]):
        log(f"  {k}: distrib={v['distrib_score']:.3f} "
            f"spectral={v['spectral_score']:.3f}")


if __name__ == "__main__":
    main()
