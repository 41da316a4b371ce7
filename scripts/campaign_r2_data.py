"""Round-2 data campaign: regenerate the JAMES experiment datasets on one
TPU chip, restartably (skip-existing per file).

Stages (reference scripts/run_forcing_datasets.py, run_reference.py):
  1. eddy + jet unparameterized references (256^2 metric targets + lores
     baselines), 10 members x 20 yr, tavestart 5 yr;
  2. 300 eddy forcing runs: 256^2 DNS -> {Operator1, Operator2} x {48,64,96};
  3. 25 jet forcing runs, same operator/resolution grid.

Run:  python scripts/campaign_r2_data.py --base /root/repo/data_r2
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyqg_generative_tpu.utils.cache import configure_compilation_cache

configure_compilation_cache()

from pyqg_generative_tpu.qg.params import (ANDREW_1000_STEPS, EDDY_PARAMS,
                                           JET_PARAMS, YEAR)
from pyqg_generative_tpu.sim import (generate_subgrid_forcing,
                                     generate_subgrid_forcing_batch,
                                     run_ensemble)

CONFIGS = {"eddy": EDDY_PARAMS, "jet": JET_PARAMS}


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def references(base, configuration, resolutions=(48, 64, 96, 128, 256),
               n_ens=10, years=20.0):
    # 128 completes the reference resolution sweep
    # (reference scripts/run_reference.py:19: nx in {48,64,96,128,256})
    p0 = CONFIGS[configuration]
    for nx in resolutions:
        folder = os.path.join(base, configuration, f"reference_{nx}")
        os.makedirs(folder, exist_ok=True)
        p = p0.with_nx(nx).replace(tmax=years * YEAR, tavestart=5 * YEAR,
                                   precision="single")
        # chunk members at large grids: a fused 10-member 256^2 20-yr run's
        # snapshot buffers (~4 GB) can OOM the worker alongside other jobs
        chunk = n_ens if nx < 128 else 2
        for j0 in range(0, n_ens, chunk):
            m = min(chunk, n_ens - j0)
            if all(os.path.exists(os.path.join(folder, f"{j0 + j}.npz"))
                   for j in range(m)):
                continue
            t0 = time.time()
            ds = run_ensemble(p, n_ens=m, sampling_freq=ANDREW_1000_STEPS,
                              key=j0)
            for j in range(m):
                ds.isel(run=j).to_npz(os.path.join(folder, f"{j0 + j}.npz"))
            log(f"{configuration} reference_{nx}: members {j0}..{j0 + m - 1}"
                f" x {years} yr in {time.time() - t0:.0f}s")


def forcing(base, configuration, n_runs, Nc=(48, 64),
            operators=("Operator1", "Operator2"), years=10.0,
            Nc_extra=(96,), n_runs_extra=None, batch=8):
    """Forcing datasets, `batch` DNS members vmapped into one XLA program
    (generate_subgrid_forcing_batch): 4.4x the serial per-run path on one
    v5e chip (20.5 -> 4.6 s per member-year, measured round 4). 96^2
    targets are emitted for the first `n_runs_extra` runs (default: all —
    round 4 trains 96^2 closures, not just the ANN stage)."""
    p = CONFIGS[configuration].with_nx(256).replace(
        tmax=years * YEAR, precision="single")
    if n_runs_extra is None:
        n_runs_extra = n_runs
    for run0 in range(0, n_runs, batch):
        all_runs = list(range(run0, min(run0 + batch, n_runs)))
        # Gate the extra (96^2) targets PER RUN, not per batch: a batch
        # straddling n_runs_extra is split into a with-extras group and a
        # base-only group, so no run past the threshold pays for 96^2
        # targets and no complete base-only run is seen as incomplete
        # (round-4 advisor finding).
        groups = [[r for r in all_runs if r < n_runs_extra],
                  [r for r in all_runs if r >= n_runs_extra]]
        for gi, runs in enumerate(groups):
            if not runs:
                continue
            ncs = list(Nc) + (list(Nc_extra) if gi == 0 else [])
            combos = [f"{op}-{nc}-dealias" for op in operators for nc in ncs]
            paths = {(c, r): os.path.join(base, configuration, c, f"{r}.npz")
                     for c in combos for r in runs}
            todo = [r for r in runs
                    if not all(os.path.exists(paths[(c, r)]) for c in combos)]
            if not todo:
                continue
            t0 = time.time()
            outs = generate_subgrid_forcing_batch(
                ncs, p, ANDREW_1000_STEPS, operators=operators, keys=todo)
            for r, out in zip(todo, outs):
                for c in combos:
                    os.makedirs(os.path.dirname(paths[(c, r)]), exist_ok=True)
                    out[c].to_npz(paths[(c, r)])
            log(f"{configuration} forcing runs {todo[0]}..{todo[-1]} "
                f"({len(todo)} members in {time.time() - t0:.0f}s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/repo/data_r2")
    ap.add_argument("--eddy-runs", type=int, default=300)
    ap.add_argument("--jet-runs", type=int, default=25)
    args = ap.parse_args()

    t0 = time.time()
    references(args.base, "eddy")
    references(args.base, "jet")
    forcing(args.base, "eddy", args.eddy_runs)
    forcing(args.base, "jet", args.jet_runs)
    log(f"campaign data complete in {(time.time() - t0) / 60:.1f} min")


if __name__ == "__main__":
    main()
