"""Aggregate the Operator1-48 seed-spread study (VERDICT round-3 item 5):
for every CGANRegression/CVAERegression seed trained under the identical
protocol, collect the online scores of each epoch-selection variant
(final / opt / stable) and print the per-seed table plus median and range
of the per-seed BEST — the spread of the *selection protocol itself*.

Run:  python scripts/r4_spread_table.py [--op Operator1] [--nx 48]
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

BASE = "/root/repo/data_r2"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="eddy")
    ap.add_argument("--op", default="Operator1")
    ap.add_argument("--nx", type=int, default=48)
    args = ap.parse_args()

    mdir = os.path.join(BASE, args.cfg, f"models_{args.op}_{args.nx}")
    rows = {}
    for f in sorted(glob.glob(os.path.join(mdir, "*", "metrics_*.json"))):
        seedname = os.path.basename(os.path.dirname(f))
        sub = os.path.basename(f)[len("metrics_"):-len(".json")]
        with open(f) as fh:
            m = json.load(fh)
        rows.setdefault(seedname, {})[sub] = (m["distrib_score"],
                                              m["spectral_score"])

    print(f"\n### Seed spread — {args.cfg} {args.op}-{args.nx}, "
          f"identical protocol per seed\n")
    print("| seed | variant | distrib | spectral |")
    print("|---|---|---|---|")
    best = {}
    for seed in sorted(rows):
        for sub, (d, s) in sorted(rows[seed].items()):
            print(f"| {seed} | {sub} | {d:.3f} | {s:.3f} |")
            fam = seed.split("-")[0]
            k = (fam, seed)
            if k not in best or d < best[k][0]:
                best[k] = (d, s, sub)

    for fam in sorted({f for f, _ in best}):
        sel = [(d, s) for (f, _), (d, s, _) in best.items() if f == fam]
        if not sel:
            continue
        ds = np.array([d for d, _ in sel])
        ss = np.array([s for _, s in sel])
        print(f"\n{fam}: n={len(sel)} seeds; per-seed best distrib "
              f"median {np.median(ds):.3f} (range {ds.min():.3f}-"
              f"{ds.max():.3f}); spectral median {np.median(ss):.3f} "
              f"(range {ss.min():.3f}-{ss.max():.3f})")
        print(f"{fam} per-seed best variants: "
              + ", ".join(f"{seed}:{sub}" for (f, seed),
                          (_, _, sub) in sorted(best.items()) if f == fam))


if __name__ == "__main__":
    main()
