"""Round-5 targeted data regeneration.

The 52 GB round-2 campaign data (forcing + reference ensembles) lives
outside git and died with the round-4 -> round-5 machine snapshot; only
committed artifacts (model metadata, metrics JSONs) survived. The queued
round-5 stages need exactly:

  * eddy reference_256  — coarse-grained metric target for EVERY online
    score (r3_online_score.py:59, reference tools/comparison_tools.py);
  * eddy {Operator1,Operator2} x {48,64,96} forcing runs — training data
    (reference scripts/run_forcing_datasets.py); one 256^2 DNS member
    emits all six targets, so one pass covers the 96^2 cells, the Op1-48
    spread study and the U-Net cell;
  * the same pair for jet (reference scripts/run_reference.py:10).

This wraps campaign_r2_data.references/forcing with flags so the queue
can regenerate each piece as its own restartable stage (both helpers
skip per-file, so a killed stage resumes where it stopped).

Run:  python scripts/r5_regen.py --eddy-ref
      python scripts/r5_regen.py --eddy-forcing 150
      python scripts/r5_regen.py --jet-ref --jet-forcing 25
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import campaign_r2_data as c2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/repo/data_r2")
    ap.add_argument("--eddy-ref", action="store_true",
                    help="eddy reference_256 (10 members x 20 yr)")
    ap.add_argument("--eddy-forcing", type=int, default=0,
                    help="N eddy forcing runs, Op1+Op2 x {48,64,96}")
    ap.add_argument("--jet-ref", action="store_true")
    ap.add_argument("--jet-forcing", type=int, default=0)
    args = ap.parse_args()

    t0 = time.time()
    if args.eddy_ref:
        c2.references(args.base, "eddy", resolutions=(256,))
    if args.eddy_forcing:
        c2.forcing(args.base, "eddy", args.eddy_forcing)
    if args.jet_ref:
        c2.references(args.base, "jet", resolutions=(256,))
    if args.jet_forcing:
        c2.forcing(args.base, "jet", args.jet_forcing)
    c2.log(f"r5 regen done in {(time.time() - t0) / 60:.1f} min")


if __name__ == "__main__":
    main()
