#!/bin/bash
# Promote every campaign-trained model under data_r2/ into trained_models/
# (git-tracked) so the round's trainings survive the machine snapshot
# (round-3 lesson: data_r2 is gitignored and dies with the round).
# Idempotent — re-promoting overwrites with the latest weights/metrics.
# Usage: bash scripts/r4_promote_all.sh
set -u
cd /root/repo

shopt -s nullglob
for cfg in eddy jet; do
    for mdir in data_r2/$cfg/models_Operator*_*/*-*; do
        [ -d "$mdir" ] || continue
        grid=$(basename "$(dirname "$mdir")")     # models_Operator1_48
        op=${grid#models_Operator}; op=${op%%_*}  # 1
        nx=${grid##*_}                            # 48
        name=$(basename "$mdir")                  # CGANRegression-0
        seed=${name##*-}
        case $name in
            CGANRegression-Unet-*) fam=gan_unet ;;
            CGANRegression-*) fam=gan ;;
            CVAERegression-*) fam=vae ;;
            MeanVarModel-*)   fam=gz ;;
            OLSModel-*)       fam=ols ;;
            ANNModel-*)       fam=ann ;;
            *)                fam=$(echo "$name" | tr 'A-Z' 'a-z') ;;
        esac
        # skip folders with no weights yet (training still running);
        # compgen, not ls: under nullglob an unmatched glob makes ls list
        # the cwd and return 0, so the guard never fired
        compgen -G "$mdir/*.msgpack" >/dev/null || continue
        dst=trained_models/r4_${cfg}_${fam}_${nx}_op${op}_s${seed}
        # epoch banks feed select_stable_epoch next round — keep them
        bank=""
        [ -d "$mdir/epoch_bank" ] && bank="--keep-bank"
        python scripts/promote_model.py "$mdir" "$dst" $bank
    done
done
echo "promotion sweep done"
