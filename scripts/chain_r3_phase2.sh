#!/bin/bash
# Round-3 phase 2: remaining breadth cells of the reference online matrix
# ({48,64,96} x {Operator1,Operator2} — scripts/run_parameterized.py:38-44).
# Launch after a phase-1 stream frees the chip.
set -u
cd /root/repo
LOGS=data_r2/logs
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

# VAE on Operator1 x 48: the published VAE was trained on sharp-operator
# data (round-3 weight-port discovery); give the in-framework VAE the same
# pairing (2 realizations, online-scored final+opt)
timeout 14400 python -u scripts/campaign_r2_quality.py \
    --cfg eddy --operator Operator1 --nx 48 --realizations 2 \
    --models CVAERegression --no-sweep --no-lores \
    > "$LOGS/r3_vae_op1.log" 2>&1
stamp "VAE Operator1x48 exit=$?"

# Operator2 x 96 (GZ + 1 GAN seed; 100 forcing runs on disk)
timeout 14400 python -u scripts/campaign_r2_quality.py \
    --cfg eddy --operator Operator2 --nx 96 --realizations 1 \
    --models MeanVarModel CGANRegression --retain-every 10 \
    --no-sweep > "$LOGS/r3_op2_96.log" 2>&1
stamp "Operator2x96 exit=$?"

# GZ-only rows for the remaining operator x resolution cells
timeout 7200 python -u scripts/campaign_r2_quality.py \
    --cfg eddy --operator Operator1 --nx 64 --realizations 1 \
    --models MeanVarModel --no-sweep --no-lores \
    > "$LOGS/r3_op1_64.log" 2>&1
stamp "Operator1x64 GZ exit=$?"

timeout 7200 python -u scripts/campaign_r2_quality.py \
    --cfg eddy --operator Operator1 --nx 96 --realizations 1 \
    --models MeanVarModel --no-sweep --no-lores \
    > "$LOGS/r3_op1_96.log" 2>&1
stamp "Operator1x96 GZ exit=$?"

# GZ (two-CNN) online programs intermittently crash the axon TPU worker at
# larger grids / under co-tenancy; the isolated campaign stages skip the
# failed cell. Idempotent solo retries with finer segmentation:
for cell in "Operator2 64" "Operator1 64" "Operator2 96" "Operator1 96"; do
    set -- $cell
    model="data_r2/eddy/models_$1_$2/MeanVarModel-0"
    [ -d "$model" ] || continue
    timeout 5400 python -u scripts/r3_online_score.py \
        --model "$model" --operator "$1" --nx "$2" --segments 12 \
        --sub eddy-constant-0 >> "$LOGS/r3_gz_retries.log" 2>&1
    stamp "GZ retry $1 x $2 exit=$?"
done

stamp "phase 2 done"
