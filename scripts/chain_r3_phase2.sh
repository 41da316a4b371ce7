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

stamp "phase 2 done"
