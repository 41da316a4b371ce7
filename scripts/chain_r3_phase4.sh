#!/bin/bash
# Round-3 phase 4: the remaining chain stages, relaunched under a fresh
# filename after the double-orchestrator incident (editing a chain script
# while bash executes it risks offset corruption — hence a new file).
# Waits for any running leaf jobs (pids passed as arguments), then runs the
# GAN-1 rescue probe, the full independent-truth forecast matrix, and the
# breadth cells.
# Usage: nohup bash scripts/chain_r3_phase4.sh PID... > data_r2/logs/chain_r3_p4.log 2>&1 &
set -u
cd /root/repo
LOGS=data_r2/logs
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

for pid in "$@"; do
    if kill -0 "$pid" 2>/dev/null; then
        stamp "waiting for leaf job $pid"
        while kill -0 "$pid" 2>/dev/null; do sleep 30; done
    fi
done
stamp "leaf jobs done"

# rescue probe for the hot Op1 GAN-1 realization (probe bank + score)
timeout 10800 python -u scripts/r3_stable_epoch.py \
    --models data_r2/eddy/models_Operator1_48/CGANRegression-1 \
    --operator Operator1 --nx 48 > "$LOGS/r3_gan1_stable.log" 2>&1
stamp "GAN-1 Op1 stable exit=$?"

# full-scale forecast matrix with independent truth on the best model
timeout 21600 python -u scripts/campaign_r2_forecast.py \
    --model data_r2/eddy/models_Operator1_48/CGANRegression-0 \
    --operator Operator1 --nx 48 --epoch opt --truth \
    --out-base data_r2/eddy/forecast_op1_gan0_r3 \
    > "$LOGS/r3_forecast_full.log" 2>&1
stamp "forecast matrix exit=$?"

# remaining breadth cells
bash scripts/chain_r3_phase2.sh >> "$LOGS/chain_r3_p4.log" 2>&1
stamp "phase 4 done"
