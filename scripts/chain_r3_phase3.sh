#!/bin/bash
# Round-3 phase 3: after the Operator1x48 / Operator2x64 campaigns release
# the chip — GZ at the published dt (VERDICT item 3), stable-epoch online
# scoring (item 2 evidence), the full-scale independent-truth forecast
# matrix (item 6), then the remaining breadth cells (item 5).
# Usage: nohup bash scripts/chain_r3_phase3.sh > data_r2/logs/chain_r3_p3.log 2>&1 &
set -u
cd /root/repo
LOGS=data_r2/logs
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

for pidf in /tmp/op1.pid /tmp/op2_64.pid; do
    if [ -f "$pidf" ] && kill -0 "$(cat $pidf)" 2>/dev/null; then
        stamp "waiting for $(cat $pidf) ($pidf)"
        while kill -0 "$(cat $pidf)" 2>/dev/null; do sleep 60; done
    fi
done
stamp "phase-1 campaigns done"

# 1. GZ (Operator2-trained) at the published dt=7200, solo, finer segments
timeout 5400 python -u scripts/r3_online_score.py \
    --model data_r2/eddy/models_Operator2_48/MeanVarModel-0 \
    --operator Operator2 --nx 48 --dt 7200 --segments 12 \
    --sub eddy-constant-0-dt7200 > "$LOGS/r3_gz_dt7200.log" 2>&1
stamp "GZ dt=7200 exit=$?"

# 2. stable-epoch online scoring: Op2-trained GAN with saved G_stable
timeout 5400 python -u scripts/r3_online_score.py \
    --model data_r2/eddy/models_Operator2_48/CGANRegression-20 \
    --operator Operator2 --nx 48 --dt 7200 --epoch stable \
    --sub eddy-constant-0-stable > "$LOGS/r3_gan20_stable.log" 2>&1
stamp "GAN-20 stable exit=$?"

# 3. full-scale forecast matrix with independent truth on the best model
timeout 21600 python -u scripts/campaign_r2_forecast.py \
    --model data_r2/eddy/models_Operator1_48/CGANRegression-0 \
    --operator Operator1 --nx 48 --epoch opt --truth \
    --out-base data_r2/eddy/forecast_op1_gan0_r3 \
    > "$LOGS/r3_forecast_full.log" 2>&1
stamp "forecast matrix exit=$?"

# 4. remaining breadth cells
bash scripts/chain_r3_phase2.sh >> "$LOGS/chain_r3_p3.log" 2>&1
stamp "phase 3 done"
