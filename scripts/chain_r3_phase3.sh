#!/bin/bash
# Round-3 master chain (relaunched after an axon client wedge killed the
# in-process Operator2x64 online stage): every stage is a fresh process and
# online stages use subprocess-per-job crash isolation.
# Usage: nohup bash scripts/chain_r3_phase3.sh > data_r2/logs/chain_r3_p3.log 2>&1 &
set -u
cd /root/repo
LOGS=data_r2/logs
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

# 0. Operator2x64 online table (models already trained; isolated jobs)
timeout 14400 python -u scripts/campaign_r2_quality.py \
    --cfg eddy --operator Operator2 --nx 64 --realizations 1 \
    --skip-training --no-sweep > "$LOGS/r3_op2_64_online.log" 2>&1
stamp "Operator2x64 online exit=$?"

# 1. GZ (Operator1-trained) at dt=7200 — the op1 campaign's remaining job
timeout 5400 python -u scripts/r3_online_score.py \
    --model data_r2/eddy/models_Operator1_48/MeanVarModel-0 \
    --operator Operator1 --nx 48 --dt 7200 --segments 12 \
    --sub eddy-constant-0 > "$LOGS/r3_gz_op1_dt7200.log" 2>&1
stamp "GZ Op1 dt=7200 exit=$?"

# 2. GZ (Operator2-trained) at the published dt=7200 (VERDICT item 3)
timeout 5400 python -u scripts/r3_online_score.py \
    --model data_r2/eddy/models_Operator2_48/MeanVarModel-0 \
    --operator Operator2 --nx 48 --dt 7200 --segments 12 \
    --sub eddy-constant-0-dt7200 > "$LOGS/r3_gz_dt7200.log" 2>&1
stamp "GZ Op2 dt=7200 exit=$?"

# 3. stable-epoch online scoring: Op2-trained GAN with saved G_stable
timeout 5400 python -u scripts/r3_online_score.py \
    --model data_r2/eddy/models_Operator2_48/CGANRegression-20 \
    --operator Operator2 --nx 48 --dt 7200 --epoch stable \
    --sub eddy-constant-0-stable > "$LOGS/r3_gan20_stable.log" 2>&1
stamp "GAN-20 stable exit=$?"

# 4. rescue probe for the hot Op1 GAN-1 realization (probe bank + score)
timeout 10800 python -u scripts/r3_stable_epoch.py \
    --models data_r2/eddy/models_Operator1_48/CGANRegression-1 \
    --operator Operator1 --nx 48 > "$LOGS/r3_gan1_stable.log" 2>&1
stamp "GAN-1 Op1 stable exit=$?"

# 5. full-scale forecast matrix with independent truth on the best model
timeout 21600 python -u scripts/campaign_r2_forecast.py \
    --model data_r2/eddy/models_Operator1_48/CGANRegression-0 \
    --operator Operator1 --nx 48 --epoch opt --truth \
    --out-base data_r2/eddy/forecast_op1_gan0_r3 \
    > "$LOGS/r3_forecast_full.log" 2>&1
stamp "forecast matrix exit=$?"

# 6. remaining breadth cells
bash scripts/chain_r3_phase2.sh >> "$LOGS/chain_r3_p3.log" 2>&1
stamp "phase 3 done"
