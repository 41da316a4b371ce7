#!/bin/bash
# Round-3 phase 5: prioritized remainder of the breadth matrix for the
# time left in the round. Replaces the tail of chain_r3_phase2.sh (whose
# Operator2x96 stage included a ~2h 96^2 GAN training that does not fit):
# GZ-only cells first (cheap, one seed, no epoch banking), then the
# missing online rows at already-trained cells.
set -u
cd /root/repo
LOGS=data_r2/logs
SCORE="python -u scripts/r3_online_score.py"
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

# 1. Operator2 x 96: GZ + the lores_96 baseline (no 96^2 lores row exists
#    yet anywhere in the matrix)
timeout 9000 python -u scripts/campaign_r2_quality.py \
    --cfg eddy --operator Operator2 --nx 96 --realizations 1 \
    --models MeanVarModel --no-sweep > "$LOGS/r3_op2_96_gz.log" 2>&1
stamp "Operator2x96 GZ exit=$?"

# 2. Operator2 x 64 missing online rows: GZ (worker-crashed in the earlier
#    stage; finer segmentation) and the trained-but-never-scored VAE
timeout 3600 $SCORE --model data_r2/eddy/models_Operator2_64/MeanVarModel-0 \
    --operator Operator2 --nx 64 --segments 12 --sub eddy-constant-0 \
    > "$LOGS/r3_gz_64_retry.log" 2>&1
stamp "Operator2x64 GZ exit=$?"
timeout 3600 $SCORE --model data_r2/eddy/models_Operator2_64/CVAERegression-0 \
    --operator Operator2 --nx 64 --segments 6 --sub eddy-constant-0-opt \
    --epoch opt > "$LOGS/r3_vae_64.log" 2>&1
stamp "Operator2x64 VAE exit=$?"

# 3. jet GZ online (the jet family table has GAN + VAE rows only)
timeout 3600 $SCORE --cfg jet \
    --model data_r2/jet/models_Operator2_48/MeanVarModel-0 \
    --operator Operator2 --nx 48 --dt 7200 --segments 6 \
    --sub jet-constant-0 > "$LOGS/r3_jet_gz.log" 2>&1
stamp "jet GZ exit=$?"

# 4. Operator1 x 64: GZ cell + the sharp-target lores row (distinct --sub:
#    lores_64/metrics_eddy-none-0.json is the gaussian-target score)
timeout 7200 python -u scripts/campaign_r2_quality.py \
    --cfg eddy --operator Operator1 --nx 64 --realizations 1 \
    --models MeanVarModel --no-sweep --no-lores \
    > "$LOGS/r3_op1_64_gz.log" 2>&1
stamp "Operator1x64 GZ exit=$?"
timeout 3600 $SCORE --model lores --operator Operator1 --nx 64 \
    --segments 6 --sub eddy-none-0-op1 > "$LOGS/r3_lores64_op1.log" 2>&1
stamp "Operator1x64 lores exit=$?"

# 5. Operator1 x 96 GZ (only reached if time allows)
timeout 7200 python -u scripts/campaign_r2_quality.py \
    --cfg eddy --operator Operator1 --nx 96 --realizations 1 \
    --models MeanVarModel --no-sweep --no-lores \
    > "$LOGS/r3_op1_96_gz.log" 2>&1
stamp "Operator1x96 GZ exit=$?"

stamp "phase 5 done"
