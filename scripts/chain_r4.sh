#!/bin/bash
# Round-4 chain: the ROADMAP round-4 queue, health-gated. Each stage first
# waits (bounded) for the axon backend — a wedged pool grant otherwise
# hangs jobs for their whole timeout (round-3 endgame).
# Usage: nohup bash scripts/chain_r4.sh > data_r2/logs/chain_r4.log 2>&1 &
set -u
cd /root/repo
LOGS=data_r2/logs
SCORE="python -u scripts/r3_online_score.py"
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

gate() {  # skip the stage cleanly if the backend is down
    python -c "
from pyqg_generative_tpu.utils.health import wait_for_backend
import sys
sys.exit(0 if wait_for_backend(deadline_s=900) else 1)"
}

# 1. 96^2 closure rows via the fused pallas online backend (a different
#    compiled program than the XLA conv path that crashed the worker)
if gate; then
    timeout 5400 $SCORE --model data_r2/eddy/models_Operator2_96/MeanVarModel-0 \
        --operator Operator2 --nx 96 --segments 24 --online-backend pallas \
        --sub eddy-constant-0-pallas > "$LOGS/r4_gz_96_pallas.log" 2>&1
    stamp "Operator2x96 GZ (pallas) exit=$?"
else stamp "backend down — skipped 96^2 GZ"; fi

# 2. resume + online-score the Op2x64 VAE (training checkpoint on disk)
if gate; then
    timeout 7200 python -u scripts/campaign_r2_quality.py \
        --cfg eddy --operator Operator2 --nx 64 --realizations 1 \
        --models CVAERegression --no-sweep --no-lores \
        > "$LOGS/r4_vae_64.log" 2>&1
    stamp "Operator2x64 VAE exit=$?"
else stamp "backend down — skipped VAE 64"; fi

# 3. Operator1x96 GZ cell (train + online with auto-retry)
if gate; then
    timeout 9000 python -u scripts/campaign_r2_quality.py \
        --cfg eddy --operator Operator1 --nx 96 --realizations 1 \
        --models MeanVarModel --no-sweep --no-lores \
        > "$LOGS/r4_op1_96_gz.log" 2>&1
    stamp "Operator1x96 GZ exit=$?"
    timeout 3600 $SCORE --model lores --operator Operator1 --nx 96 \
        --segments 12 --sub eddy-none-0-op1 > "$LOGS/r4_lores96_op1.log" 2>&1
    stamp "Operator1x96 lores exit=$?"
else stamp "backend down — skipped Op1x96"; fi

# 4. fused-backend on-chip measurements for GZ and the GAN
if gate; then
    { python bench.py --model-folder trained_models/eddy_gan_64 --backend pallas:dx;
      python bench.py --model-folder trained_models/eddy_gan_64 --backend xla;
    } > "$LOGS/r4_bench.log" 2>&1
    stamp "bench exit=$?"
else stamp "backend down — skipped bench"; fi

stamp "round-4 chain done"
