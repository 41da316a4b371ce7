#!/bin/bash
# Round-4 session-3 chain: the 96^2 GAN/VAE legs (split out of chain_r4g
# so the cheap GZ-96 cells and the 5-seed spread study run first).
# Op1+Op2 vmapped into one program per family (ml.multifit), epochs 100 at
# data-cap 150 (documented cost reduction; optimal-epoch retention still
# applies), onlines via the fused pallas backend (the XLA conv program
# crashed the axon worker at 96^2 in round 3).
# Usage: setsid nohup bash scripts/chain_r4j.sh > data_r2/logs/chain_r4j.log 2>&1 &
set -u
cd /root/repo
LOGS=data_r2/logs
mkdir -p "$LOGS"
SCORE="python -u scripts/r3_online_score.py"
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

gate() {
    if [ -f /tmp/r4_soft_deadline ] && \
       [ "$(date +%s)" -ge "$(cat /tmp/r4_soft_deadline)" ]; then
        stamp "soft deadline passed — refusing to start a new stage"
        return 1
    fi
    python -c "
from pyqg_generative_tpu.utils.health import wait_for_backend
import sys
sys.exit(0 if wait_for_backend(deadline_s=900) else 1)"
}

# ---- Stage 1: 96^2 GAN, Op1+Op2 vmapped ----------------------------------
if gate; then
    timeout 14400 python -u scripts/train_multi.py --model CGANRegression \
        --nx 96 --replicas Operator1:0 Operator2:0 --data-cap 150 \
        --epochs 100 --retain-every 10 \
        > "$LOGS/r4_gan96_multi.log" 2>&1
    stamp "96^2 GAN (Op1+Op2 vmapped, 100 epochs) exit=$?"
    for OP in Operator1 Operator2; do
        if gate; then
            timeout 7200 $SCORE \
                --model data_r2/eddy/models_${OP}_96/CGANRegression-0 \
                --operator $OP --nx 96 --segments 24 --epoch opt \
                --online-backend pallas --sub eddy-constant-0-opt \
                > "$LOGS/r4_gan96_${OP}_online.log" 2>&1
            stamp "96^2 GAN $OP online exit=$?"
        fi
    done
else stamp "deadline/backend — skipped 96^2 GAN"; fi

# ---- Stage 2: 96^2 VAE, Op1+Op2 vmapped ----------------------------------
if gate; then
    timeout 14400 python -u scripts/train_multi.py --model CVAERegression \
        --nx 96 --replicas Operator1:0 Operator2:0 --data-cap 150 \
        --epochs 100 \
        > "$LOGS/r4_vae96_multi.log" 2>&1
    stamp "96^2 VAE (Op1+Op2 vmapped, 100 epochs) exit=$?"
    for OP in Operator1 Operator2; do
        if gate; then
            timeout 7200 $SCORE \
                --model data_r2/eddy/models_${OP}_96/CVAERegression-0 \
                --operator $OP --nx 96 --segments 24 --epoch opt \
                --online-backend pallas --sub eddy-constant-0-opt \
                > "$LOGS/r4_vae96_${OP}_online.log" 2>&1
            stamp "96^2 VAE $OP online exit=$?"
        fi
    done
else stamp "deadline/backend — skipped 96^2 VAE"; fi

stamp "chain r4j done"
