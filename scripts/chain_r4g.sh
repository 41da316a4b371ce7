#!/bin/bash
# Round-4 session-2 chain, stage 4: the 96^2 legs.
#   1. GZ 96^2 cells (cheap deterministic fits) + online via the fused
#      pallas backend — a different compiled program than the XLA conv
#      path that crashed the axon worker in round 3 (VERDICT item 4's
#      queued experiment);
#   2. crash-bisect --quick (the boundary table for the infra owner);
#   3. 96^2 GAN then VAE, Operator1+Operator2 vmapped into one program
#      each (ml.multifit), epochs 100 at data-cap 150 (documented cost
#      reduction; optimal-epoch retention still applies) + onlines.
# Usage: setsid nohup bash scripts/chain_r4g.sh > data_r2/logs/chain_r4g.log 2>&1 &
set -u
cd /root/repo
LOGS=data_r2/logs
mkdir -p "$LOGS"
QUAL="python -u scripts/campaign_r2_quality.py"
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

# ---- Stage 1: GZ 96^2 cells, online via fused pallas ---------------------
for OP in Operator1 Operator2; do
    if gate; then
        timeout 7200 $QUAL --cfg eddy --operator $OP --nx 96 \
            --data-cap 150 --realizations 1 --models MeanVarModel \
            --skip-online --no-sweep --no-lores \
            > "$LOGS/r4_gz96_${OP}_train.log" 2>&1
        stamp "GZ $OP x96 train exit=$?"
        timeout 7200 $SCORE --model data_r2/eddy/models_${OP}_96/MeanVarModel-0 \
            --operator $OP --nx 96 --segments 24 --online-backend pallas \
            --sub eddy-constant-0 > "$LOGS/r4_gz96_${OP}_online.log" 2>&1
        stamp "GZ $OP x96 online (pallas) exit=$?"
    else stamp "backend down — skipped GZ $OP x96"; fi
done

# ---- Stage 2 (crash-bisect) moved to chain_r4h.sh: it deliberately
#      crashes the TPU worker, so it must run LAST in the round, after
#      every productive stage (round-3 lesson: repeated worker crashes
#      wedged the axon pool and killed both driver gates). ----------------

# ---- Stage 3: 96^2 GAN, Op1+Op2 vmapped ----------------------------------
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
else stamp "backend down — skipped 96^2 GAN"; fi

# ---- Stage 4: 96^2 VAE, Op1+Op2 vmapped ----------------------------------
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
else stamp "backend down — skipped 96^2 VAE"; fi

stamp "chain r4g done"
