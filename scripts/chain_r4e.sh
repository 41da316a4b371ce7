#!/bin/bash
# Round-4 session-2 chain, stage 2: rebuild the GZ closure rows lost with
# the round-3 data_r2 snapshot (4 cells at 48/64), then the missing 64^2
# GAN/VAE matrix cells (VERDICT missing #2). VAE trains Operator1+Operator2
# as ONE vmapped program (ml.multifit). Run after chain_r4d.sh.
# Usage: setsid nohup bash scripts/chain_r4e.sh > data_r2/logs/chain_r4e.log 2>&1 &
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

# ---- Stage 0: recapture the bench rows that hit transient probe
#      false-negatives (axon releases the device slowly between clients) --
for ROW in \
    "--nx 48 --model-folder trained_models/eddy_gz_48 --backend xla" \
    "--nx 48 --model-folder trained_models/eddy_vae_48_op1 --backend xla" \
    "--nx 48 --model-folder trained_models/eddy_vae_48_op1 --backend pallas:dx" \
    "--model-folder trained_models/eddy_gan_64 --backend xla --members 20" \
    "--model-folder trained_models/eddy_gan_64 --backend xla --members 40"
do
    if gate; then
        echo "### $ROW (recapture)" >> data_r2/bench_rows.jsonl
        timeout 580 python bench.py $ROW >> data_r2/bench_rows.jsonl 2>&1
        stamp "bench recapture [$ROW] exit=$?"
    fi
done

# ---- Stage 1: GZ cells at 48^2 and 64^2, both operator pairings ---------
for OP in Operator1 Operator2; do
    for NX in 48 64; do
        if gate; then
            timeout 10800 $QUAL --cfg eddy --operator $OP --nx $NX \
                --realizations 1 --models MeanVarModel --no-sweep \
                --no-lores > "$LOGS/r4_gz_${OP}_${NX}.log" 2>&1
            stamp "GZ $OP x $NX exit=$?"
        else stamp "backend down — skipped GZ $OP x $NX"; fi
    done
done

# ---- Stage 2: Operator1 x 64 GAN (train + final/opt onlines + stable) ---
if gate; then
    timeout 14400 $QUAL --cfg eddy --operator Operator1 --nx 64 \
        --realizations 1 --models CGANRegression --retain-every 10 \
        --no-sweep --no-lores > "$LOGS/r4_op1_64_gan.log" 2>&1
    stamp "Operator1x64 GAN exit=$?"
    timeout 7200 python -u scripts/r3_stable_epoch.py --models \
        data_r2/eddy/models_Operator1_64/CGANRegression-0 \
        > "$LOGS/r4_op1_64_gan_stable.log" 2>&1
    stamp "Operator1x64 GAN stable-epoch exit=$?"
    timeout 7200 $SCORE --model data_r2/eddy/models_Operator1_64/CGANRegression-0 \
        --operator Operator1 --nx 64 --epoch stable \
        --sub eddy-constant-0-stable > "$LOGS/r4_op1_64_gan_stable_online.log" 2>&1
    stamp "Operator1x64 GAN stable online exit=$?"
else stamp "backend down — skipped Op1x64 GAN"; fi

# ---- Stage 3: 64^2 VAE, Operator1 + Operator2 vmapped in one program ----
if gate; then
    timeout 14400 python -u scripts/train_multi.py --model CVAERegression \
        --nx 64 --replicas Operator1:0 Operator2:0 \
        > "$LOGS/r4_vae64_multi.log" 2>&1
    stamp "64^2 VAE (Op1+Op2 vmapped) exit=$?"
    for OP in Operator1 Operator2; do
        for EP in final opt; do
            SUB="eddy-constant-0"; [ "$EP" = opt ] && SUB="$SUB-opt"
            timeout 7200 $SCORE \
                --model data_r2/eddy/models_${OP}_64/CVAERegression-0 \
                --operator $OP --nx 64 --epoch $EP --sub "$SUB" \
                > "$LOGS/r4_vae64_${OP}_${EP}.log" 2>&1
            stamp "64^2 VAE $OP $EP online exit=$?"
        done
    done
else stamp "backend down — skipped 64^2 VAE"; fi

stamp "chain r4e done"
