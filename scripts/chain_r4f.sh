#!/bin/bash
# Round-4 session-2 chain, stage 3: the Operator1-48 seed-spread study
# (VERDICT round-3 item 5) under the vmapped multi-replica trainer —
# 5 fresh GAN seeds + 5 fresh VAE seeds, each taken through the identical
# selection protocol (epoch banking -> select_stable_epoch for the GAN,
# optimal-epoch retention for both), then online-scored at the published
# configuration. Reference protocol: 5 realizations per configuration,
# scripts/train_parameterizations.py:26-35.
# Usage: setsid nohup bash scripts/chain_r4f.sh > data_r2/logs/chain_r4f.log 2>&1 &
set -u
cd /root/repo
LOGS=data_r2/logs
mkdir -p "$LOGS"
SCORE="python -u scripts/r3_online_score.py"
MDIR=data_r2/eddy/models_Operator1_48
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

# ---- Stage 1: 5 GAN seeds, ONE vmapped program --------------------------
if gate; then
    timeout 14400 python -u scripts/train_multi.py --model CGANRegression \
        --nx 48 --replicas Operator1:0 Operator1:1 Operator1:2 \
        Operator1:3 Operator1:4 --retain-every 10 \
        > "$LOGS/r4_spread_gan_train.log" 2>&1
    stamp "5-seed GAN vmapped train exit=$?"
else stamp "backend down — skipped GAN spread train"; fi

# ---- Stage 2: stable-epoch probe, identically per seed ------------------
if gate; then
    timeout 14400 python -u scripts/r3_stable_epoch.py --models \
        $MDIR/CGANRegression-0 $MDIR/CGANRegression-1 \
        $MDIR/CGANRegression-2 $MDIR/CGANRegression-3 \
        $MDIR/CGANRegression-4 \
        > "$LOGS/r4_spread_stable.log" 2>&1
    stamp "stable-epoch x5 exit=$?"
else stamp "backend down — skipped stable probes"; fi

# ---- Stage 3: per-seed optimal-epoch online scores (the stable-epoch
#      onlines are produced by stage 2 itself) ----------------------------
for SEED in 0 1 2 3 4; do
    if gate; then
        timeout 5400 $SCORE --model $MDIR/CGANRegression-$SEED \
            --operator Operator1 --nx 48 --dt 7200 --epoch opt \
            --sub "eddy-constant-0-opt" \
            > "$LOGS/r4_spread_gan_${SEED}_opt.log" 2>&1
        stamp "GAN seed $SEED opt online exit=$?"
    else stamp "backend down — skipped GAN seed $SEED opt"; fi
done

# ---- Stage 4: 5 VAE seeds, ONE vmapped program ---------------------------
if gate; then
    timeout 14400 python -u scripts/train_multi.py --model CVAERegression \
        --nx 48 --replicas Operator1:0 Operator1:1 Operator1:2 \
        Operator1:3 Operator1:4 \
        > "$LOGS/r4_spread_vae_train.log" 2>&1
    stamp "5-seed VAE vmapped train exit=$?"
else stamp "backend down — skipped VAE spread train"; fi

# ---- Stage 5: per-seed VAE online scores (opt + final) -------------------
for SEED in 0 1 2 3 4; do
    for EP in opt final; do
        SUB="eddy-constant-0"; [ "$EP" = opt ] && SUB="$SUB-opt"
        if gate; then
            timeout 5400 $SCORE --model $MDIR/CVAERegression-$SEED \
                --operator Operator1 --nx 48 --dt 7200 --epoch $EP \
                --sub "$SUB" \
                > "$LOGS/r4_spread_vae_${SEED}_${EP}.log" 2>&1
            stamp "VAE seed $SEED $EP online exit=$?"
        else stamp "backend down — skipped VAE seed $SEED $EP"; fi
    done
done

python scripts/r4_spread_table.py > "$LOGS/r4_spread_table.md" 2>&1
stamp "chain r4f done — spread table at $LOGS/r4_spread_table.md"
