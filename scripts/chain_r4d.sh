#!/bin/bash
# Round-4 session-2 chain, stage 1: driver-verifiable quick wins while the
# vmapped multi-seed trainer is being built. Waits for the (restarted)
# data campaign to finish, then captures the 3-family x 2-backend bench
# table (VERDICT item 6) and the six lores baseline rows every matrix
# table needs (the round-3 rows were lost with the gitignored data_r2/).
# Usage: setsid nohup bash scripts/chain_r4d.sh > data_r2/logs/chain_r4d.log 2>&1 &
set -u
cd /root/repo
LOGS=data_r2/logs
mkdir -p "$LOGS"
SCORE="python -u scripts/r3_online_score.py"
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

gate() {
    python -c "
from pyqg_generative_tpu.utils.health import wait_for_backend
import sys
sys.exit(0 if wait_for_backend(deadline_s=900) else 1)"
}

# ---- Stage 0: wait for the forcing-data campaign (skip-existing, so a
#      finished campaign exits immediately) -------------------------------
if [ -f /tmp/r4_data.pid ]; then
    while kill -0 "$(cat /tmp/r4_data.pid)" 2>/dev/null; do sleep 30; done
fi
stamp "data campaign quiescent"

# ---- Stage 1: measured on-chip table, all 3 families x {xla, pallas:dx} -
if gate; then
    bash scripts/r4_bench_rows.sh > "$LOGS/r4_bench_rows.log" 2>&1
    stamp "bench rows exit=$?"
else stamp "backend down — skipped bench rows"; fi

# ---- Stage 2: lores baseline rows at 48/64/96 for both scoring operators
if gate; then
    timeout 3600 $SCORE --model lores --operator Operator2 --nx 48 \
        --dt 7200 --sub eddy-none-0 > "$LOGS/r4_lores48_op2.log" 2>&1
    stamp "lores 48 (Op2) exit=$?"
    timeout 3600 $SCORE --model lores --operator Operator1 --nx 48 \
        --dt 7200 --sub eddy-none-0-op1 > "$LOGS/r4_lores48_op1.log" 2>&1
    stamp "lores 48 (Op1) exit=$?"
    timeout 3600 $SCORE --model lores --operator Operator2 --nx 64 \
        --sub eddy-none-0 > "$LOGS/r4_lores64_op2.log" 2>&1
    stamp "lores 64 (Op2) exit=$?"
    timeout 3600 $SCORE --model lores --operator Operator1 --nx 64 \
        --sub eddy-none-0-op1 > "$LOGS/r4_lores64_op1.log" 2>&1
    stamp "lores 64 (Op1) exit=$?"
    timeout 3600 $SCORE --model lores --operator Operator2 --nx 96 \
        --segments 12 --sub eddy-none-0 > "$LOGS/r4_lores96_op2.log" 2>&1
    stamp "lores 96 (Op2) exit=$?"
    timeout 3600 $SCORE --model lores --operator Operator1 --nx 96 \
        --segments 12 --sub eddy-none-0-op1 > "$LOGS/r4_lores96_op1.log" 2>&1
    stamp "lores 96 (Op1) exit=$?"
else stamp "backend down — skipped lores rows"; fi

# ---- Stage 3: jet lores baselines (jet tables need them too) ------------
if gate; then
    timeout 3600 $SCORE --model lores --cfg jet --operator Operator2 --nx 48 \
        --dt 7200 --sub jet-none-0 > "$LOGS/r4_jet_lores48_op2.log" 2>&1
    stamp "jet lores 48 (Op2) exit=$?"
    timeout 3600 $SCORE --model lores --cfg jet --operator Operator1 --nx 48 \
        --dt 7200 --sub jet-none-0-op1 > "$LOGS/r4_jet_lores48_op1.log" 2>&1
    stamp "jet lores 48 (Op1) exit=$?"
else stamp "backend down — skipped jet lores"; fi

stamp "chain r4d stage-1 done"
