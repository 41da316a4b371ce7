#!/bin/bash
# Round-4 endgame chain — runs LAST, after every productive stage:
#   1. lores-128 baseline row (VERDICT round-3 item 8's second half;
#      reference_128 data already exists);
#   2. the 96^2 worker-crash bisect (VERDICT item 4) — deliberately
#      crashes the TPU worker (bounded to 2 crash events), so nothing
#      productive may be scheduled after it;
#   3. final backend health verification for the quiescence protocol.
# Requires >= 75 min before the hard deadline to start the bisect.
# Usage: setsid nohup bash scripts/chain_r4h.sh > data_r2/logs/chain_r4h.log 2>&1 &
set -u
cd /root/repo
LOGS=data_r2/logs
mkdir -p "$LOGS"
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

HARD=${R4_HARD_DEADLINE:-1787086800}

gate() {
    # margin (seconds before the hard deadline) required to start
    local margin=${1:-600}
    if [ "$(date +%s)" -ge "$((HARD - margin))" ]; then
        stamp "too close to hard deadline — refusing to start"
        return 1
    fi
    python -c "
from pyqg_generative_tpu.utils.health import wait_for_backend
import sys
sys.exit(0 if wait_for_backend(deadline_s=600) else 1)"
}

# ---- Stage 1: lores-128 baseline row (cheap; completes the resolution
#      sweep next to data_r2/eddy/reference_128) --------------------------
if gate 1800; then
    timeout 1500 python -u scripts/r3_online_score.py --model lores \
        --operator Operator2 --nx 128 --segments 12 --sub eddy-none-0 \
        > "$LOGS/r4_lores128_op2.log" 2>&1
    stamp "lores 128 (Op2) exit=$?"
else stamp "skipped lores 128"; fi

# ---- Stage 2: crash bisect (the only stage allowed to crash the worker) --
if gate 4500; then
    timeout 3600 python -u scripts/r4_crash_bisect.py --quick \
        > "$LOGS/r4_crash_bisect.log" 2>&1
    stamp "crash bisect exit=$?"
else stamp "skipped crash bisect (needs >=75 min margin)"; fi

# ---- Stage 3: final health verification (quiescence protocol) ------------
python -c "
from pyqg_generative_tpu.utils.health import wait_for_backend
import time
ok = wait_for_backend(deadline_s=900)
print(f'[{time.strftime(\"%H:%M:%S\")}] backend healthy at end of chains: {ok}', flush=True)
" 2>&1 | tee "$LOGS/r4_final_health.log"
stamp "chain r4h done"
