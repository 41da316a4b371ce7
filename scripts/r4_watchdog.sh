#!/bin/bash
# Round-4 hard-deadline watchdog (quiescence protocol, VERDICT item 2).
# Sleeps until the hard deadline, then kills the process TREES rooted at
# the explicit PIDs recorded in /tmp/r4_roots (never by pattern), waits,
# verifies backend health in a fresh subprocess, and appends the
# "backend healthy at HH:MM" line the verdict asked for.
# Usage: setsid nohup bash scripts/r4_watchdog.sh > data_r2/logs/r4_watchdog.log 2>&1 &
set -u
cd /root/repo
HARD=${R4_HARD_DEADLINE:-1787086800}
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

kill_tree() {
    local pid=$1 sig=${2:-TERM} child
    for child in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
        kill_tree "$child" "$sig"
    done
    kill -"$sig" "$pid" 2>/dev/null
}

now=$(date +%s)
if [ "$now" -lt "$HARD" ]; then
    stamp "sleeping $((HARD - now))s until hard deadline"
    sleep $((HARD - now))
fi

stamp "hard deadline reached — terminating recorded chain roots"
if [ -f /tmp/r4_roots ]; then
    sort -u /tmp/r4_roots | while read -r pid; do
        [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null || continue
        [ "$pid" = "$$" ] && continue
        stamp "TERM tree rooted at $pid"
        kill_tree "$pid" TERM
    done
    sleep 20
    sort -u /tmp/r4_roots | while read -r pid; do
        [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null || continue
        [ "$pid" = "$$" ] && continue
        stamp "KILL tree rooted at $pid"
        kill_tree "$pid" KILL
    done
fi
sleep 10

python -c "
from pyqg_generative_tpu.utils.health import wait_for_backend
import time
ok = wait_for_backend(deadline_s=900)
line = f'backend healthy at {time.strftime(\"%H:%M\")} UTC: {ok}'
print(line, flush=True)
with open('data_r2/logs/r4_quiescence.txt', 'a') as f:
    f.write(line + '\n')
"
stamp "watchdog done — machine quiescent"
