#!/bin/bash
# Round-5 hard-deadline watchdog (quiescence protocol): sleeps until
# /tmp/r5_hard_deadline, then kills every recorded queue root's process
# group by EXPLICIT pid (never by pattern — the session's own cmdline can
# match a pattern), verifies backend health in a fresh subprocess, and
# records the quiescence line.
# Usage: setsid nohup bash scripts/r5_watchdog.sh >> data_r2/logs/r5_watchdog.log 2>&1 &
set -u
cd /root/repo
stamp() { echo "[$(date +%H:%M:%S)] $*"; }
HARD=$(cat /tmp/r5_hard_deadline 2>/dev/null || echo 0)
[ "$HARD" = 0 ] && { stamp "no hard deadline set — exiting"; exit 1; }
stamp "watchdog pid $$ armed for $(date -u -d @"$HARD" +%H:%M:%S) UTC"

while [ "$(date +%s)" -lt "$HARD" ]; do
    sleep 30
done

stamp "hard deadline — killing recorded queue roots"
if [ -f /tmp/r5_roots ]; then
    sort -u /tmp/r5_roots | while read -r pid; do
        [ -z "$pid" ] && continue
        if kill -0 "$pid" 2>/dev/null; then
            stamp "TERM pgid $pid"
            kill -TERM -- -"$pid" 2>/dev/null || kill -TERM "$pid" 2>/dev/null
        fi
    done
    sleep 20
    sort -u /tmp/r5_roots | while read -r pid; do
        [ -z "$pid" ] && continue
        if kill -0 "$pid" 2>/dev/null; then
            stamp "KILL pgid $pid"
            kill -KILL -- -"$pid" 2>/dev/null || kill -KILL "$pid" 2>/dev/null
        fi
    done
fi
RPID=$(cat /tmp/r5_runner.pid 2>/dev/null || echo 0)
[ "$RPID" != 0 ] && kill -0 "$RPID" 2>/dev/null && \
    { kill -TERM -- -"$RPID" 2>/dev/null || kill -TERM "$RPID"; }

sleep 30
python -c "
from pyqg_generative_tpu.utils.health import wait_for_backend
import time
ok = wait_for_backend(deadline_s=900)
print(f'[{time.strftime(\"%H:%M:%S\")}] backend healthy at hard deadline: {ok}', flush=True)
" 2>&1 | tee data_r2/logs/r5_quiescence.txt
stamp "watchdog done"
