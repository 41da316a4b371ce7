#!/bin/bash
# Round-5 queue supervisor (VERDICT round-4 item 2, the self-recovery half):
# keeps scripts/r5_queue.py alive until the queue is complete or the hard
# deadline passes. The runner's flock makes respawn safe (a live runner
# wins; a dead one is replaced within 60 s). The supervisor is itself
# detached — a builder-session stall can no longer orphan the queue tail.
# Usage: setsid nohup bash scripts/r5_supervisor.sh >> data_r2/logs/r5_supervisor.log 2>&1 &
set -u
cd /root/repo
echo $$ >> /tmp/r5_roots
stamp() { echo "[$(date +%H:%M:%S)] $*"; }
HARD=$(cat /tmp/r5_hard_deadline 2>/dev/null || echo 9999999999)
stamp "supervisor pid $$ (hard deadline $(date -u -d @"$HARD" +%H:%M:%S))"

spawn() {
    setsid nohup python -u scripts/r5_queue.py \
        >> data_r2/logs/r5_queue.log 2>&1 &
    echo $! > /tmp/r5_runner.pid
    stamp "spawned runner pid $!"
}

while :; do
    now=$(date +%s)
    if [ "$now" -ge "$HARD" ]; then
        stamp "hard deadline — supervisor exiting (watchdog owns cleanup)"
        exit 0
    fi
    # queue complete? (state.json note set by the runner on completion)
    if [ -f data_r2/queue/state.json ] && \
       grep -q '"note": "all stages done"' data_r2/queue/state.json; then
        stamp "queue complete — supervisor exiting"
        exit 0
    fi
    RPID=$(cat /tmp/r5_runner.pid 2>/dev/null || echo 0)
    if [ "$RPID" = 0 ] || ! kill -0 "$RPID" 2>/dev/null; then
        stamp "runner not alive (pid ${RPID:-none}) — respawning"
        spawn
    fi
    sleep 60
done
