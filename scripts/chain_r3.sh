#!/bin/bash
# Round-3 TPU job chain: breadth matrix (VERDICT round-2 item 5) after the
# Operator1x48 campaign finishes. Each stage is restartable; logs under
# data_r2/logs/. Usage: nohup bash scripts/chain_r3.sh > data_r2/logs/chain_r3.log 2>&1 &
set -u
cd /root/repo
LOGS=data_r2/logs

stamp() { echo "[$(date +%H:%M:%S)] $*"; }

# 1. wait for the Operator1x48 campaign (if running)
if [ -f /tmp/campaign.pid ] && kill -0 "$(cat /tmp/campaign.pid)" 2>/dev/null; then
    stamp "waiting for Operator1x48 campaign (pid $(cat /tmp/campaign.pid))"
    while kill -0 "$(cat /tmp/campaign.pid)" 2>/dev/null; do sleep 60; done
fi
stamp "Operator1x48 campaign done"

# 2. Operator2 x 64 breadth (reference run_parameterized.py:38-44 matrix leg)
timeout 10800 python -u scripts/campaign_r2_quality.py \
    --cfg eddy --operator Operator2 --nx 64 --realizations 2 \
    --retain-every 10 --no-sweep > "$LOGS/r3_op2_64.log" 2>&1
stamp "Operator2x64 campaign exit=$?"

# 3. Operator2 x 96 breadth
timeout 10800 python -u scripts/campaign_r2_quality.py \
    --cfg eddy --operator Operator2 --nx 96 --realizations 2 \
    --retain-every 10 --no-sweep > "$LOGS/r3_op2_96.log" 2>&1
stamp "Operator2x96 campaign exit=$?"

stamp "chain done"
