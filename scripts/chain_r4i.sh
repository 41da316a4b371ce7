#!/bin/bash
# Round-4 session-3 chain: jet breadth (VERDICT round-3 item 7) — the jet
# Operator1 closure rows, the jet stable-epoch probe, and the jet forecast
# matrix (reference runs the same matrix + forecasting for jet:
# scripts/run_parameterized.py:15-22, run_forecasting.py:19).
# Trimmed from chain_r4c.sh stages 3-5 (stages 1-2 superseded by
# chain_r4f.sh's vmapped spread study).
# Usage: setsid nohup bash scripts/chain_r4i.sh > data_r2/logs/chain_r4i.log 2>&1 &
set -u
cd /root/repo
LOGS=data_r2/logs
mkdir -p "$LOGS"
QUAL="python -u scripts/campaign_r2_quality.py"
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

# ---- Stage 1: jet Operator1 rows (GZ + GAN + VAE; jet has 25 runs so
#      trainings are much cheaper than eddy) -------------------------------
if gate; then
    timeout 10800 $QUAL --cfg jet --operator Operator1 --nx 48 \
        --realizations 1 --models MeanVarModel CGANRegression \
        CVAERegression --retain-every 10 --no-sweep --no-lores \
        > "$LOGS/r4_jet_op1_48.log" 2>&1
    stamp "jet Op1x48 exit=$?"
else stamp "deadline/backend — skipped jet Op1"; fi

# ---- Stage 2: jet stable-epoch probe for the jet Op1 GAN -----------------
if gate; then
    timeout 5400 python -u scripts/r3_stable_epoch.py --cfg jet --models \
        data_r2/jet/models_Operator1_48/CGANRegression-0 \
        > "$LOGS/r4_jet_stable.log" 2>&1
    stamp "jet stable-epoch exit=$?"
else stamp "deadline/backend — skipped jet stable"; fi

# ---- Stage 3: jet forecast matrix (15 IC x 15 members x decorrelation
#      x 90 d — reference run_forecasting.py:19) --------------------------
if gate; then
    timeout 10800 python -u scripts/campaign_r2_forecast.py --cfg jet \
        --model trained_models/jet_gan_48 \
        --operator Operator2 --truth --epoch opt \
        > "$LOGS/r4_jet_forecast.log" 2>&1
    stamp "jet forecast matrix exit=$?"
else stamp "deadline/backend — skipped jet forecast"; fi

stamp "chain r4i done"
