#!/bin/bash
# Round-4 chain, part C: seed-spread quantification + jet breadth
# (VERDICT round-3 items 5 and 7). Run after chain_r4b.sh.
# Usage: nohup bash scripts/chain_r4c.sh > data_r2/logs/chain_r4c.log 2>&1 &
set -u
cd /root/repo
LOGS=data_r2/logs
mkdir -p "$LOGS"
QUAL="python -u scripts/campaign_r2_quality.py"
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

gate() {
    python -c "
from pyqg_generative_tpu.utils.health import wait_for_backend
import sys
sys.exit(0 if wait_for_backend(deadline_s=900) else 1)"
}

# ---- Stage 1: 5 fresh seeds each of GAN and VAE at Operator1-48 (the
#      headline cell), trained and online-scored under the identical
#      protocol (reference trains 5 realizations per configuration,
#      train_parameterizations.py:26-35) -----------------------------------
if gate; then
    timeout 28800 $QUAL --cfg eddy --operator Operator1 --nx 48 \
        --realizations 5 --models CGANRegression CVAERegression \
        --retain-every 10 --no-sweep --no-lores \
        > "$LOGS/r4_spread_op1_48.log" 2>&1
    stamp "Op1x48 5-seed GAN+VAE exit=$?"
else stamp "backend down — skipped seed spread"; fi

# ---- Stage 2: stable-epoch pipeline applied identically to every GAN seed
if gate; then
    timeout 21600 python -u scripts/r3_stable_epoch.py --models \
        data_r2/eddy/models_Operator1_48/CGANRegression-0 \
        data_r2/eddy/models_Operator1_48/CGANRegression-1 \
        data_r2/eddy/models_Operator1_48/CGANRegression-2 \
        data_r2/eddy/models_Operator1_48/CGANRegression-3 \
        data_r2/eddy/models_Operator1_48/CGANRegression-4 \
        > "$LOGS/r4_spread_stable.log" 2>&1
    stamp "Op1x48 stable-epoch x5 exit=$?"
else stamp "backend down — skipped stable-epoch spread"; fi

# ---- Stage 3: jet breadth — Operator1 jet rows (GAN/GZ/VAE) -------------
if gate; then
    timeout 21600 $QUAL --cfg jet --operator Operator1 --nx 48 \
        --realizations 1 --models MeanVarModel CGANRegression \
        CVAERegression --retain-every 10 --no-sweep \
        > "$LOGS/r4_jet_op1_48.log" 2>&1
    stamp "jet Op1x48 exit=$?"
else stamp "backend down — skipped jet Op1"; fi

# ---- Stage 4: jet stable-epoch probe for the jet GAN ---------------------
if gate; then
    timeout 7200 python -u scripts/r3_stable_epoch.py --cfg jet \
        --models data_r2/jet/models_Operator1_48/CGANRegression-0 \
        > "$LOGS/r4_jet_stable.log" 2>&1
    stamp "jet stable-epoch exit=$?"
else stamp "backend down — skipped jet stable"; fi

# ---- Stage 5: jet forecast matrix (reference run_forecasting.py:19 runs
#      the same 15x15x{0..48h}x90d matrix for jet) -------------------------
if gate; then
    timeout 14400 python -u scripts/campaign_r2_forecast.py --cfg jet \
        --model data_r2/jet/models_Operator1_48/CGANRegression-0 \
        --operator Operator1 --truth --epoch stable \
        > "$LOGS/r4_jet_forecast.log" 2>&1
    stamp "jet forecast matrix exit=$?"
else stamp "backend down — skipped jet forecast"; fi

stamp "round-4 chain C done"
