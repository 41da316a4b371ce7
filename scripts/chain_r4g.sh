#!/bin/bash
# Round-4 session-2 chain, stage 4: the 96^2 legs.
#   1. GZ 96^2 cells (cheap deterministic fits) + online via the fused
#      pallas backend — a different compiled program than the XLA conv
#      path that crashed the axon worker in round 3 (VERDICT item 4's
#      queued experiment);
#   (crash-bisect moved to chain_r4h.sh — must run last; the 96^2
#    GAN/VAE trainings moved to chain_r4j.sh so the 5-seed spread study
#    can run before them).
# Usage: setsid nohup bash scripts/chain_r4g.sh > data_r2/logs/chain_r4g.log 2>&1 &
set -u
cd /root/repo
LOGS=data_r2/logs
mkdir -p "$LOGS"
QUAL="python -u scripts/campaign_r2_quality.py"
SCORE="python -u scripts/r3_online_score.py"
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

# ---- Stage 0: the two VAE bench rows that false-negatived twice in
#      chain_r4e stage 0 (bench.py now retries its health probe) ----------
for ROW in \
    "--nx 48 --model-folder trained_models/eddy_vae_48_op1 --backend xla" \
    "--nx 48 --model-folder trained_models/eddy_vae_48_op1 --backend pallas:dx"
do
    if gate; then
        echo "### $ROW (recapture 2)" >> data_r2/bench_rows.jsonl
        timeout 580 python bench.py $ROW >> data_r2/bench_rows.jsonl 2>&1
        stamp "bench recapture [$ROW] exit=$?"
    fi
done

# ---- Stage 1: GZ 96^2 cells, online via fused pallas ---------------------
for OP in Operator1 Operator2; do
    if gate; then
        timeout 7200 $QUAL --cfg eddy --operator $OP --nx 96 \
            --data-cap 150 --realizations 1 --models MeanVarModel \
            --skip-online --no-sweep --no-lores \
            > "$LOGS/r4_gz96_${OP}_train.log" 2>&1
        stamp "GZ $OP x96 train exit=$?"
        timeout 7200 $SCORE --model data_r2/eddy/models_${OP}_96/MeanVarModel-0 \
            --operator $OP --nx 96 --segments 24 --online-backend pallas \
            --sub eddy-constant-0 > "$LOGS/r4_gz96_${OP}_online.log" 2>&1
        stamp "GZ $OP x96 online (pallas) exit=$?"
    else stamp "backend down — skipped GZ $OP x96"; fi
done

stamp "chain r4g done"
