#!/bin/bash
# Round-5 style gate (VERDICT r4 #4, style half). The r5 30k gate
# workspace was lost to a VM reset before the night queue's style stage
# ran, so this trains a FRESH base (8k iters, L16C2 — honestly labeled in
# the artifact via psnr fields) and runs the style pipeline on it.
# Budgets via env: STYLE_STEPS / DISTILL_STEPS (default reference-full
# 10000/7000; the wall clock may force a reduced, honestly-labeled run).
set -u
cd /root/repo
WS=${WS:-/tmp/qgate_style}
CFG="--num_levels 16 --level_dim 2"
STYLE_STEPS=${STYLE_STEPS:-10000}
DISTILL_STEPS=${DISTILL_STEPS:-7000}
echo "[style-gate] base train $(date)"
timeout ${BASE_TIMEOUT:-2700} python -u scripts/quality_gate.py \
  --workspace $WS --iters ${BASE_ITERS:-8000} $CFG > /tmp/r5_style_base.log 2>&1
echo "[style-gate] base rc=$? $(date)"
echo "[style-gate] style pipeline steps=$STYLE_STEPS/$DISTILL_STEPS $(date)"
timeout ${STYLE_TIMEOUT:-4500} python -u scripts/recolor_gate.py \
  --workspace $WS $CFG --mode style --style_lg 18 \
  --style_steps $STYLE_STEPS --distill_steps $DISTILL_STEPS \
  > /tmp/r5_style.log 2>&1
echo "[style-gate] style rc=$? $(date)"
if [ -f $WS/style_ws/style_gate.json ]; then
  cp $WS/style_ws/style_gate.json docs/style_gate_r5.json
  echo "[style-gate] docs/style_gate_r5.json landed"
fi
echo "[style-gate] DONE $(date)"
