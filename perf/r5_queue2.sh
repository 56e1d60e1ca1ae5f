#!/bin/bash
# Revised night queue (after the first microbench results): wide-lane
# probes first (they gate kernel-v2 work), then artifacts.
set -u
cd /root/repo

echo "[q2] 1/9 pallas probes incl wide-lane $(date)"
timeout 2400 python -u perf/microbench_pallas.py > /tmp/r5_pallas2.log 2>&1
echo "[q2] rc=$?"

echo "[q2] 2/9 march-round kernel A/B (expected compile FAIL, for the record) $(date)"
timeout 1800 python -u perf/microbench_march_pallas.py > /tmp/r5_march.log 2>&1
echo "[q2] rc=$?"

echo "[q2] 3/9 flatten A/B $(date)"
timeout 3600 env LAENERF_FLAT_OPT=1 python -u perf/r5_train_probe.py > /tmp/r5_flat1.log 2>&1
echo "[q2] flat=1 rc=$?"
timeout 3600 env LAENERF_FLAT_OPT=0 python -u perf/r5_train_probe.py > /tmp/r5_flat0.log 2>&1
echo "[q2] flat=0 rc=$?"

echo "[q2] 4/9 consistency_r5 $(date)"
timeout 5400 python -u scripts/eval/render_orbit.py --workspace /tmp/qgate_r5 \
  --num_levels 16 --level_dim 2 --max_steps 1024 \
  --save_json docs/consistency_r5.json > /tmp/r5_consistency.log 2>&1
echo "[q2] rc=$?"

echo "[q2] 5/9 style gate, full budget $(date)"
rm -rf /tmp/qgate_r5_style
cp -r /tmp/qgate_r5 /tmp/qgate_r5_style
timeout 14400 python -u scripts/recolor_gate.py --workspace /tmp/qgate_r5_style \
  --mode style --num_levels 16 --level_dim 2 --max_steps 1024 \
  > /tmp/r5_style.log 2>&1
echo "[q2] rc=$?"
[ -f /tmp/qgate_r5_style/style_ws/style_gate.json ] && \
  cp /tmp/qgate_r5_style/style_ws/style_gate.json docs/style_gate_r5.json

echo "[q2] 6/9 aa eval decomposition (where does the last dB live) $(date)"
timeout 3600 python -u scripts/quality_gate.py --workspace /tmp/qgate_r5 \
  --eval_only --render_aa 2 --num_levels 16 --level_dim 2 --max_steps 1024 \
  > /tmp/r5_qaa.log 2>&1
echo "[q2] rc=$?"
[ -f /tmp/qgate_r5/quality_gate.json ] && \
  cp /tmp/qgate_r5/quality_gate.json docs/quality_gate_r5_aa.json

echo "[q2] 7/9 compile-mem probe FLAT_OPT=0 $(date)"
timeout 2400 env LAENERF_FLAT_OPT=0 python -u perf/compile_mem_probe.py \
  > /tmp/cmem_flat0.log 2>&1
echo "[q2] rc=$?"

echo "[q2] 8/9 bench (seeds driver cache) $(date)"
timeout 7200 python -u bench.py > /tmp/r5_bench.log 2>&1
echo "[q2] rc=$?"

echo "[q2] 9/9 render sweep (march/sorted/pmarch record) $(date)"
timeout 7200 python -u perf/r5_render_sweep.py \
  --configs march,sorted,pmarch > /tmp/r5_sweep2.log 2>&1
echo "[q2] rc=$?"
echo "[q2] ALL DONE $(date)"

echo "[q2] 10 fold A/B (one process) $(date)"
timeout 3600 python -u perf/r5_fold_ab.py > /tmp/r5_fold_ab.log 2>&1
echo "[q2] rc=$?"
echo "[q2] REALLY ALL DONE $(date)"

echo "[q2] 11 train-view PSNR decomposition $(date)"
timeout 3600 python -u perf/r5_trainview_eval.py > /tmp/r5_trainview.log 2>&1
echo "[q2] rc=$?"
echo "[q2] TRULY ALL DONE $(date)"
