#!/bin/bash
# Round-5 final-session probe queue (single TPU, sequential).
# Stage order: train levers first (decide defaults), then render sweep.
set -u
cd /root/repo
echo "[q3] 1/3 fold A/B $(date)"
timeout 2400 python -u perf/r5_fold_ab.py > /tmp/r5_fold_ab.log 2>&1
echo "[q3] rc=$?"
echo "[q3] 2/3 train sorted A/B $(date)"
timeout 1800 python -u perf/r5_train_sorted_ab.py > /tmp/r5_train_sorted.log 2>&1
echo "[q3] rc=$?"
echo "[q3] 3/3 render sweep $(date)"
timeout 3600 python -u perf/r5_render_sweep.py --configs march,sorted,pmarch,pmarch+sorted > /tmp/r5_sweep.log 2>&1
echo "[q3] rc=$?"
echo "[q3] DONE $(date)"
