#!/bin/bash
# Round-5 night queue (single TPU, sequential). Launch DETACHED:
#   setsid nohup bash perf/r5_queue.sh > /tmp/r5_queue.log 2>&1 &
# Waits for the 30k quality gate (pid in /tmp/qgate_r5.pid), then runs the
# measurement + artifact ladder. Each stage logs to its own /tmp file and
# the queue never aborts on a stage failure.
set -u
cd /root/repo

# wait on the artifact, not a PID: the gate may be restarted by
# perf/gate_watchdog.sh across tunnel stalls. Cap the wait at 4 h.
echo "[queue] waiting for quality gate artifact $(date)"
for i in $(seq 1 240); do
  [ -f /tmp/qgate_r5/quality_gate.json ] && break
  # also stop waiting if the watchdog gave up AND nothing is running
  sleep 60
done
echo "[queue] gate wait over $(date)"
if [ -f /tmp/qgate_r5/quality_gate.json ]; then
  cp /tmp/qgate_r5/quality_gate.json docs/quality_gate_r5.json
  echo "[queue] quality_gate_r5.json landed"
else
  echo "[queue] WARNING: no quality_gate.json"
fi

# snapshot for the style gate so the pristine ws serves consistency first
rm -rf /tmp/qgate_r5_style
cp -r /tmp/qgate_r5 /tmp/qgate_r5_style

echo "[queue] 1/7 pallas gather retest $(date)"
timeout 2400 python -u perf/microbench_pallas.py > /tmp/r5_pallas.log 2>&1
echo "[queue] rc=$?"

echo "[queue] 2/8 sorted-gather locality $(date)"
timeout 2400 python -u perf/microbench_sorted_gather.py > /tmp/r5_sorted.log 2>&1
echo "[queue] rc=$?"

echo "[queue] 2b/8 pallas march-round A/B $(date)"
timeout 2400 python -u perf/microbench_march_pallas.py > /tmp/r5_march.log 2>&1
echo "[queue] rc=$?"

echo "[queue] 3/7 flatten A/B on the warm bench state $(date)"
timeout 3600 env LAENERF_FLAT_OPT=1 python -u perf/r5_train_probe.py > /tmp/r5_flat1.log 2>&1
echo "[queue] flat=1 rc=$?"
timeout 3600 env LAENERF_FLAT_OPT=0 python -u perf/r5_train_probe.py > /tmp/r5_flat0.log 2>&1
echo "[queue] flat=0 rc=$?"

echo "[queue] 4/7 consistency_r5 (pristine r5 model) $(date)"
timeout 5400 python -u scripts/eval/render_orbit.py --workspace /tmp/qgate_r5 \
  --num_levels 16 --level_dim 2 --max_steps 1024 \
  --save_json docs/consistency_r5.json > /tmp/r5_consistency.log 2>&1
echo "[queue] rc=$?"

echo "[queue] 5/7 style gate, full budget $(date)"
timeout 14400 python -u scripts/recolor_gate.py --workspace /tmp/qgate_r5_style \
  --mode style --num_levels 16 --level_dim 2 --max_steps 1024 \
  > /tmp/r5_style.log 2>&1
echo "[queue] rc=$?"
if [ -f /tmp/qgate_r5_style/style_ws/style_gate.json ]; then
  cp /tmp/qgate_r5_style/style_ws/style_gate.json docs/style_gate_r5.json
  echo "[queue] style_gate_r5.json landed"
fi

echo "[queue] 6/7 compile-mem probe FLAT_OPT=0 (cache-hit expected) $(date)"
timeout 2400 env LAENERF_FLAT_OPT=0 python -u perf/compile_mem_probe.py \
  > /tmp/cmem_flat0.log 2>&1
echo "[queue] rc=$?"

echo "[queue] 7/7 bench (seeds the driver-run cache) $(date)"
timeout 7200 python -u bench.py > /tmp/r5_bench.log 2>&1
echo "[queue] rc=$?"
echo "[queue] DONE $(date)"

echo "[queue] 8/8 render sweep: pallas-march + sorted-eval end-to-end $(date)"
timeout 7200 python -u perf/r5_render_sweep.py \
  --configs march,sorted,pmarch,pmarch+sorted,pmarch+sorted+Km64 \
  > /tmp/r5_sweep2.log 2>&1
echo "[queue] rc=$?"
echo "[queue] ALL DONE $(date)"

echo "[queue] 9/9 train sorted-eval A/B $(date)"
timeout 3600 python -u perf/r5_train_sorted_ab.py > /tmp/r5_train_sorted.log 2>&1
echo "[queue] rc=$?"
echo "[queue] FINAL DONE $(date)"
