#!/bin/bash
# Round-4 TPU gate queue (VERDICT r3 items 2, 3, 7): serial single-chip
# jobs, each writing its artifact as soon as it finishes so progress
# survives session interruptions. Launch detached:
#   setsid nohup bash perf/r4_queue.sh > /tmp/r4_queue.log 2>&1 &
set -u
cd /root/repo
FAILED=0
run() {
  local t=$1; shift
  echo "=== [$(date +%H:%M:%S)] $* ==="
  timeout "$t" "$@"
  local rc=$?
  if [ "$rc" -eq 124 ]; then
    echo "=== exit $rc (TIMEOUT after ${t}s) ==="; FAILED=1
  elif [ "$rc" -ne 0 ]; then
    echo "=== exit $rc (FAILED) ==="; FAILED=1
  else
    echo "=== exit 0 ==="
  fi
}

WS=/tmp/qgate_r4
CFG="--num_levels 16 --level_dim 2"

# 0. wait for the gap probe (holds the TPU). The 800^2 scene is generated
#    by quality_gate.py itself on the TPU (the vectorized-JAX GT renderer
#    takes ~1 h on CPU but minutes on the chip).
while [ -f /tmp/r4_gap.pid ] && kill -0 "$(cat /tmp/r4_gap.pid)" 2>/dev/null
do sleep 15; done
echo "[$(date +%H:%M:%S)] gap probe done"

# 1. quality gate at the reference budget, L16 C2 ladder (r2 ran L8 C4 and
#    landed 28.81 dB with visible texture underfit; ladder density is the
#    lever). --resume makes a re-launch continue from the 5k checkpoints.
run 12000 python -u scripts/quality_gate.py --workspace $WS \
    --iters 30000 $CFG --resume
cp $WS/quality_gate.json docs/quality_gate_r4.json 2>/dev/null

# 2. eval-protocol variant: 2x supersampled renders (GT is aa=2)
run 3600 python -u scripts/quality_gate.py --workspace $WS \
    --eval_only --render_aa 2 $CFG
cp $WS/quality_gate.json docs/quality_gate_r4_aa.json 2>/dev/null

# 3. first consistency artifact (VERDICT r3 item 7) on the gate model
run 3600 python -u scripts/eval/render_orbit.py --workspace $WS $CFG \
    --save_json docs/consistency_r4.json

# 4. full-budget recolor gate (10k style / 7k distill / 8 bases)
run 7200 python -u scripts/recolor_gate.py --workspace $WS $CFG
cp $WS/recolor_ws/recolor_gate.json docs/recolor_gate_r4.json 2>/dev/null

# 5. full-budget style gate
run 9000 python -u scripts/recolor_gate.py --workspace $WS $CFG --mode style
cp $WS/style_ws/style_gate.json docs/style_gate_r4.json 2>/dev/null

echo "queue done (failed=$FAILED)"
exit "$FAILED"
