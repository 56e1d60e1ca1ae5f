#!/bin/bash
# Round-4 queue, revised tail (reordered mid-round for the wall clock):
# the bench pre-seed and v2 A/B must land BEFORE the driver's BENCH_r04;
# the style gate gets whatever TPU time remains, at an honestly-labeled
# reduced budget if needed.
#   setsid nohup bash perf/r4_queue2.sh > /tmp/r4_queue2.log 2>&1 &
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
GATE_PID=${GATE_PID:-17268}

# 0. wait for the in-flight 30k quality gate (left running when the tail
#    was reordered), then retry-from-checkpoint if it died early
while kill -0 "$GATE_PID" 2>/dev/null; do sleep 30; done
echo "[$(date +%H:%M:%S)] gate process done"
for attempt in 1 2; do
  [ -f $WS/quality_gate.json ] && break
  echo "[$(date +%H:%M:%S)] no gate artifact; resume attempt $attempt"
  run 10800 python -u scripts/quality_gate.py --workspace $WS \
      --iters 30000 $CFG --resume
done
cp $WS/quality_gate.json docs/quality_gate_r4.json 2>/dev/null

# 1. first consistency artifact (VERDICT r3 item 7) on the gate model
run 2400 python -u scripts/eval/render_orbit.py --workspace $WS $CFG \
    --save_json docs/consistency_r4.json

# 2. full-budget recolor gate (10k style / 7k distill / 8 bases).
#    style_lg 18 is the r2-verdict lever that was never measured: halves
#    the editing encoder's backward table; bg-MSE + psnr_train_after in
#    the artifact validate the capacity cost.
run 6000 python -u scripts/recolor_gate.py --workspace $WS $CFG --style_lg 18
cp $WS/recolor_ws/recolor_gate.json docs/recolor_gate_r4.json 2>/dev/null

# 3. v2 narrow-window scatter kernel: real-TPU lowering smoke
run 600 python -u -c "
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax.numpy as jnp
from laenerf_tpu.ops.scatter_add import scatter_add_rows_v2, scatter_add_rows_xla
rng = np.random.RandomState(0)
for Q, T in [(1 << 17, 1 << 20), (300000, 2900000)]:
    idx = rng.randint(0, T, Q).astype(np.int32)
    g = rng.randn(Q, 8).astype(np.float32)
    out = scatter_add_rows_v2(jnp.asarray(idx), jnp.asarray(g), T)
    ref = scatter_add_rows_xla(jnp.asarray(idx), jnp.asarray(g), T)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f'v2 lowering ok Q={Q} T={T} max_abs_err={err:.2e}', flush=True)
    assert err < 2e-2
"

# 4. bench pre-seed: the exact bench the driver runs — warms the
#    persistent XLA cache (setup_s < 300) and A/Bs the render modes
run 3600 python -u bench.py

# 5. v2 train-step timing -> promotion decision vs the pre-seed's it/s
run 1500 env LAENERF_SCATTER_V2=1 python -u perf/profile_step2.py

# 6. style gate: full budget if the clock allows, else reduced (the JSON
#    records style_steps/distill_steps, so the budget is self-labeling)
run 5400 python -u scripts/recolor_gate.py --workspace $WS $CFG \
    --style_lg 18 --mode style --style_steps 2000 --distill_steps 1500 \
    --palette_steps 600
cp $WS/style_ws/style_gate.json docs/style_gate_r4.json 2>/dev/null

# 7. eval-protocol variant: 2x supersampled renders (GT is aa=2)
run 3600 python -u scripts/quality_gate.py --workspace $WS \
    --eval_only --render_aa 2 $CFG
cp $WS/quality_gate.json docs/quality_gate_r4_aa.json 2>/dev/null

echo "queue2 done (failed=$FAILED)"
exit "$FAILED"
