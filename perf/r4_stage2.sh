#!/bin/bash
# Round-4 stage 2: runs after perf/r4_queue.sh drains. Train-step A/Bs
# (scatter v2 promotion decision, VERDICT r3 item 1/5) and a bench.py
# pre-seed run that warms the persistent XLA cache so the driver's
# BENCH_r04 run hits it (setup_s < 300 target).
#   setsid nohup bash perf/r4_stage2.sh > /tmp/r4_stage2.log 2>&1 &
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

# wait for the gate queue to release the TPU
if [ -f /tmp/r4_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue.pid)" 2>/dev/null; do sleep 30; done
fi
echo "[$(date +%H:%M:%S)] queue drained; stage 2 starts"

# 1. v2 narrow-window scatter kernel: real-TPU lowering smoke (the r4
#    pre-session hit a Mosaic error on the old (1,128) int32 block)
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

# 1b. bench train/test-gap experiment (VERDICT r3 item 2 diagnosis):
#     16 vs 64 train views at the bench config -> overfit or eval bug
run 2400 python -u perf/gap_probe.py --steps 1024

# 2. train-step decomposition with the donated state (baseline)
run 1800 python -u perf/profile_step2.py
# 3. same with the v2 scatter kernel -> promotion decision
run 1800 env LAENERF_SCATTER_V2=1 python -u perf/profile_step2.py

# 4. bench pre-seed: runs the exact bench the driver will run, warming the
#    persistent XLA cache (also the march/repack/f8/raster mode A/B)
run 3600 python -u bench.py

echo "stage2 done (failed=$FAILED)"
exit "$FAILED"
