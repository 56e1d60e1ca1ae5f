#!/bin/bash
# Round-4 measurement sequence (on-silicon A/B of every round-3 lever).
#   bash perf/r4_runbook.sh 2>&1 | tee /tmp/r4_runbook.log
# The packed-window march is excluded from the main sweep: on TPU it hit a
# >1500 s compile with no frame produced (r4 session log); it gets one
# long-timeout retry at the end.
set -u
cd /root/repo
FAILED=0
run() {
  local t=$1; shift
  echo "=== $* ==="
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

run 120 python -c "import jax; print(jax.devices())"

# march levers
run 1500 python -u perf/profile_render.py --runs 2 --repack 4
run 900 python -u perf/probe_alive.py --max_chunks 10

# eval levers
run 1500 python -u perf/profile_render.py --runs 2 --view_f8
run 1500 python -u perf/profile_render.py --runs 2 --warmup_rounds 2
run 1500 python -u perf/profile_render.py --runs 2 --repack 4 --view_f8 --warmup_rounds 2

# raster streams (march-free rounds)
run 1500 python -u perf/profile_render.py --runs 2 --raster
run 1500 python -u perf/profile_render.py --runs 2 --raster --view_f8 --warmup_rounds 2
run 1500 python -u perf/profile_render.py --runs 2 --raster --view_f8 --warmup_rounds 2 --chunk 65536

# chunk sweep on the march+levers combo
run 1500 python -u perf/profile_render.py --runs 2 --repack 4 --view_f8 --warmup_rounds 2 --chunk 65536
run 1500 python -u perf/profile_render.py --runs 2 --repack 4 --view_f8 --warmup_rounds 2 --chunk 16384

# train step: current vs v2 scatter
run 1500 python -u perf/profile_step2.py
run 1500 env LAENERF_SCATTER_V2=1 python -u perf/profile_step2.py

# window march: one long-timeout retry, last (known-slow compile on TPU)
run 3000 python -u perf/profile_render.py --runs 2 --window

echo "runbook done (failed=$FAILED)"
exit "$FAILED"
