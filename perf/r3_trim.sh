#!/bin/bash
# Trimmed round-3 hardware runbook: critical measurements only.
set -u
cd /root/repo
FAILED=0
run() {
  echo "=== $* ==="
  timeout 900 "$@"
  local rc=$?
  if [ "$rc" -eq 124 ]; then
    echo "=== exit $rc (TIMEOUT) ==="
    FAILED=1
  elif [ "$rc" -ne 0 ]; then
    echo "=== exit $rc (FAILED) ==="
    FAILED=1
  else
    echo "=== exit 0 ==="
  fi
}
run python -u perf/profile_render.py --runs 2
run python -u perf/profile_render.py --runs 2 --raster
run python -u perf/profile_render.py --runs 2 --raster --view_f8 --warmup_rounds 2
run python -u perf/profile_render.py --runs 2 --window --repack 4 --view_f8 --warmup_rounds 2
run python -u perf/profile_step2.py
run env LAENERF_SCATTER_V2=1 python -u perf/profile_step2.py
echo "runbook done (failed=$FAILED)"
exit "$FAILED"
