#!/bin/bash
# Trimmed round-3 hardware runbook: critical measurements only.
set -u
cd /root/repo
run() {
  echo "=== $* ==="
  timeout 900 "$@"
  echo "=== exit $? ==="
}
run python -u perf/profile_render.py --runs 2
run python -u perf/profile_render.py --runs 2 --raster
run python -u perf/profile_render.py --runs 2 --raster --view_f8 --warmup_rounds 2
run python -u perf/profile_render.py --runs 2 --window --repack 4 --view_f8 --warmup_rounds 2
run python -u perf/profile_step2.py
run env LAENERF_SCATTER_V2=1 python -u perf/profile_step2.py
echo "runbook done"
