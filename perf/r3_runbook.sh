#!/bin/bash
# Round-3 measurement sequence. Run when the TPU tunnel is live:
#   bash perf/r3_runbook.sh 2>&1 | tee /tmp/r3_runbook.log
# Each stage is independently timeout-bounded; later stages still run if an
# earlier one fails. Results land in the log for PERF.md.
set -u
cd /root/repo

run() {
  echo "=== $* ==="
  timeout 1500 "$@"
  echo "=== exit $? ==="
}

# 0. device sanity
run python -c "import jax; print(jax.devices())"

# 1. render baseline (expect ~2229 ms from r2-tail state)
run python -u perf/profile_render.py --runs 2

# 2. march levers, one at a time
run python -u perf/profile_render.py --runs 2 --window
run python -u perf/probe_alive.py --max_chunks 10
run python -u perf/profile_render.py --runs 2 --repack 4
run python -u perf/profile_render.py --runs 2 --window --repack 4

# 3. eval levers
run python -u perf/profile_render.py --runs 2 --view_f8
run python -u perf/profile_render.py --runs 2 --warmup_rounds 2
run python -u perf/profile_render.py --runs 2 --window --repack 4 --view_f8
run python -u perf/profile_render.py --runs 2 --window --repack 4 --view_f8 --warmup_rounds 2

# 3b. raster streams (march-free rounds)
run python -u perf/profile_render.py --runs 2 --raster
run python -u perf/profile_render.py --runs 2 --raster --view_f8 --warmup_rounds 2
run python -u perf/profile_render.py --runs 2 --raster --view_f8 --warmup_rounds 2 --chunk 65536

# 4. chunk sweep on the best combo
run python -u perf/profile_render.py --runs 2 --window --repack 4 --view_f8 --warmup_rounds 2 --chunk 65536
run python -u perf/profile_render.py --runs 2 --window --repack 4 --view_f8 --warmup_rounds 2 --chunk 16384

# 5. train step: current vs v2 scatter
run python -u perf/profile_step2.py
run env LAENERF_SCATTER_V2=1 python -u perf/profile_step2.py

echo "runbook done"
