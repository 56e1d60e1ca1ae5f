#!/bin/bash
# Round-4 quality probes: short (5k-iter) A/Bs of capacity/sampling knobs
# before committing the 30k-iter gate run to one config (the r2 gate sits
# at 29.26 dB; target >= 32 — the visible error is high-frequency texture
# underfit + one floater, docs/images/qgate_test_pred.png).
#   bash perf/r4_quality_probes.sh 2>&1 | tee /tmp/r4_qprobes.log
set -u
cd /root/repo
FAILED=0
run() {
  local t=$1; shift
  echo "=== $* ==="
  timeout "$t" "$@"
  local rc=$?
  [ "$rc" -ne 0 ] && { echo "=== exit $rc ($([ $rc -eq 124 ] && echo TIMEOUT || echo FAILED)) ==="; FAILED=1; } || echo "=== exit 0 ==="
}

# one shared 800^2 scene for all probes (generation is host-expensive)
SC=/tmp/qscene_800
if [ ! -f "$SC/transforms_train.json" ]; then
  run 1800 python -c "
import sys; sys.path.insert(0, '/root/repo')
from laenerf_tpu.data import generate_synthetic_scene
from laenerf_tpu.data.synthetic import lego_class_scene
generate_synthetic_scene('$SC', n_train=64, n_val=4, n_test=8, H=800, W=800,
                         spheres=lego_class_scene(), aa=2)
print('scene ready')
"
fi

probe() {
  local name=$1; shift
  mkdir -p "/tmp/qp_$name"
  ln -sfn "$SC" "/tmp/qp_$name/scene"
  run 2400 python -u scripts/quality_gate.py --workspace "/tmp/qp_$name" \
      --iters 5000 "$@"
}

probe base
probe l16d2 --num_levels 16 --level_dim 2
probe lg21 --lg 21
probe ms1024 --max_steps 1024
# eval-protocol probe: rerun base eval with 2x supersampled renders
run 1200 python -u scripts/quality_gate.py --workspace /tmp/qp_base \
    --eval_only --render_aa 2

echo "quality probes done (failed=$FAILED)"
exit "$FAILED"
