"""Capture an xplane trace of the warm train step (+ optional occ_update).

Usage: python -u perf/trace_step.py [--out /tmp/steptrace]
Then:  python perf/parse_xplane.py /tmp/steptrace --top 40
"""

import argparse
import sys
import tempfile
import time

parser = argparse.ArgumentParser()
parser.add_argument("--out", type=str, default="/tmp/steptrace")
parser.add_argument("--warm", type=int, default=1024)
args = parser.parse_args()

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from laenerf_tpu.data import NeRFDataset, generate_synthetic_scene
from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.train import Trainer
from laenerf_tpu.utils import enable_compilation_cache

enable_compilation_cache()

# reuse profile_render.py's warm cache when present (same model config);
# otherwise warm from scratch
import dataclasses
import os

import numpy as np

model_cfg = NeRFConfig(bound=1.0, num_levels=8, level_dim=4,
                       log2_hashmap_size=19, paired_gather=True)
render_cfg = RenderConfig(bound=1.0, cascades=1, grid_size=128,
                          max_steps=256, march_iters=256,
                          m_cap_per_ray=16, density_thresh=10.0,
                          infer_chunk_events=32)
CACHE = ("/tmp/laenerf_warm_octo" if model_cfg.octo_gather
         else "/tmp/laenerf_warm")
if os.path.exists(CACHE + "/occ.npz"):
    ds = NeRFDataset(CACHE + "/scene", "train", num_rays=4096)
    tr = Trainer(CACHE + "/ws", model_cfg, render_cfg, lr=1e-2, iters=2000,
                 eval_chunk=32768)
    tr.load_checkpoint("latest")
    d = np.load(CACHE + "/occ.npz")
    tr.occ_state = dataclasses.replace(
        tr.occ_state, occupancy=jnp.asarray(d["occupancy"]),
        density_grid=jnp.asarray(d["density_grid"]),
        iter_density=jnp.asarray(d["iter_density"]))
    print(f"# warm cache loaded, occ="
          f"{float(jnp.mean(tr.occ_state.occupancy)):.4f}", flush=True)
else:
    tmp = tempfile.mkdtemp(prefix="laenerf_trace_")
    generate_synthetic_scene(tmp, n_train=16, n_val=1, n_test=1, H=100,
                             W=100)
    ds = NeRFDataset(tmp, "train", num_rays=4096)
    tr = Trainer(tmp + "/ws", model_cfg, render_cfg, lr=1e-2, iters=2000,
                 eval_chunk=32768)
    tr.mark_untrained(ds)
    step = 0
    while step < args.warm:
        tr.train_one_batch(ds.get_batch(step % len(ds)), has_alpha=True)
        step += 1
        if step % 256 == 0 and step >= 512 \
                and float(jnp.mean(tr.occ_state.occupancy)) < 0.08:
            break
    jax.block_until_ready(tr.state.params)
    print(f"# warmed {step}, "
          f"occ={float(jnp.mean(tr.occ_state.occupancy)):.4f}", flush=True)

batch = ds.get_batch(0)
# steady state, no occ update inside the traced window
for _ in range(3):
    tr.train_one_batch(batch, has_alpha=True)
    tr.global_step += 1 if tr.global_step % 16 == 15 else 0  # dodge occ step
jax.block_until_ready(tr.state.params)

jax.profiler.start_trace(args.out)
t0 = time.time()
for _ in range(10):
    if tr.global_step % 16 == 0:
        tr.global_step += 1  # keep occ_update out of the trace
    tr.train_one_batch(batch, has_alpha=True)
jax.block_until_ready(tr.state.params)
wall = (time.time() - t0) / 10
jax.profiler.stop_trace()
print(f"traced 10 steps, {wall * 1e3:.2f} ms/step -> {args.out}", flush=True)
