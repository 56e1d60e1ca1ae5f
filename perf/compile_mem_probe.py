"""AOT-compile train_step at a given config and print XLA's HBM analysis.

Catches compile-time OOMs (like the r5 quality-gate L16C2/max_steps=1024
failure: 16.21 G needed vs 15.75 G) without occupying the chip — only the
remote compile service runs. Use after memory-shaping changes (octo-view
fold VJP, optax.flatten) to check headroom before queueing long runs.

Usage: python -u perf/compile_mem_probe.py [--num_levels 16] [--level_dim 2]
         [--max_steps 1024] [--march_iters 512] [--m_cap 40] [--rays 4096]
"""

import argparse
import sys

parser = argparse.ArgumentParser()
parser.add_argument("--num_levels", type=int, default=16)
parser.add_argument("--level_dim", type=int, default=2)
parser.add_argument("--lg", type=int, default=19)
parser.add_argument("--max_steps", type=int, default=1024)
parser.add_argument("--march_iters", type=int, default=512)
parser.add_argument("--m_cap", type=int, default=40)
parser.add_argument("--rays", type=int, default=4096)
parser.add_argument("--H", type=int, default=800)
args = parser.parse_args()

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.train import Trainer
from laenerf_tpu.train.trainer import train_step
from laenerf_tpu.utils import enable_compilation_cache

enable_compilation_cache()

model_cfg = NeRFConfig(bound=1.0, num_levels=args.num_levels,
                       level_dim=args.level_dim, log2_hashmap_size=args.lg)
render_cfg = RenderConfig(bound=1.0, cascades=1, grid_size=128,
                          max_steps=args.max_steps,
                          march_iters=args.march_iters,
                          m_cap_per_ray=args.m_cap, density_thresh=10.0,
                          infer_chunk_events=16, infer_compact_factor=4)
tr = Trainer("/tmp/cmem_ws", model_cfg, render_cfg, lr=1e-2, iters=30000)

N = args.rays
lowered = train_step.lower(
    tr.state, tr.occ_state.occupancy,
    jnp.zeros((4, 4), jnp.float32), jnp.zeros((4,), jnp.float32),
    jnp.zeros((N,), jnp.int32), jnp.zeros((N, 4), jnp.float32),
    jax.random.PRNGKey(0),
    model_cfg=model_cfg, render_cfg=render_cfg, optimizer=tr.optimizer,
    ema_decay=0.95, has_alpha=True, bg_white=True, H=args.H, W=args.H)
print("lowered; compiling...", flush=True)
compiled = lowered.compile()
m = compiled.memory_analysis()
GB = 1 << 30
print(f"argument {m.argument_size_in_bytes / GB:.3f} GB  "
      f"output {m.output_size_in_bytes / GB:.3f} GB  "
      f"temp {m.temp_size_in_bytes / GB:.3f} GB  "
      f"alias {m.alias_size_in_bytes / GB:.3f} GB", flush=True)
total = (m.argument_size_in_bytes + m.output_size_in_bytes
         + m.temp_size_in_bytes - m.alias_size_in_bytes)
print(f"TOTAL (arg+out+temp-alias) {total / GB:.3f} GB of 15.75 GB hbm",
      flush=True)
