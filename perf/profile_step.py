"""Decompose the train step and render round on real hardware.

Times, at a realistically pruned occupancy state:
  - full train step
  - loss forward only (no grad)
  - forward+backward (no optimizer)
  - march alone
  - encoder forward alone / encoder forward+backward (at the live M_cap)
  - MLP forward alone
  - one render chunk round structure

Usage: python -u perf/profile_step.py [--warm 768]
"""

import argparse
import sys
import tempfile
import time

parser = argparse.ArgumentParser()
parser.add_argument("--warm", type=int, default=1024)
args = parser.parse_args()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from laenerf_tpu.data import NeRFDataset, generate_synthetic_scene
from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.models.nerf import nerf_forward
from laenerf_tpu.ops.hashgrid import hashgrid_encode
from laenerf_tpu.ops.raymarch import march_rays_train, near_far_from_aabb
from laenerf_tpu.train import Trainer
from laenerf_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def timeit(fn, *a, n=20, label="", **kw):
    r = fn(*a, **kw)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*a, **kw)
    jax.block_until_ready(r)
    per = (time.time() - t0) / n
    print(f"{label:46s} {per * 1e3:9.2f} ms", flush=True)
    return per


tmp = tempfile.mkdtemp(prefix="laenerf_prof_")
generate_synthetic_scene(tmp, n_train=16, n_val=1, n_test=1, H=100, W=100)
ds = NeRFDataset(tmp, "train", num_rays=4096)

model_cfg = NeRFConfig(bound=1.0, num_levels=8, level_dim=4,
                       log2_hashmap_size=19, paired_gather=True)
render_cfg = RenderConfig(bound=1.0, cascades=1, grid_size=128,
                          max_steps=256, march_iters=256,
                          m_cap_per_ray=16, density_thresh=10.0,
                          infer_chunk_events=32)
tr = Trainer(tmp + "/ws", model_cfg, render_cfg, lr=1e-2, iters=2000,
             eval_chunk=32768)
tr.mark_untrained(ds)

step = 0
while step < args.warm:
    tr.train_one_batch(ds.get_batch(step % len(ds)), has_alpha=True)
    step += 1
    if step % 256 == 0:
        occ = float(jnp.mean(tr.occ_state.occupancy))
        print(f"# warm {step}: occ {occ:.3f}", flush=True)
        if occ < 0.08 and step >= 512:
            break
jax.block_until_ready(tr.state.params)
occ_frac = float(jnp.mean(tr.occ_state.occupancy))
print(f"# warmed {step} steps, occ_frac={occ_frac:.4f}", flush=True)

batch = ds.get_batch(0)

# --- full step -------------------------------------------------------------
timeit(lambda: tr.train_one_batch(batch, has_alpha=True), n=30,
       label="full train step")

# --- march alone -------------------------------------------------------------
from laenerf_tpu.data.rays import get_rays

pose = jnp.asarray(batch["pose"])
intr = jnp.asarray(batch["intrinsics"])
inds = jnp.asarray(batch["inds"])
rays_o, rays_d = jax.jit(get_rays, static_argnames=("H", "W"))(
    pose, intr, inds, ds.H, ds.W)
cfg = render_cfg.march_cfg
aabb = jnp.array([-1.0] * 3 + [1.0] * 3, jnp.float32)
nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, render_cfg.min_near)
noises = jnp.zeros((4096,), jnp.float32)
occ = tr.occ_state.occupancy

march = jax.jit(lambda *a: march_rays_train(*a, cfg))
timeit(march, rays_o, rays_d, occ, nears, fars, noises, n=30,
       label=f"march_rays_train ({cfg.march_iters} events)")
m = march(rays_o, rays_d, occ, nears, fars, noises)
n_valid = int(jnp.sum(m["valid"]))
print(f"# n_valid samples: {n_valid} ({n_valid / 4096:.1f}/ray)", flush=True)

# --- encoder alone at M_cap --------------------------------------------------
M = 4096 * 16
xyz = jax.random.uniform(jax.random.PRNGKey(0), (M, 3), jnp.float32,
                         minval=-1, maxval=1)
table = tr.state.params["encoder"]
spec = model_cfg.grid_spec

enc = jax.jit(lambda t, x: hashgrid_encode(t, x, spec, bound=1.0))
timeit(enc, table, xyz, n=30, label=f"encoder fwd [{M}]")


def enc_loss(t, x):
    return jnp.sum(hashgrid_encode(t, x, spec, bound=1.0) ** 2)

enc_grad = jax.jit(jax.grad(enc_loss))
timeit(enc_grad, table, xyz, n=30, label=f"encoder fwd+bwd [{M}]")

# --- full network fwd at M_cap ----------------------------------------------
dirs = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
net = jax.jit(lambda p, x, d: nerf_forward(p, model_cfg, x, d))
timeit(net, tr.state.params, xyz, dirs, n=30, label=f"network fwd [{M}]")


def net_loss(p, x, d):
    s, r = nerf_forward(p, model_cfg, x, d)
    return jnp.sum(s) + jnp.sum(r)

net_grad = jax.jit(jax.grad(net_loss))
timeit(net_grad, tr.state.params, xyz, dirs, n=30,
       label=f"network fwd+bwd [{M}]")

# --- loss fwd / fwd+bwd ------------------------------------------------------
from laenerf_tpu.models.renderer import render_rays_train

key = jax.random.PRNGKey(0)


@jax.jit
def loss_only(params):
    out = render_rays_train(params, occ, rays_o, rays_d, key,
                            model_cfg=model_cfg, render_cfg=render_cfg,
                            bg_color=None, perturb=True)
    return jnp.mean((out["image"] - 0.5) ** 2)

timeit(loss_only, tr.state.params, n=30, label="render_rays_train loss fwd")

loss_grad = jax.jit(jax.grad(loss_only))
timeit(loss_grad, tr.state.params, n=30, label="render loss fwd+bwd")

# --- render ------------------------------------------------------------------
t0 = time.time()
img, _ = tr.render_image(ds.poses[0], ds.intrinsics, ds.H, ds.W)
print(f"# render 100x100 (compiled?): {(time.time() - t0) * 1e3:.0f} ms",
      flush=True)
t0 = time.time()
img, _ = tr.render_image(ds.poses[1], ds.intrinsics, ds.H, ds.W)
print(f"# render 100x100 warm: {(time.time() - t0) * 1e3:.0f} ms", flush=True)
print("done", flush=True)
