"""Round-5 train-step + occ_update + chunk-size probe on the warm state."""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/perf")
from warmstate import get_warm_trainer  # noqa: E402

from laenerf_tpu.train.trainer import occ_update, train_step  # noqa: E402

tr, ds = get_warm_trainer()
batch = ds.get_batch(0)


def timeit(fn, n=32, label=""):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    per = (time.time() - t0) / n
    print(f"{label:40s} {per * 1e3:9.2f} ms", flush=True)
    return per


timeit(lambda: tr.train_one_batch(batch, has_alpha=True), n=48,
       label="train_one_batch (amortized occ)")

dev_args = (jnp.asarray(batch["pose"]), jnp.asarray(batch["intrinsics"]),
            jnp.asarray(batch["inds"]), jnp.asarray(batch["pixels"]))
key = jax.random.PRNGKey(7)
jax.block_until_ready(dev_args)


def step_only():
    st, aux = train_step(
        tr.state, tr.occ_state.occupancy, *dev_args, key,
        model_cfg=tr.model_cfg, render_cfg=tr.render_cfg,
        optimizer=tr.optimizer, ema_decay=tr.ema_decay, has_alpha=True,
        bg_white=tr.bg_white, H=batch["H"], W=batch["W"],
        patch_lpips_fn=tr.patch_lpips_fn, patch_size=tr.patch_size)
    tr.state = st
    return aux["loss"]


timeit(step_only, n=48, label="train_step jitted, device args")

k = jax.random.PRNGKey(3)
timeit(lambda: occ_update(
    tr.state.params, tr.occ_state, k, model_cfg=tr.model_cfg,
    bound=tr.render_cfg.bound, full=False,
    density_scale=tr.render_cfg.density_scale,
    density_thresh=tr.render_cfg.density_thresh).iter_density,
    n=16, label="occ_update (partial, redesigned)")
timeit(lambda: occ_update(
    tr.state.params, tr.occ_state, k, model_cfg=tr.model_cfg,
    bound=tr.render_cfg.bound, full=True,
    density_scale=tr.render_cfg.density_scale,
    density_thresh=tr.render_cfg.density_thresh).iter_density,
    n=8, label="occ_update (full)")

# chunk micro-sweep around the 16k winner
H = W = 800
intr = ds.intrinsics * (H / ds.H)
intr[2], intr[3] = W / 2, H / 2
for chunk in (16384, 8192, 4096):
    tr.eval_chunk = chunk
    img, _ = tr.render_image(ds.poses[0], intr, H, W)
    t0 = time.time()
    for i in range(3):
        tr.render_image(ds.poses[i % len(ds)], intr, H, W)
    print(f"render[chunk{chunk // 1024}k] "
          f"{1000 * (time.time() - t0) / 3:8.1f} ms/frame", flush=True)
print("done", flush=True)
