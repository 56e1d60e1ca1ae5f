"""Split the full-train-step overhead: jitted step vs occ update vs host prep.

Companion to profile_step.py (which times train_one_batch, thereby folding
in the every-16-step occupancy update and per-step host->device transfers).
"""

import sys
import tempfile
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from laenerf_tpu.data import NeRFDataset, generate_synthetic_scene
from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.train import Trainer
from laenerf_tpu.train.trainer import occ_update, train_step
from laenerf_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def timeit(fn, n=30, label=""):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    per = (time.time() - t0) / n
    print(f"{label:46s} {per * 1e3:9.2f} ms", flush=True)
    return per


tmp = tempfile.mkdtemp(prefix="laenerf_prof2_")
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
while step < 1024:
    tr.train_one_batch(ds.get_batch(step % len(ds)), has_alpha=True)
    step += 1
    if step % 256 == 0 and float(jnp.mean(tr.occ_state.occupancy)) < 0.08 \
            and step >= 512:
        break
jax.block_until_ready(tr.state.params)
print(f"# warmed {step}, occ={float(jnp.mean(tr.occ_state.occupancy)):.4f}",
      flush=True)

batch = ds.get_batch(0)

# full train_one_batch (includes every-16 occ update + host prep)
timeit(lambda: tr.train_one_batch(batch, has_alpha=True), n=32,
       label="train_one_batch (amortized occ)")

# jitted train_step only, device-resident args
dev_args = (jnp.asarray(batch["pose"]), jnp.asarray(batch["intrinsics"]),
            jnp.asarray(batch["inds"]), jnp.asarray(batch["pixels"]))
key = jax.random.PRNGKey(7)
jax.block_until_ready(dev_args)


def step_only():
    # train_step donates its state; rebind so the next call gets live buffers
    st, aux = train_step(
        tr.state, tr.occ_state.occupancy, *dev_args, key,
        model_cfg=tr.model_cfg, render_cfg=tr.render_cfg,
        optimizer=tr.optimizer, ema_decay=tr.ema_decay, has_alpha=True,
        bg_white=tr.bg_white, H=batch["H"], W=batch["W"],
        patch_lpips_fn=tr.patch_lpips_fn, patch_size=tr.patch_size)
    tr.state = st
    return aux["loss"]

timeit(step_only, n=32, label="train_step jitted, device args")


# step incl. host->device asarray each call (no occ update)
def step_prep():
    st, aux = train_step(
        tr.state, tr.occ_state.occupancy,
        jnp.asarray(batch["pose"]), jnp.asarray(batch["intrinsics"]),
        jnp.asarray(batch["inds"]), jnp.asarray(batch["pixels"]),
        tr._next_key(),
        model_cfg=tr.model_cfg, render_cfg=tr.render_cfg,
        optimizer=tr.optimizer, ema_decay=tr.ema_decay, has_alpha=True,
        bg_white=tr.bg_white, H=batch["H"], W=batch["W"],
        patch_lpips_fn=tr.patch_lpips_fn, patch_size=tr.patch_size)
    tr.state = st
    return aux["loss"]

timeit(step_prep, n=32, label="train_step + asarray + next_key")

# occupancy update alone
k = jax.random.PRNGKey(3)
timeit(lambda: occ_update(
    tr.state.params, tr.occ_state, k, model_cfg=tr.model_cfg,
    bound=tr.render_cfg.bound, full=False,
    density_scale=tr.render_cfg.density_scale,
    density_thresh=tr.render_cfg.density_thresh).iter_density,
    n=16, label="occ_update (partial)")

# get_batch host cost
t0 = time.time()
for i in range(32):
    ds.get_batch(i % len(ds))
print(f"{'ds.get_batch host':46s} {(time.time() - t0) / 32 * 1e3:9.2f} ms",
      flush=True)
print("done", flush=True)
