"""Render-path profiling at 800x800 with a cached warm training state.

First run trains to a pruned occupancy grid and caches state under
/tmp/laenerf_warm; later runs reuse it, so render experiments iterate in
seconds instead of re-paying the warmup.

Usage: python -u perf/profile_render.py [--chunk 32768] [--K 32]
       [--factor 2] [--runs 2]
"""

import argparse
import os
import sys
import time

parser = argparse.ArgumentParser()
parser.add_argument("--chunk", type=int, default=32768)
parser.add_argument("--K", type=int, default=32)
parser.add_argument("--Km", type=int, default=0,
                    help="march events per round (0 = RenderConfig default)")
parser.add_argument("--factor", type=int, default=2)
parser.add_argument("--runs", type=int, default=2)
parser.add_argument("--stats", action="store_true")
parser.add_argument("--trace", type=str, default=None,
                    help="capture an xplane trace of the timed renders to "
                         "this dir (parse with perf/parse_xplane.py)")
args = parser.parse_args()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from laenerf_tpu.data import NeRFDataset, generate_synthetic_scene
from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.train import Trainer
from laenerf_tpu.utils import enable_compilation_cache

enable_compilation_cache()

# cache dir is layout-suffixed: a checkpoint trained under one gather
# layout decodes garbage under another (ops/hashgrid)
model_cfg = NeRFConfig(bound=1.0, num_levels=8, level_dim=4,
                       log2_hashmap_size=19)
CACHE = "/tmp/laenerf_warm_octo" if model_cfg.octo_gather else "/tmp/laenerf_warm"


def make_render_cfg(**kw):
    base = dict(bound=1.0, cascades=1, grid_size=128, max_steps=256,
                march_iters=256, m_cap_per_ray=16, density_thresh=10.0,
                infer_chunk_events=args.K,
                infer_compact_factor=args.factor)
    if args.Km:
        base["infer_march_events"] = args.Km
    base.update(kw)
    return RenderConfig(**base)


def get_warm_trainer():
    render_cfg = make_render_cfg()
    if not os.path.exists(CACHE + "/scene/transforms_train.json"):
        os.makedirs(CACHE, exist_ok=True)
        generate_synthetic_scene(CACHE + "/scene", n_train=16, n_val=1,
                                 n_test=1, H=100, W=100)
    ds = NeRFDataset(CACHE + "/scene", "train", num_rays=4096)
    tr = Trainer(CACHE + "/ws", model_cfg, render_cfg, lr=1e-2, iters=2000,
                 eval_chunk=args.chunk)
    occ_path = CACHE + "/occ.npz"
    if os.path.exists(occ_path) and tr.ckpt.latest() is not None:
        tr.load_checkpoint("latest")
        import dataclasses

        d = np.load(occ_path)
        tr.occ_state = dataclasses.replace(
            tr.occ_state, occupancy=jnp.asarray(d["occupancy"]),
            density_grid=jnp.asarray(d["density_grid"]),
            iter_density=jnp.asarray(d["iter_density"]))
        print(f"# loaded warm state (occ "
              f"{float(jnp.mean(tr.occ_state.occupancy)):.4f})", flush=True)
    else:
        tr.mark_untrained(ds)
        step = 0
        while step < 1536:
            tr.train_one_batch(ds.get_batch(step % len(ds)), has_alpha=True)
            step += 1
            if step % 256 == 0:
                occ = float(jnp.mean(tr.occ_state.occupancy))
                print(f"# warm {step}: occ {occ:.3f}", flush=True)
                if occ < 0.05 and step >= 768:
                    break
        jax.block_until_ready(tr.state.params)
        tr.save_checkpoint()
        np.savez(occ_path,
                 occupancy=np.asarray(tr.occ_state.occupancy),
                 density_grid=np.asarray(tr.occ_state.density_grid),
                 iter_density=np.asarray(tr.occ_state.iter_density))
    return tr, ds


tr, ds = get_warm_trainer()

H = W = 800
intr = ds.intrinsics * (H / ds.H)
intr[2], intr[3] = W / 2, H / 2

if args.stats:
    os.environ["LAENERF_RENDER_STATS"] = "1"

if os.environ.get("LAENERF_TRAINPATH_RENDER"):
    # experiment: render through the train path (single march scan + one
    # compacted eval + one composite; no transmittance-driven eval skip)
    from laenerf_tpu.data.rays import pixel_rays
    from laenerf_tpu.models.renderer import render_rays_train

    def render_image_trainpath(pose, intrinsics, H, W):
        params = tr.state.ema_params
        rays_o, rays_d = pixel_rays(jnp.asarray(pose),
                                    jnp.asarray(intrinsics), H, W)
        n = H * W
        chunk = args.chunk
        imgs = []
        key = jax.random.PRNGKey(0)
        for s in range(0, n, chunk):
            out = render_rays_train(
                params, tr.occ_state.occupancy, rays_o[s:s + chunk],
                rays_d[s:s + chunk], key, model_cfg=tr.model_cfg,
                render_cfg=tr.render_cfg, bg_color=1.0, perturb=False)
            imgs.append(out["image"])
        return np.asarray(jnp.concatenate(imgs)[:n]).reshape(H, W, 3)

    tr.render_image = lambda pose, intr, H, W, **kw: (
        render_image_trainpath(pose, intr, H, W), None)

t0 = time.time()
img, _ = tr.render_image(ds.poses[0], intr, H, W)
print(f"# first render (compile): {time.time() - t0:.1f}s", flush=True)

if args.runs > 0:
    if args.trace:
        jax.profiler.start_trace(args.trace)
    t0 = time.time()
    for i in range(args.runs):
        img, _ = tr.render_image(ds.poses[i % len(ds)], intr, H, W)
    dt = (time.time() - t0) / args.runs
    if args.trace:
        jax.profiler.stop_trace()
    print(f"render {H}x{W}: {dt * 1e3:.0f} ms/frame = "
          f"{H * W / dt / 1e3:.0f}k rays/s "
          f"(chunk={args.chunk} K={args.K} factor={args.factor})", flush=True)
    print(f"img mean {img.mean():.3f} std {img.std():.3f}", flush=True)

if os.environ.get("LAENERF_STUB_EVAL"):
    # diagnostic: render with the network eval stubbed to constants —
    # measures the march + composite + while-loop floor alone
    from functools import partial
    from laenerf_tpu.models.renderer import (RenderConfig as _RC,
                                             near_far_from_aabb)
    from laenerf_tpu.ops.raymarch import build_skip_field, make_march_event
    from laenerf_tpu.ops.composite import composite_chunk
    from laenerf_tpu.data.rays import pixel_rays

    @partial(jax.jit, static_argnames=("render_cfg",))
    def stub_infer(occupancy, rays_o, rays_d, *, render_cfg):
        N = rays_o.shape[0]
        cfg = render_cfg.march_cfg
        K = render_cfg.infer_chunk_events
        aabb = jnp.array([-cfg.bound] * 3 + [cfg.bound] * 3, jnp.float32)
        nears, fars = near_far_from_aabb(rays_o, rays_d, aabb,
                                         render_cfg.min_near)
        skip_flat = build_skip_field(occupancy, bound=cfg.bound).reshape(-1)
        event = make_march_event(rays_o, rays_d, skip_flat, None, cfg)

        def march_round(t):
            def step(tc, _):
                t_next, (ts_s, dt_s, occ, _) = event(tc)
                done = tc >= fars
                return jnp.where(done, tc, t_next), (ts_s, dt_s, occ & ~done)
            t_new, (ts, dt, occ) = jax.lax.scan(step, t, None, length=K)
            return t_new, ts.T, dt.T, occ.T

        init = {"t": nears, "acc": {"T": jnp.ones((N,)), "ws": jnp.zeros((N,)),
                "depth": jnp.zeros((N,)), "rgb": jnp.zeros((N, 3))},
                "round": jnp.zeros((), jnp.int32)}
        max_rounds = cfg.max_steps // K

        def cond(c):
            alive = (c["acc"]["T"] >= render_cfg.t_thresh) & (c["t"] < fars)
            return jnp.any(alive) & (c["round"] < max_rounds)

        def body(c):
            t_new, ts, dt, valid = march_round(c["t"])
            sig = jnp.where(valid, 40.0, 0.0)  # constant sigma: opaque-ish
            rgb = jnp.full((N, K, 3), 0.5)
            acc = composite_chunk(c["acc"], sig, rgb, dt, ts, valid, nears,
                                  render_cfg.t_thresh)
            return {"t": t_new, "acc": acc, "round": c["round"] + 1}

        out = jax.lax.while_loop(cond, body, init)
        return out["acc"]["rgb"], out["round"]

    H = W = 800
    rays_o, rays_d = pixel_rays(jnp.asarray(ds.poses[0]), jnp.asarray(intr),
                                H, W)
    ch = args.chunk
    r, rounds = stub_infer(tr.occ_state.occupancy, rays_o[:ch], rays_d[:ch],
                           render_cfg=tr.render_cfg)
    jax.block_until_ready(r)
    t0 = time.time()
    tot_rounds = 0
    for s in range(0, H * W - ch + 1, ch):
        r, rounds = stub_infer(tr.occ_state.occupancy, rays_o[s:s + ch],
                               rays_d[s:s + ch], render_cfg=tr.render_cfg)
        tot_rounds += int(rounds)
    jax.block_until_ready(r)
    dt_s = time.time() - t0
    print(f"stub-eval render floor: {dt_s * 1e3:.0f} ms/frame "
          f"({tot_rounds} rounds total)", flush=True)
