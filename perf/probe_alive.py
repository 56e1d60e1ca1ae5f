"""Quantify wasted march lookups: per-round alive-ray fraction at 800x800.

The inference march scan gathers the skip field for EVERY ray of the chunk
on every scan iteration, alive or not (SIMD). This probe unrolls the
while_loop of render_rays_infer on the warm bench model and reports, per
round and per chunk: alive fraction, valid-sample count, and the implied
wasted-lookup share — the quantity that decides whether per-round ray
repacking (infer_ray_tiers) or a one-shot mid-march repack pays for itself.

Usage: python -u perf/probe_alive.py [--chunk 32768] [--max_chunks 20]
"""

import argparse
import os
import sys

parser = argparse.ArgumentParser()
parser.add_argument("--chunk", type=int, default=32768)
parser.add_argument("--max_chunks", type=int, default=20)
parser.add_argument("--K", type=int, default=16)
parser.add_argument("--Km", type=int, default=32)
args = parser.parse_args()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from warmstate import get_warm_trainer

tr, ds = get_warm_trainer(chunk=args.chunk, K=args.K, Km=args.Km)
from laenerf_tpu.data.rays import pixel_rays, tile_raster_order
from laenerf_tpu.models.renderer import (_eval_compacted, _make_round,
                                         _with_encoder_view)
from laenerf_tpu.ops.composite import composite_chunk
from laenerf_tpu.ops.raymarch import build_skip_field, near_far_from_aabb

H = W = 800
intr = ds.intrinsics * (H / ds.H)
intr[2], intr[3] = W / 2, H / 2

params = _with_encoder_view(tr.state.ema_params, tr.model_cfg)
rcfg = tr.render_cfg
mcfg = rcfg.march_cfg
K, Km = args.K, args.Km

rays_o_all, rays_d_all = pixel_rays(jnp.asarray(ds.poses[0]),
                                    jnp.asarray(intr), H, W)
order, _ = tile_raster_order(H, W)
rays_o_all = jnp.take(rays_o_all, jnp.asarray(order), axis=0)
rays_d_all = jnp.take(rays_d_all, jnp.asarray(order), axis=0)

skip_flat = build_skip_field(tr.occ_state.occupancy,
                             bound=mcfg.bound).reshape(-1)
aabb = jnp.array([-mcfg.bound] * 3 + [mcfg.bound] * 3, jnp.float32)


@jax.jit
def probe_round(rays_o, rays_d, t, fars, T):
    alive = (T >= rcfg.t_thresh) & (t < fars)
    march_round = _make_round(rays_o, rays_d, skip_flat, None, mcfg)
    t_new, ts, dt, valid, _ = march_round(t, fars, alive, K, Km)
    sig, rgb, valid_e, t_new = _eval_compacted(
        params, tr.model_cfg, rcfg, rays_o, rays_d, ts, valid, t_new,
        rays_o.shape[0], K)
    acc = {"T": T, "ws": jnp.zeros_like(T), "depth": jnp.zeros_like(T),
           "rgb": jnp.zeros((T.shape[0], 3), jnp.float32)}
    acc = composite_chunk(acc, sig, rgb, dt, ts, valid_e, t, rcfg.t_thresh)
    return t_new, acc["T"], jnp.sum(alive), jnp.sum(valid_e)


n = H * W
tot_rounds = tot_alive = tot_rays = tot_valid = 0
per_round_alive = []
for s in range(0, min(n, args.max_chunks * args.chunk), args.chunk):
    ro = rays_o_all[s:s + args.chunk]
    rd = rays_d_all[s:s + args.chunk]
    nears, fars = near_far_from_aabb(ro, rd, aabb, rcfg.min_near)
    t = nears
    T = jnp.ones((ro.shape[0],), jnp.float32)
    rounds = []
    for r in range(64):
        t, T, n_alive, n_valid = probe_round(ro, rd, t, fars, T)
        na = int(n_alive)
        if na == 0:
            break
        rounds.append((na, int(n_valid)))
    if rounds:
        tot_rounds += len(rounds)
        tot_rays += len(rounds) * ro.shape[0]
        tot_alive += sum(a for a, _ in rounds)
        tot_valid += sum(v for _, v in rounds)
        per_round_alive.append([a / ro.shape[0] for a, _ in rounds])
    print(f"chunk {s // args.chunk:3d}: rounds {len(rounds):3d} "
          f"alive/round {[round(a / ro.shape[0], 2) for a, _ in rounds]}",
          flush=True)

print(f"\nTOTAL: rounds {tot_rounds}, lookup-slots {tot_rays * Km / 1e6:.0f}M, "
      f"alive-lookups {tot_alive * Km / 1e6:.0f}M "
      f"({100 * tot_alive / max(tot_rays, 1):.0f}% of slots), "
      f"valid samples {tot_valid / 1e6:.1f}M", flush=True)
print("wasted-lookup share (dead rays still gathered): "
      f"{100 * (1 - tot_alive / max(tot_rays, 1)):.0f}%", flush=True)
