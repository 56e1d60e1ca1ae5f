"""Benchmark: rays/sec rendering 800x800 + train iters/sec on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Protocol (BASELINE.md): the reference publishes no numbers; the north-star
is 800x800 render rays/sec and distill/train iters/sec vs a CUDA A100
running torch-ngp. We use 1.3e7 rays/s as the A100 reference estimate for
vs_baseline (instant-ngp-class renderers do 800x800 in ~50ms).

The bench trains a NeRF briefly on a procedural scene (so the occupancy
grid is realistically sparse), then times full-image renders and train
steps.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

A100_RAYS_PER_SEC_ESTIMATE = 1.3e7


def main():
    import jax
    import jax.numpy as jnp

    from laenerf_tpu.data import NeRFDataset, generate_synthetic_scene
    from laenerf_tpu.models import NeRFConfig, RenderConfig
    from laenerf_tpu.train import Trainer
    from laenerf_tpu.utils import (compile_cache_stats,
                                   enable_compilation_cache)

    enable_compilation_cache()
    cache0 = compile_cache_stats()

    t_setup = time.time()
    tmp = tempfile.mkdtemp(prefix="laenerf_bench_")
    # 4 test views: the quality floor averages them (VERDICT r4 #8 — a
    # single extrapolated view has ±8.7 dB seed spread, perf/gap_probe.py)
    generate_synthetic_scene(tmp, n_train=16, n_val=1, n_test=4, H=100, W=100)
    ds = NeRFDataset(tmp, "train", num_rays=4096)

    # max_steps=256 keeps dt coarse enough that the march budget covers the
    # whole [near, far] range, which is what lets the occupancy grid prune
    # (see docs/DESIGN.md); octo_gather+bf16 defaults fetch each cell's 8
    # corners as one bf16 row (ops/hashgrid).
    model_cfg = NeRFConfig(bound=1.0, num_levels=8, level_dim=4,
                           log2_hashmap_size=19)
    # ONE render path: the r5 sweep (perf/r5_render_sweep.py) measured the
    # whole r2-r4 fast-path portfolio slower than the plain event-scan
    # march at 800^2, so those configs were deleted — the bench compiles a
    # single render graph, which also keeps setup_s and cache misses down
    # (VERDICT r4 #6).
    # The round-5 structural levers (sorted_eval, Pallas march round) were
    # A/B'd on silicon and deleted: sorted lost 9.5% end-to-end (gathers
    # are latency-bound per row, order-insensitive) and Mosaic cannot
    # lower the march kernel's shape cast (docs/PERF.md round 5).
    render_cfg = RenderConfig(bound=1.0, cascades=1, grid_size=128,
                              max_steps=256, march_iters=256,
                              m_cap_per_ray=16, density_thresh=10.0,
                              infer_chunk_events=16, infer_compact_factor=4)
    # eval_chunk 16384: the r5 chunk sweep (perf/r5_render_sweep.py) found
    # 16k chunks ~8-27% faster than 32k at 800^2 (smaller chunks retire
    # sooner, so dead rays pay fewer march-scan gathers); 8k/4k lose to
    # per-chunk dispatch overhead
    tr = Trainer(tmp + "/ws", model_cfg, render_cfg, lr=1e-2, iters=2000,
                 eval_chunk=16384)
    tr.mark_untrained(ds)

    # warm up for a FIXED number of steps so the occupancy steady state
    # is reproducible across rounds (VERDICT r3: the old early-exit on
    # occ_frac < 0.035 landed at 0.0112 in r2 vs 0.0206 in r3, making
    # ms/frame incomparable). A fixed budget means occ_frac varies only
    # with code changes — which is exactly what the bench should see.
    # 1536, not 1024: the r5 occupancy-update redesign (stratified 2x2x2
    # sweep, full grid coverage every 8 updates instead of 12x
    # oversampling per update) reaches the pruned steady state later —
    # at step 1024 the grid is mid-prune (occ 0.187) where r4's update
    # landed at 0.021. By 1280-1536 the r5 grid is at its steady state
    # (~0.008, TIGHTER than r4). Still a fixed budget for reproducibility.
    warm_steps = 1536
    for step in range(warm_steps):
        tr.train_one_batch(ds.get_batch(step % len(ds)), has_alpha=True)
        if (step + 1) % 256 == 0:
            occ_frac = float(jnp.mean(tr.occ_state.occupancy))
            print(f"# warm {step + 1}: occ_frac {occ_frac:.3f}",
                  file=sys.stderr, flush=True)
    jax.block_until_ready(tr.state.params)
    occ_frac = float(jnp.mean(tr.occ_state.occupancy))
    c = compile_cache_stats()
    print(f"# xla-cache after warmup: {c[0]} entries "
          f"(+{c[0] - cache0[0]} compiled this run)", file=sys.stderr,
          flush=True)

    # --- train iters/sec ---
    n_train_iters = 50
    batches = [ds.get_batch(i % len(ds)) for i in range(n_train_iters)]
    t0 = time.time()
    for b in batches:
        tr.train_one_batch(b, has_alpha=True)
    jax.block_until_ready(tr.state.params)
    train_iters_per_sec = n_train_iters / (time.time() - t0)

    # --- render rays/sec at 800x800 ---
    H = W = 800
    # scale intrinsics from the dataset's 100x100
    intr = ds.intrinsics * (H / ds.H)
    intr[2], intr[3] = W / 2, H / 2
    n_renders = 4

    # compile-warm then time n_renders frames
    tr.render_image(ds.poses[0], intr, H, W)
    t0 = time.time()
    for i in range(n_renders):
        tr.render_image(ds.poses[i % len(ds)], intr, H, W)
    sec_march = (time.time() - t0) / n_renders
    print(f"# render[march]: {1000 * sec_march:.1f} ms/frame",
          file=sys.stderr, flush=True)
    ms_modes = {"march": round(1000 * sec_march, 1)}
    dt = sec_march
    rays_per_sec = H * W / dt

    # quality sanity: dataset-resolution renders vs GT (train + held-out)
    def view_psnr(split_ds, i):
        img, _ = tr.render_image(split_ds.poses[i], split_ds.intrinsics,
                                 split_ds.H, split_ds.W)
        gt = split_ds.images[i]
        gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])
        return float(-10 * np.log10(max(np.mean((img - gt) ** 2), 1e-10)))

    psnr = view_psnr(ds, 0)
    test_ds = NeRFDataset(tmp, "test")
    test_psnr = float(np.mean([view_psnr(test_ds, i)
                               for i in range(len(test_ds.poses))]))
    val_ds = NeRFDataset(tmp, "val")
    val_psnr = view_psnr(val_ds, 0)

    # quality regression floor: healthy steady-state values measured at the
    # fixed 1024-step warm-up (BENCH_r04: train 35.9 / val 30.6) minus
    # 1.5 dB each, so a 2 dB quality drop FAILS the bench. test_psnr now
    # averages 4 held-out views because a single extrapolated view has
    # ±8.7 dB seed spread (perf/gap_probe.py); its floor starts at the r4
    # single-view healthy value (21.2) minus 1.5 dB and is re-calibrated to
    # 4-view-mean-healthy − 1.5 once measured. The train/test gap itself is
    # few-view overfit, not an eval-path bug (docs/PERF.md).
    quality_ok = bool(psnr >= 34.4 and val_psnr >= 29.1
                      and test_psnr >= 19.7)

    result = {
        "metric": "render_rays_per_sec_800x800",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / A100_RAYS_PER_SEC_ESTIMATE, 3),
        "train_iters_per_sec": round(train_iters_per_sec, 2),
        "render_ms_per_frame": round(1000 * dt, 1),
        "render_ms_march": round(1000 * sec_march, 1),
        "render_ms_modes": ms_modes,
        "train_psnr": round(psnr, 2),
        "test_psnr": round(test_psnr, 2),
        "val_psnr": round(val_psnr, 2),
        "quality_ok": quality_ok,
        "occ_frac": round(occ_frac, 4),
        "warm_steps": warm_steps,
        "setup_s": round(time.time() - t_setup, 1),
        "xla_cache_misses": compile_cache_stats()[0] - cache0[0],
        "render_modes": ["march"],
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
