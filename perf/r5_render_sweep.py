"""Round-5 render A/B sweep: individual levers vs plain march.

BENCH_r04 rejected every COMBINED candidate (repack+f8+warmup, repack+warmup,
raster+warmup) — but never timed f8, warmup, pair-sampling, or K/chunk
changes in isolation, so we cannot tell whether repack is the loser or the
levers themselves. This sweep times each lever alone against the march
baseline on the warm bench workload (VERDICT r4 #2).

Usage: python perf/r5_render_sweep.py [--frames 3] [--configs a,b,...]
"""

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from warmstate import get_warm_trainer  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--frames", type=int, default=3)
p.add_argument("--configs", type=str, default="")
args = p.parse_args()

tr, ds = get_warm_trainer()
base = tr.render_cfg
print(f"# occ_frac {float(jnp.mean(tr.occ_state.occupancy)):.4f}",
      flush=True)

H = W = 800
intr = ds.intrinsics * (H / ds.H)
intr[2], intr[3] = W / 2, H / 2

# Measured r5 (before the portfolio deletion): march 2912 ms/frame;
# f8 3212 (+10%), warmup 3622 (+24%), f8+warmup 3297, pair 3826 (+31%),
# pair+warmup 4580, K24 3851, K32 3694, Km64 3500, cf2 3559, cf8 3294,
# chunk64k 3561 — every lever LOST to plain march, so the corresponding
# RenderConfig fields were deleted. chunk16k WON (2674, exact parity) and
# became the default eval_chunk. The sweep now covers only the surviving
# knobs.
CONFIGS = {
    "march": {},
    "K24": dict(infer_chunk_events=24, infer_march_events=48),
    "Km64": dict(infer_march_events=64),
    "cf2": dict(infer_compact_factor=2),
    "cf8": dict(infer_compact_factor=8),
    # The round-5 structural levers measured here on 2026-08-20 and then
    # deleted per VERDICT r4 #2 (march 1529.2 ms vs sorted 1675.2, exact
    # parity; pmarch / pmarch+sorted: MosaicError "infer-vector-layout:
    # unsupported shape cast vector<128x128xi32> -> vector<16384x1xi32>"):
    # sorted_eval, infer_pallas_march.
}
CHUNKS = {"chunk32k": 32768, "chunk16k": 16384, "chunk8k": 8192}

picked = (args.configs.split(",") if args.configs
          else list(CONFIGS) + list(CHUNKS))

img_ref = None
results = {}
for name in picked:
    tr.eval_chunk = CHUNKS.get(name, 16384)
    tr.render_cfg = dataclasses.replace(base, **CONFIGS.get(name, {}))
    try:
        t_c = time.time()
        img, _ = tr.render_image(ds.poses[0], intr, H, W)  # compile+warm
        compile_s = time.time() - t_c
        t0 = time.time()
        for i in range(args.frames):
            img2, _ = tr.render_image(ds.poses[i % len(ds)], intr, H, W)
        ms = 1000 * (time.time() - t0) / args.frames
        if name == "march":
            img_ref = img
        mse = (float(np.mean((img - img_ref) ** 2))
               if img_ref is not None else float("nan"))
        results[name] = ms
        print(f"render[{name:12s}] {ms:8.1f} ms/frame  "
              f"mse_vs_march {mse:.2e}  (first-frame {compile_s:.1f}s)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"render[{name:12s}] FAILED: {type(e).__name__}: {e}",
              flush=True)

print("# summary:", {k: round(v, 1) for k, v in results.items()}, flush=True)
