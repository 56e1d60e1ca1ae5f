#!/usr/bin/env python
"""Render an orbit video from a trained workspace and (optionally) run the
view-consistency metrics on it — the artifact the reference's
scripts/eval/consistency_metrics.py protocol consumes (README.md:131-140).

Usage:
  python scripts/eval/render_orbit.py --workspace /tmp/qgate \
      [--frames 30] [--H 400] [--step 1 --step 7] [--out_dir .../frames]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

parser = argparse.ArgumentParser()
parser.add_argument("--workspace", required=True,
                    help="quality_gate-style workspace (scene/ + ws/)")
parser.add_argument("--frames", type=int, default=30)
parser.add_argument("--H", type=int, default=400)
parser.add_argument("--arc", type=float, default=0.6,
                    help="orbit arc in radians across all frames (small ->"
                         " adjacent frames overlap, as a video does)")
parser.add_argument("--step", type=int, action="append", default=None,
                    help="consistency step(s); default [1, 7]")
parser.add_argument("--out_dir", default=None)
parser.add_argument("--save_json", default=None)
parser.add_argument("--num_levels", type=int, default=8)
parser.add_argument("--level_dim", type=int, default=4)
parser.add_argument("--log2_hashmap_size", type=int, default=19)
parser.add_argument("--max_steps", type=int, default=512)
args = parser.parse_args()

import numpy as np

try:
    import imageio.v2 as imageio
except ImportError:
    import imageio

from laenerf_tpu.data import NeRFDataset
from laenerf_tpu.data.provider import _slerp
from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.train import Trainer
from laenerf_tpu.utils import enable_compilation_cache

enable_compilation_cache()

model_cfg = NeRFConfig(bound=1.0, num_levels=args.num_levels,
                       level_dim=args.level_dim,
                       log2_hashmap_size=args.log2_hashmap_size)
render_cfg = RenderConfig(bound=1.0, cascades=1, grid_size=128,
                          max_steps=args.max_steps, march_iters=384,
                          m_cap_per_ray=32, density_thresh=10.0,
                          infer_chunk_events=16, infer_compact_factor=4)
tr = Trainer(os.path.join(args.workspace, "ws"), model_cfg, render_cfg,
             lr=1e-2, iters=30000, eval_chunk=16384)
assert tr.load_checkpoint("latest"), "no checkpoint in workspace"

H = W = args.H
# camera path: slerp between consecutive TRAIN poses, so every frame is in
# the dataset's (ngp-converted) camera convention and scale — the same
# protocol as the provider's video split (data/provider.py:124-137)
train_ds = NeRFDataset(os.path.join(args.workspace, "scene"), "train")
intr = train_ds.intrinsics * (H / train_ds.H)
intr[2], intr[3] = W / 2, H / 2
span = max(2, int(round(args.arc / (2 * np.pi) * len(train_ds))))
anchors = [train_ds.poses[i % len(train_ds)] for i in range(span + 1)]

out_dir = args.out_dir or os.path.join(args.workspace, "orbit_frames")
os.makedirs(out_dir, exist_ok=True)
for k in range(args.frames):
    x = (k / max(args.frames - 1, 1)) * span
    i, frac = int(min(x, span - 1e-6)), x - int(min(x, span - 1e-6))
    p0, p1 = np.asarray(anchors[i]), np.asarray(anchors[i + 1])
    pose = p0.copy()
    pose[:3, :3] = _slerp(p0[:3, :3], p1[:3, :3], frac)
    pose[:3, 3] = (1 - frac) * p0[:3, 3] + frac * p1[:3, 3]
    img, _ = tr.render_image(pose, intr, H, W)
    imageio.imwrite(os.path.join(out_dir, f"f_{k:04d}.png"),
                    (np.clip(img, 0, 1) * 255).astype(np.uint8))
    print(f"# frame {k + 1}/{args.frames}", flush=True)

import importlib.util

spec = importlib.util.spec_from_file_location(
    "cm", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "consistency_metrics.py"))
cm = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cm)

results = {"frames": args.frames, "H": H, "arc": args.arc}
for step in (args.step or [1, 7]):
    r = cm.evaluate(out_dir, step=step)
    results[f"step_{step}"] = r
if args.save_json:
    with open(args.save_json, "w") as f:
        json.dump(results, f, indent=2)
print(json.dumps(results))
