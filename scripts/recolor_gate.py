"""Round-2 recolor gate: end-to-end recolor on the trained lego-class NeRF.

Second half of VERDICT r1 item 4: run the full recolor pipeline (region
selection -> LAENeRF training -> distillation -> NeRF fine-tune -> eval)
at the reference budgets on a real 800x800-scale model, recording phase
wall-clock (timings.json) and the background-MSE edit-locality metric via
the exported masks (scripts/eval/mse_background.py).

Region: the blue hollow sphere of the lego-class scene, selected headlessly
by seeding the edit grid with points on its surface (the scripted
equivalent of the reference's click + region-grow, gui.py:562-575,543-553).

Usage (after scripts/quality_gate.py has trained a model):
  python scripts/recolor_gate.py --workspace /tmp/qgate2 \
      [--style_steps 10000 --distill_steps 7000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--workspace", default="/tmp/qgate2")
parser.add_argument("--style_steps", type=int, default=10000)
parser.add_argument("--distill_steps", type=int, default=7000)
parser.add_argument("--palette_steps", type=int, default=1500)
parser.add_argument("--mode", default="recolor", choices=["recolor", "style"])
parser.add_argument("--style_lg", type=int, default=19,
                    help="editing-encoder log2_hashmap_size (18 halves "
                         "the style-step backward table)")
parser.add_argument("--grow_iterations", type=int, default=4000,
                    help="BFS region-growing budget; the density graph is "
                         "connected, so an unbounded grow floods from the "
                         "selected part into the whole object")
# NeRF model shape — must match the checkpoint quality_gate.py trained
# (round 4 moved the gate to the reference's L16 C2 ladder)
parser.add_argument("--num_levels", type=int, default=8)
parser.add_argument("--level_dim", type=int, default=4)
parser.add_argument("--lg", type=int, default=19)
parser.add_argument("--max_steps", type=int, default=512)
args = parser.parse_args()

import jax
import jax.numpy as jnp
import numpy as np

from laenerf_tpu.data import NeRFDataset
from laenerf_tpu.editing import EditGrid, StyleLossWeights
from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.pipeline import EditPipeline, PipelineConfig
from laenerf_tpu.train import Trainer
from laenerf_tpu.utils import enable_compilation_cache

enable_compilation_cache()

ws = args.workspace
scene_dir = os.path.join(ws, "scene")
edit_ws = os.path.join(ws, f"{args.mode}_ws")

model_cfg = NeRFConfig(bound=1.0, num_levels=args.num_levels,
                       level_dim=args.level_dim,
                       log2_hashmap_size=args.lg, paired_gather=True)
render_cfg = RenderConfig(bound=1.0, cascades=1, grid_size=128,
                          max_steps=args.max_steps,
                          march_iters=384 if args.max_steps <= 512 else 512,
                          m_cap_per_ray=32, density_thresh=10.0,
                          infer_chunk_events=16, infer_compact_factor=4)
tr = Trainer(os.path.join(ws, "ws"), model_cfg, render_cfg, lr=1e-2,
             iters=30000, eval_chunk=16384)
assert tr.load_checkpoint("latest"), "train with quality_gate.py first"
train_ds = NeRFDataset(scene_dir, "train", num_rays=4096)
test_ds = NeRFDataset(scene_dir, "test")

t_total = time.time()

# --- region selection: blue shell at blender-world (-0.28, 0.22, 0.4) ------
# the edit grid lives in the ngp model space: (x,y,z) -> (y,z,x)*scale+offset
# (data/provider.py nerf_matrix_to_ngp)
rng = np.random.RandomState(0)
u = rng.randn(200, 3)
u /= np.linalg.norm(u, axis=1, keepdims=True)
pts_world = np.array([-0.28, 0.22, 0.4]) + 0.14 * u  # just inside the shell
pts = pts_world[:, [1, 2, 0]] * train_ds.scale + np.asarray(train_ds.offset)

eg = EditGrid(cascades=render_cfg.cascades, grid_size=render_cfg.grid_size)
eg.new_from_points(jnp.asarray(pts, jnp.float32), bound=1.0)
density = np.asarray(tr.occ_state.density_grid)
thresh = min(float(tr.occ_state.mean_density), 0.01)
eg.grow_region_queue(density, thresh, grow_iterations=args.grow_iterations)
print(f"# edit region: {int(eg.grid.sum())} voxels", flush=True)

grow = EditGrid(render_cfg.cascades, render_cfg.grid_size)
grow.grid_from_growing_queue(eg, density, thresh)

# --- pipeline at reference budgets (run_llff.sh:58-97) ---------------------
if args.mode == "style":
    # procedural wave-pattern style image (the reference ships
    # wave_style.png; zero egress here)
    import imageio.v2 as iio

    yy, xx = np.mgrid[0:256, 0:256] / 256.0
    wave = 0.5 + 0.5 * np.sin(12 * xx + 5 * np.sin(6 * yy))
    style_img = np.stack([wave, 0.4 + 0.5 * wave ** 2,
                          0.9 - 0.6 * wave], -1)
    style_path = os.path.join(ws, "style_image.png")
    iio.imwrite(style_path, (style_img * 255).astype(np.uint8))
    cfg = PipelineConfig(
        mode="style",
        train_steps_style=args.style_steps,
        train_steps_distill=args.distill_steps,
        distill_palette_steps=args.palette_steps,
        num_palette_bases=8,
        depth_diff=0.5,
        style_lg=args.style_lg,
        style_image=style_path, crop_size=256,
        weights=StyleLossWeights(
            offset_loss=5e-5, weight_loss_non_uniform=1e-7,
            palette_loss_valid=1.0, smooth_trans_weight=1e-3,
            tv_weight=1e-4, tv_depth_guide=True, depth_disc_weight=5e-4,
            style_weight=130.0, warmup_iterations=1000,
        ),
    )
else:
    cfg = PipelineConfig(
        mode="recolor",
        train_steps_style=args.style_steps,
        train_steps_distill=args.distill_steps,
        distill_palette_steps=args.palette_steps,
        num_palette_bases=8,
        depth_diff=0.5,
        style_lg=args.style_lg,
        weights=StyleLossWeights(
            offset_loss=1e-4, weight_loss_uniform=1e-5,
            weight_loss_non_uniform=1e-5, palette_loss_valid=1e-4,
            palette_loss_distinct=1e-4, warmup_iterations=1000,
        ),
    )
pipe = EditPipeline(tr, train_ds, cfg, edit_ws, eg, grow)
pipe.init_phase()
print(f"# edit dataset: {len(pipe.edit_dataset)} views", flush=True)
pipe.train_laenerf_phase(log_every=1000)

if args.mode == "recolor":
    # recolor the blue sphere toward red
    pal = np.asarray(pipe.style_trainer.params["palette"])
    cfg.palette_mod = np.clip(pal * np.array([1.8, 0.4, 0.35]), 0, 1)
pipe.distill_phase()
pipe.finetune_phase()
results = pipe.eval_phase(test_dataset=test_ds)
wall = time.time() - t_total

# --- bg-MSE via the exported masks -----------------------------------------
import importlib.util as ilu

spec = ilu.spec_from_file_location(
    "mseb", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "eval", "mse_background.py"))
mseb = ilu.module_from_spec(spec)
spec.loader.exec_module(mseb)
bg = mseb.evaluate(
    results_dir=os.path.join(edit_ws, "render_test"),
    scene=os.path.basename(scene_dir),
    datatype=os.path.basename(os.path.dirname(scene_dir)),
    data_root=os.path.dirname(os.path.dirname(scene_dir)),
    masks_root=os.path.join(edit_ws, "masks", "test"),
    save_dir=os.path.join(edit_ws, "bg_mse"))

summary = {
    "wall_clock_s": round(wall, 1),
    "bg_mse": bg["mean"],
    "psnr_train_after": results.get("psnr_train"),
    "mode": args.mode,
    "style_steps": args.style_steps,
    "distill_steps": args.distill_steps,
    "timings": json.load(open(os.path.join(edit_ws, "timings.json")))
    if os.path.exists(os.path.join(edit_ws, "timings.json")) else None,
}
with open(os.path.join(edit_ws, f"{args.mode}_gate.json"), "w") as f:
    json.dump(summary, f, indent=2)
print(json.dumps(summary), flush=True)
