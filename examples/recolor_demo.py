#!/usr/bin/env python
"""Worked example: train a NeRF on a generated scene, select + grow a 3D
region, recolor it with a user palette, fine-tune, and render results.

Run (CPU smoke: LAENERF_PLATFORM=cpu python examples/recolor_demo.py):
on TPU it uses the real chip and the persistent compile cache.
"""

import os
import sys
import tempfile

if os.environ.get("LAENERF_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["LAENERF_PLATFORM"])

import numpy as np

from laenerf_tpu.data import NeRFDataset, generate_synthetic_scene
from laenerf_tpu.editing import EditGrid, StyleLossWeights
from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.pipeline import EditPipeline, PipelineConfig, project_points
from laenerf_tpu.train import Trainer
from laenerf_tpu.utils import enable_compilation_cache


def main(out_dir=None, train_steps=400, style_steps=150, distill_steps=100):
    enable_compilation_cache()
    out_dir = out_dir or tempfile.mkdtemp(prefix="laenerf_demo_")
    print(f"[demo] workspace: {out_dir}")

    # 1. a miniature scene (stand-in for nerf_synthetic/lego)
    scene = os.path.join(out_dir, "scene")
    generate_synthetic_scene(scene, n_train=12, n_val=1, n_test=2, H=64, W=64)
    ds = NeRFDataset(scene, "train", num_rays=1024)

    # 2. train the NeRF
    model_cfg = NeRFConfig(bound=1.0, num_levels=8, level_dim=4,
                           log2_hashmap_size=16, paired_gather=True)
    render_cfg = RenderConfig(bound=1.0, cascades=1, grid_size=64,
                              max_steps=256, march_iters=256,
                              m_cap_per_ray=24, density_thresh=10.0)
    tr = Trainer(os.path.join(out_dir, "ws"), model_cfg, render_cfg,
                 lr=1e-2, iters=train_steps)
    tr.mark_untrained(ds)
    for step in range(train_steps):
        aux = tr.train_one_batch(ds.get_batch(step % len(ds)), has_alpha=True)
        if step % 100 == 0:
            print(f"[demo] nerf step {step} loss {float(aux['loss']):.5f}")

    # 3. select a region: click the image center, grow along density
    pts = project_points(tr, ds.poses[0], ds.intrinsics,
                         [[ds.W // 2, ds.H // 2]], ds.H, ds.W)
    eg = EditGrid(render_cfg.cascades, render_cfg.grid_size)
    eg.new_from_points(pts, bound=1.0)
    density = np.asarray(tr.occ_state.density_grid)
    thresh = min(float(tr.occ_state.mean_density), 0.5)
    eg.grow_region_queue(density, thresh, grow_iterations=200000)
    grow = EditGrid(render_cfg.cascades, render_cfg.grid_size)
    grow.grid_from_growing_queue(eg, density, thresh)
    print(f"[demo] region: {int(eg.grid.sum())} cells")

    # 4. recolor pipeline
    cfg = PipelineConfig(
        mode="recolor", train_steps_style=style_steps,
        train_steps_distill=distill_steps,
        distill_palette_steps=style_steps // 4, num_palette_bases=8,
        depth_diff=0.5,
        weights=StyleLossWeights(offset_loss=5e-5,
                                 weight_loss_non_uniform=1e-7,
                                 palette_loss_valid=1.0,
                                 smooth_trans_weight=1e-3,
                                 warmup_iterations=style_steps // 4),
    )
    pipe = EditPipeline(tr, ds, cfg, os.path.join(out_dir, "edit"), eg, grow)
    pipe.init_phase()
    pipe.train_laenerf_phase(log_every=50)

    # 5. the user edit: rotate palette hues toward blue
    pal = np.asarray(pipe.style_trainer.params["palette"])
    cfg.palette_mod = np.clip(pal[:, [2, 0, 1]], 0, 1)
    pipe.distill_phase()
    pipe.finetune_phase()
    results = pipe.eval_phase(test_dataset=NeRFDataset(scene, "test",
                                                       scale=0.33))
    print(f"[demo] done: {results}; artifacts in {out_dir}/edit")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or [None]))
