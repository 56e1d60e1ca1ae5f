"""Command-line entry point.

TPU-native equivalent of the reference's main_nerf.py (the full flag surface,
/root/reference/main_nerf.py:15-266) plus the -m {nerf,recolor,style} modes
that the reference routes through its GUI state machine
(scripts/run_llff.sh:29-97); here recolor/style run the headless pipeline
driver directly.

Usage:
  python -m laenerf_tpu.pipeline.cli <data_path> --workspace ws [flags]
"""

import argparse
import json
import os
import sys

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("laenerf_tpu")
    p.add_argument("path", type=str, help="dataset root (transforms*.json)")
    p.add_argument("-m", "--mode", type=str, default="nerf",
                   choices=["nerf", "recolor", "style"])
    p.add_argument("--test", action="store_true")
    p.add_argument("--workspace", type=str, default="workspace")
    p.add_argument("--seed", type=int, default=0)

    # training (main_nerf.py:24-45)
    p.add_argument("--iters", type=int, default=30000)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--ckpt", type=str, default="latest")
    p.add_argument("--num_rays", type=int, default=4096)
    p.add_argument("--max_steps", type=int, default=1024)
    p.add_argument("--update_extra_interval", type=int, default=16)
    p.add_argument("--max_ray_batch", type=int, default=16384)
    p.add_argument("--patch_size", type=int, default=1)
    p.add_argument("--eval_interval", type=int, default=50)

    # dataset (main_nerf.py:49-66)
    p.add_argument("--color_space", type=str, default="srgb")
    p.add_argument("--preload", action="store_true")
    p.add_argument("--bound", type=float, default=2.0)
    p.add_argument("--scale", type=float, default=0.33)
    p.add_argument("--offset", type=float, nargs="*", default=[0, 0, 0])
    p.add_argument("--dt_gamma", type=float, default=1 / 128)
    p.add_argument("--min_near", type=float, default=0.2)
    p.add_argument("--density_thresh", type=float, default=10)
    p.add_argument("--bg_radius", type=float, default=-1)
    p.add_argument("--downscale", type=int, default=1)
    p.add_argument("--no_bg", action="store_true")
    p.add_argument("--error_map", action="store_true")
    p.add_argument("-O", action="store_true",
                   help="bf16 + occupancy marching (reference: fp16+cuda_ray)")
    p.add_argument("--fp16", action="store_true")
    p.add_argument("--cuda_ray", action="store_true",
                   help="accepted for script compat; marching is always on")
    p.add_argument("--ff", action="store_true",
                   help="accepted for compat; MLPs are always XLA-fused here "
                        "(the reference's ffmlp backbone, network_ff.py)")
    p.add_argument("--tcnn", action="store_true",
                   help="accepted for compat; same as --ff (network_tcnn.py)")

    # TPU-specific shapes
    p.add_argument("--march_iters", type=int, default=None,
                   help="march event budget; default = max_steps so rays always cover [near, far] (see docs/DESIGN.md)")
    p.add_argument("--m_cap_per_ray", type=int, default=32)
    p.add_argument("--infer_chunk_events", type=int, default=16)
    p.add_argument("--eval_chunk", type=int, default=16384)
    p.add_argument("--filter_close_point", action="store_true")

    # editing & stylization (main_nerf.py:80-129)
    p.add_argument("--ablation_dir", type=str, default="ablation_")
    p.add_argument("--ablation_folder", type=str, default="test")
    p.add_argument("--tv_weight", type=float, default=0.0)
    p.add_argument("--depth_disc_weight", type=float, default=0.0)
    p.add_argument("--smooth_trans_weight", type=float, default=0.0)
    p.add_argument("--style_weight", type=float, default=0.0)
    p.add_argument("--style_layers", action="append", type=int)
    p.add_argument("--tv_depth_guide", action="store_true")
    p.add_argument("--intensity_weight", type=float, default=0.0)
    p.add_argument("--preserve_color", action="store_true")
    p.add_argument("--train_steps_style", type=int, default=3000)
    p.add_argument("--train_steps_distill", type=int, default=3000)
    p.add_argument("--style_image", type=str, default=None)
    p.add_argument("--offset_loss", type=float, default=0.0)
    p.add_argument("--weight_loss_non_uniform", type=float, default=0.0)
    p.add_argument("--weight_loss_uniform", type=float, default=0.0)
    p.add_argument("--palette_loss_valid", type=float, default=0.0)
    p.add_argument("--palette_loss_distinct", type=float, default=0.0)
    p.add_argument("--num_palette_bases", type=int, default=4)
    p.add_argument("--distill_palette_steps", type=int, default=1500)
    p.add_argument("--run_all", action="store_true")
    p.add_argument("--gui", action="store_true",
                   help="accepted for script compat; runs headless")
    p.add_argument("--warmup_iterations", type=int, default=1000)
    p.add_argument("--crop_size", type=int, default=256)
    p.add_argument("--style_enc_path", type=str, default=None)
    p.add_argument("--palette_path", type=str, default=None)
    p.add_argument("--depth_diff", type=float, default=0.5)
    p.add_argument("--use_error_maps", action="store_true")
    p.add_argument("--load_edit_dataset", type=str, default=None)
    p.add_argument("--edit_grid_path", type=str, default=None,
                   help="edit_grid.npz from a previous/interactive session")
    p.add_argument("--grow_grid_path", type=str, default=None)
    p.add_argument("--select_pixel", type=int, nargs=2, default=None,
                   help="headless region selection: pixel (x y) in view 0")
    p.add_argument("--grow_iterations", type=int, default=50000)
    p.add_argument("--palette_mod", type=str, default=None,
                   help="npz with 'palette' [K,3]: user-recolored palette")

    # distributed (SURVEY.md §2.3: the reference's DDP equivalent; multi-host
    # DCN is handled by jax.distributed, intra-host by the data mesh)
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (reads coordinator/"
                        "process env vars; run one process per host)")

    # mesh
    p.add_argument("--save_mesh", action="store_true")
    p.add_argument("--mesh_resolution", type=int, default=256)
    p.add_argument("--mesh_threshold", type=float, default=10.0)
    return p


def make_configs(opt):
    import math

    from ..models import NeRFConfig, RenderConfig

    model_cfg = NeRFConfig(bound=opt.bound, bg_radius=opt.bg_radius)
    cascades = 1 + math.ceil(math.log2(max(opt.bound, 1.0)))
    render_cfg = RenderConfig(
        bound=opt.bound, cascades=cascades, grid_size=128,
        dt_gamma=opt.dt_gamma, max_steps=opt.max_steps,
        min_near=opt.min_near, density_thresh=opt.density_thresh,
        march_iters=opt.march_iters or opt.max_steps,
        m_cap_per_ray=opt.m_cap_per_ray,
        infer_chunk_events=opt.infer_chunk_events,
    )
    return model_cfg, render_cfg


def main(argv=None):
    opt = build_parser().parse_args(argv)
    if opt.style_layers is None:
        opt.style_layers = [10, 12, 14]

    # this environment's TPU plugin overrides JAX_PLATFORMS; honor an
    # explicit request (e.g. LAENERF_PLATFORM=cpu for smoke runs)
    if os.environ.get("LAENERF_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["LAENERF_PLATFORM"])

    if opt.multihost:
        # DCN process group for multi-host meshes (the NCCL-DDP analogue,
        # nerf/utils.py:379-383). Coordinator address/process count come
        # from the standard JAX env vars or the cluster plugin.
        import jax

        jax.distributed.initialize()

    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    from ..data import NeRFDataset
    from ..train import Trainer

    model_cfg, render_cfg = make_configs(opt)
    workspace = opt.workspace
    trainer = Trainer(
        workspace, model_cfg, render_cfg, lr=opt.lr, iters=opt.iters,
        update_interval=opt.update_extra_interval, seed=opt.seed,
        eval_chunk=opt.eval_chunk, patch_size=opt.patch_size,
    )

    def load_split(split, required=True):
        try:
            return NeRFDataset(opt.path, split, downscale=opt.downscale,
                               scale=opt.scale, offset=opt.offset,
                               num_rays=opt.num_rays, error_map=opt.error_map,
                               patch_size=opt.patch_size, seed=opt.seed,
                               color_space=opt.color_space)
        except FileNotFoundError:
            if required:
                raise
            return None

    if opt.test:
        trainer.load_checkpoint(opt.ckpt)
        test_ds = load_split("test")
        out_dir = os.path.join(workspace, "results")
        os.makedirs(out_dir, exist_ok=True)
        import imageio.v2 as imageio

        frames = []
        for i in range(len(test_ds)):
            img, depth = trainer.render_image(test_ds.poses[i],
                                              test_ds.intrinsics,
                                              test_ds.H, test_ds.W)
            arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            imageio.imwrite(os.path.join(out_dir, f"{i:04d}.png"), arr)
            frames.append(arr)
        from ..utils.video import write_video

        write_video(os.path.join(out_dir, "video.mp4"), frames)
        if test_ds.has_gt:
            trainer.evaluate(test_ds)
        if opt.save_mesh:
            from ..utils.mesh import save_density_mesh

            save_density_mesh(trainer, os.path.join(workspace, "mesh.ply"),
                              resolution=opt.mesh_resolution,
                              threshold=opt.mesh_threshold)
        return

    train_ds = load_split("train")
    val_ds = load_split("val", required=False)

    if opt.mode == "nerf":
        trainer.load_checkpoint(opt.ckpt)
        trainer.train(train_ds, max_steps=opt.iters, valid_dataset=val_ds,
                      eval_interval=opt.eval_interval)
        if val_ds is not None:
            trainer.evaluate(val_ds)
        if opt.save_mesh:
            from ..utils.mesh import save_density_mesh

            save_density_mesh(trainer, os.path.join(workspace, "mesh.ply"),
                              resolution=opt.mesh_resolution,
                              threshold=opt.mesh_threshold)
        return

    # ---- recolor / style: the run_all pipeline ------------------------
    from ..editing import EditGrid, StyleLossWeights
    from .driver import EditPipeline, PipelineConfig, project_points

    if not trainer.load_checkpoint(opt.ckpt):
        print("[cli] no NeRF checkpoint found; training first")
        trainer.train(train_ds, max_steps=opt.iters)

    edit_ws = os.path.join(opt.ablation_dir, opt.ablation_folder)
    os.makedirs(edit_ws, exist_ok=True)

    # region selection: load saved grids or build from a pixel click
    if opt.edit_grid_path:
        eg = EditGrid.load(opt.edit_grid_path)
    else:
        px = opt.select_pixel or [train_ds.W // 2, train_ds.H // 2]
        pts = project_points(trainer, train_ds.poses[0], train_ds.intrinsics,
                             [px], train_ds.H, train_ds.W)
        eg = EditGrid(render_cfg.cascades, render_cfg.grid_size)
        eg.new_from_points(pts, bound=opt.bound)
        density = np.asarray(trainer.occ_state.density_grid)
        thresh = min(float(trainer.occ_state.mean_density),
                     opt.density_thresh)
        eg.grow_region_queue(density, thresh,
                             grow_iterations=opt.grow_iterations)
    grow = None
    if opt.grow_grid_path:
        grow = EditGrid.load(opt.grow_grid_path)
    elif opt.smooth_trans_weight > 0:
        density = np.asarray(trainer.occ_state.density_grid)
        thresh = min(float(trainer.occ_state.mean_density),
                     opt.density_thresh)
        grow = EditGrid(render_cfg.cascades, render_cfg.grid_size)
        grow.grid_from_growing_queue(eg, density, thresh)

    weights = StyleLossWeights(
        tv_weight=opt.tv_weight, depth_disc_weight=opt.depth_disc_weight,
        smooth_trans_weight=opt.smooth_trans_weight,
        style_weight=opt.style_weight if opt.mode == "style" else 0.0,
        intensity_weight=opt.intensity_weight, offset_loss=opt.offset_loss,
        weight_loss_non_uniform=opt.weight_loss_non_uniform,
        weight_loss_uniform=opt.weight_loss_uniform,
        palette_loss_valid=opt.palette_loss_valid,
        palette_loss_distinct=opt.palette_loss_distinct,
        tv_depth_guide=opt.tv_depth_guide,
        warmup_iterations=opt.warmup_iterations,
    )
    pal_mod = None
    if opt.palette_mod:
        pal_mod = np.load(opt.palette_mod)["palette"]
    pcfg = PipelineConfig(
        mode=opt.mode, train_steps_style=opt.train_steps_style,
        train_steps_distill=opt.train_steps_distill,
        distill_palette_steps=opt.distill_palette_steps,
        num_palette_bases=opt.num_palette_bases,
        style_image=opt.style_image, style_layers=tuple(opt.style_layers),
        crop_size=opt.crop_size, preserve_color=opt.preserve_color,
        depth_diff=opt.depth_diff, use_error_maps=opt.use_error_maps,
        no_bg=opt.no_bg, weights=weights, palette_mod=pal_mod,
        style_enc_path=opt.style_enc_path, palette_path=opt.palette_path,
        load_edit_dataset=opt.load_edit_dataset,
    )
    pipe = EditPipeline(trainer, train_ds, pcfg, edit_ws, eg, grow,
                        seed=opt.seed)
    test_ds = load_split("test", required=False)
    video_ds = load_split("video", required=False) or test_ds
    results = pipe.run_all(val_dataset=val_ds, test_dataset=test_ds,
                           video_dataset=video_ds)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
