"""Headless recolor/style pipeline driver.

TPU-native equivalent of the reference's NeRFGUI.render() per-frame state
machine under --run_all (/root/reference/nerf/gui.py:1930-2106): the
reference sequences styleenc-training -> palette pruning -> dataset
distillation -> NeRF fine-tune -> eval inside GUI frames (even for scripted
runs, scripts/run_llff.sh:57); here the same phases run as a plain driver
with the reference's artifact dumps (hparams.json, opt.json, edit/grow
grids, palettes, timings.json, palette_eval.json, results_psnr_train.json).
"""

import dataclasses
import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

try:
    import imageio.v2 as imageio
except ImportError:  # pragma: no cover
    import imageio

from ..editing.distill import distill_dataset
from ..editing.edit_dataset import EditDataset
from ..editing.editgrid import EditGrid
from ..editing.laenerf import LAENeRFConfig, laenerf_init
from ..editing.style import StyleNetwork
from ..editing.style_trainer import LAENeRFTrainer, StyleLossWeights
from ..models.renderer import render_rays_distill
from ..data.rays import get_rays
from ..train.checkpoints import load_pytree, save_pytree
from ..utils.timers import PhaseTimer
from ..utils.video import write_video


@dataclasses.dataclass
class PipelineConfig:
    """Editing-pipeline knobs (CLI surface: main_nerf.py:80-129)."""

    mode: str = "recolor"  # recolor | style
    train_steps_style: int = 3000
    train_steps_distill: int = 3000
    distill_palette_steps: int = 1500
    num_palette_bases: int = 4
    style_image: Optional[str] = None
    style_layers: Sequence[int] = (10, 12, 14)
    crop_size: int = 256
    preserve_color: bool = False
    depth_diff: float = 0.5
    use_error_maps: bool = False
    no_bg: bool = False
    blend_thresh: float = 0.5
    weights: StyleLossWeights = dataclasses.field(default_factory=StyleLossWeights)
    # user palette edits (applied at distillation, gui.py:438-445)
    palette_mod: Optional[np.ndarray] = None
    palette_weights: Optional[np.ndarray] = None
    palette_biases: Optional[np.ndarray] = None
    # editing-encoder table size: lg18 halves the 16-level table the style
    # step's backward scatters into (~2x faster gathers on v5e for small
    # tables, docs/PERF.md microbench) at a small capacity cost
    style_lg: int = 19
    # recolorable-stylization reload (gui.py:165-180)
    style_enc_path: Optional[str] = None
    palette_path: Optional[str] = None
    load_edit_dataset: Optional[str] = None


def project_points(trainer, pose, intrinsics, pixels_xy, H, W):
    """Click -> 3D: ray-termination points for the given pixel coords.

    Equivalent of Trainer.project_points (nerf/utils.py:1178-1226), which
    renders the view and reads x_term at the clicked pixels. Uses the
    distill path (absolute-depth x_term) with an empty edit grid.
    """
    pixels_xy = np.asarray(pixels_xy).reshape(-1, 2)
    inds = (pixels_xy[:, 1] * W + pixels_xy[:, 0]).astype(np.int32)
    rays_o, rays_d = get_rays(jnp.asarray(pose), jnp.asarray(intrinsics),
                              jnp.asarray(inds), H, W)
    empty = jnp.zeros_like(trainer.occ_state.occupancy)
    out = render_rays_distill(
        trainer.state.ema_params, trainer.occ_state.occupancy, empty,
        rays_o, rays_d, jax.random.PRNGKey(0),
        model_cfg=trainer.model_cfg, render_cfg=trainer.render_cfg,
    )
    return np.asarray(out["x_term"])


class EditPipeline:
    """Runs phases B-E of the recolor/style workflow on a trained NeRF."""

    def __init__(self, trainer, dataset, cfg: PipelineConfig, workspace: str,
                 edit_grid: EditGrid, grow_grid: Optional[EditGrid] = None,
                 seed: int = 0):
        self.trainer = trainer
        self.dataset = dataset
        self.cfg = cfg
        self.workspace = workspace
        os.makedirs(workspace, exist_ok=True)
        self.edit_grid = edit_grid
        self.grow_grid = grow_grid
        self.timer = PhaseTimer()
        self.seed = seed
        self.style_trainer: Optional[LAENeRFTrainer] = None
        self.edit_dataset: Optional[EditDataset] = None
        self.original_palette = None

        self.laenerf_cfg = LAENeRFConfig(
            bound=trainer.model_cfg.bound,
            num_palette_bases=cfg.num_palette_bases,
            log2_hashmap_size=cfg.style_lg,
        )

    # -- phase B: init (gui.py:222-325) ---------------------------------

    def init_phase(self):
        cfg = self.cfg
        self.timer.start("edit_dataset")
        if cfg.load_edit_dataset and os.path.exists(cfg.load_edit_dataset):
            self.edit_dataset = EditDataset.load(cfg.load_edit_dataset)
        else:
            self.edit_dataset = EditDataset(
                self.trainer, self.dataset, self.edit_grid.grid,
                None if self.grow_grid is None else self.grow_grid.grid,
                depth_diff=cfg.depth_diff,
                smooth_transition=cfg.weights.smooth_trans_weight > 0,
                out_dir=os.path.join(self.workspace, "styleenc_train_dataset"),
            )
            self.edit_dataset.save(os.path.join(self.workspace, "edataset.npz"))
        self.timer.stop("edit_dataset")

        style_network = None
        if cfg.weights.style_weight > 0:
            img = np.asarray(imageio.imread(cfg.style_image),
                             np.float32) / 255.0
            img = np.moveaxis(img[..., :3], -1, 0)  # [3, H, W]
            imageio.imwrite(
                os.path.join(self.workspace, "style_image.png"),
                (np.moveaxis(img, 0, -1) * 255).astype(np.uint8),
            )
            style_network = StyleNetwork(
                img, style_layers=cfg.style_layers, size=cfg.crop_size,
                preserve_color=cfg.preserve_color,
            )
            if cfg.preserve_color:
                # color-match the style image to the region's GT colors
                # (utils.py:976-977 uses the first edit batch's targets)
                target = self.edit_dataset.get_batch(0, jitter=False)
                n = target["n_valid"]
                style_network.set_color_target(
                    target["targets"][:n].T[:, :, None]
                )

        self.style_trainer = LAENeRFTrainer(
            self.laenerf_cfg, cfg.weights, self.edit_dataset,
            style_network=style_network, seed=self.seed,
            crop_size=cfg.crop_size,
        )

        # recolorable-stylization reload (gui.py:165-180, 2050-2051)
        if cfg.style_enc_path and os.path.exists(cfg.style_enc_path):
            like = {"params": self.style_trainer.params,
                    "active": self.style_trainer.active}
            tree, meta = load_pytree(cfg.style_enc_path, like)
            # honor the table layout the weights were trained under
            # (pre-meta checkpoints predate octo_gather and default to the
            # then-default paired f32 layout)
            saved = {"paired_gather": bool(meta.get("paired_gather", True)),
                     "octo_gather": bool(meta.get("octo_gather", False)),
                     "gather_dtype": str(meta.get("gather_dtype", "f32"))}
            if any(getattr(self.laenerf_cfg, k) != v
                   for k, v in saved.items()):
                self.laenerf_cfg = dataclasses.replace(
                    self.laenerf_cfg, **saved)
                self.style_trainer.set_config(self.laenerf_cfg)
            self.style_trainer.params = tree["params"]
            self.style_trainer.active = tree["active"]
            self.original_palette = np.asarray(tree["params"]["palette"])
            if cfg.palette_path and os.path.exists(cfg.palette_path):
                pal = np.load(cfg.palette_path)["palette"]
                self.style_trainer.params["palette"] = jnp.asarray(pal)

        # artifacts (gui.py:260-325)
        self.edit_grid.save(os.path.join(self.workspace, "edit_grid.npz"))
        if self.grow_grid is not None and self.grow_grid.grid is not None:
            self.grow_grid.save(os.path.join(self.workspace, "grow_grid.npz"))
        with open(os.path.join(self.workspace, "hparams.json"), "w") as f:
            json.dump({
                "palette_losses": {
                    "weight_loss_uniform": cfg.weights.weight_loss_uniform,
                    "weight_loss_non_uniform": cfg.weights.weight_loss_non_uniform,
                    "offset_loss": cfg.weights.offset_loss,
                    "palette_loss_valid": cfg.weights.palette_loss_valid,
                    "palette_loss_distinct": cfg.weights.palette_loss_distinct,
                    "num_palette_bases": cfg.num_palette_bases,
                },
                "style_losses": {
                    "style_image": cfg.style_image,
                    "style_weight": cfg.weights.style_weight,
                    "style_layers": list(cfg.style_layers),
                    "tv_weight": cfg.weights.tv_weight,
                    "depth_disc_weight": cfg.weights.depth_disc_weight,
                    "tv_depth_guide": cfg.weights.tv_depth_guide,
                    "smooth_trans_weight": cfg.weights.smooth_trans_weight,
                    "train_steps_style": cfg.train_steps_style,
                    "train_steps_distill": cfg.train_steps_distill,
                    "preserve_color": cfg.preserve_color,
                    "warmup_iterations": cfg.weights.warmup_iterations,
                    # degraded-mode marker: random VGG filters were used for
                    # the Gram losses (no local pretrained npz found)
                    "vgg_pretrained": bool(style_network.pretrained)
                    if style_network is not None else None,
                },
            }, f, indent=2)
        with open(os.path.join(self.workspace, "opt.json"), "w") as f:
            json.dump({k: str(v) for k, v in dataclasses.asdict(cfg).items()},
                      f, indent=2)

    # -- phase C: LAENeRF training (gui.py:1995-2030) --------------------

    def train_laenerf_phase(self, log_every: int = 500, log_fn=print):
        cfg = self.cfg
        self.timer.start("train_style_enc")
        if cfg.style_enc_path:
            self.timer.stop("train_style_enc")
            return  # reloaded: skip training (gui.py:165-180)
        st = self.style_trainer
        prune_at = cfg.train_steps_style - cfg.distill_palette_steps
        done = 0
        while done < cfg.train_steps_style:
            chunk = min(log_every, cfg.train_steps_style - done)
            if done < prune_at < done + chunk:
                chunk = prune_at - done
            mse = st.train_steps(chunk)
            done += chunk
            log_fn(f"[laenerf] step {done}/{cfg.train_steps_style} "
                   f"mse={mse:.5f} psnr={-10 * np.log10(max(mse, 1e-9)):.2f}")
            if done == prune_at and cfg.distill_palette_steps > 0:
                active = st.prune()
                log_fn(f"[laenerf] pruned palette -> "
                       f"{int(active.sum())}/{cfg.num_palette_bases} active")
        self.timer.stop("train_style_enc")
        # persist (gui.py:2050-2051, 1963-1967)
        self.original_palette = np.asarray(st.params["palette"])
        # the table layout (paired_gather additive-x hash vs xor fast_hash)
        # must travel with the weights: reloading under the other layout
        # silently decodes garbage features (ADVICE r2)
        save_pytree(os.path.join(self.workspace, "style_enc.npz"),
                    {"params": st.params, "active": st.active},
                    meta={"paired_gather": self.laenerf_cfg.paired_gather,
                          "octo_gather": self.laenerf_cfg.octo_gather,
                          "gather_dtype": self.laenerf_cfg.gather_dtype})
        np.savez(os.path.join(self.workspace, "palet_og.npz"),
                 palette=self.original_palette,
                 active=np.asarray(st.active))

    # -- phase D: distillation (gui.py:357-541) --------------------------

    def distill_phase(self, log_fn=print):
        cfg = self.cfg
        st = self.style_trainer
        self.timer.start("distill_dataset")
        palet_og = (self.original_palette if self.original_palette is not None
                    else np.asarray(st.params["palette"]))
        palet_mod = (cfg.palette_mod if cfg.palette_mod is not None
                     else np.asarray(st.params["palette"]))
        stats = distill_dataset(
            self.dataset, self.edit_dataset, st.params, self.laenerf_cfg,
            st.active, palet_og, palet_mod,
            palet_weights=cfg.palette_weights,
            palet_biases=cfg.palette_biases,
            blend_thresh=cfg.blend_thresh,
            smooth_transition=cfg.weights.smooth_trans_weight > 0,
            no_bg=cfg.no_bg, use_error_maps=cfg.use_error_maps,
            out_dir=self.workspace, save_train_dataset=True,
        )
        np.savez(os.path.join(self.workspace, "palet_mod.npz"),
                 palette=palet_mod, active=np.asarray(st.active))
        self.timer.stop("distill_dataset")
        log_fn(f"[distill] {stats}")
        return stats

    # -- phase E: NeRF fine-tune (gui.py:200-202 + train loop) ------------

    def finetune_phase(self, log_fn=print):
        cfg = self.cfg
        self.timer.start("distill_nerf")
        tr = self.trainer
        depth_sup = cfg.weights.style_weight > 0
        has_alpha = self.dataset.images.shape[-1] == 4
        steps = 0
        while steps < cfg.train_steps_distill:
            for idx in self.dataset.epoch_indices():
                if steps >= cfg.train_steps_distill:
                    break
                batch = self.dataset.get_batch(int(idx))
                aux = tr.train_one_batch_distill(batch, has_alpha,
                                                 depth_sup=depth_sup)
                steps += 1
                if steps % 500 == 0:
                    loss = float(aux["loss"])
                    log_fn(f"[finetune] step {steps}/"
                           f"{cfg.train_steps_distill} loss={loss:.5f}")
        self.timer.stop("distill_nerf")
        tr.save_checkpoint()

    # -- phase F: eval + artifacts (gui.py:1941-1984) ---------------------

    def render_edit_mask(self, pose, intrinsics, H, W, thresh=0.5,
                         chunk=32768):
        """Project the edit grid into a view: mask = fraction of ray weight
        that terminates inside the region (the per-view analogue of the
        reference's w8s_edit > 0.5 blend test, gui.py:459-467)."""
        tr = self.trainer
        r = tr.render_distill_frame(self.edit_grid.grid, pose, intrinsics,
                                    H, W, chunk=chunk)
        frac = (r["weights_edit"]
                / np.maximum(r["weights"], 1e-6)).reshape(H, W)
        return (frac > thresh).astype(np.float32)

    def eval_phase(self, val_dataset=None, test_dataset=None,
                   video_dataset=None, log_fn=print):
        tr = self.trainer
        results = {}
        # train-set PSNR after distillation, over the FULL train split like
        # the reference (gui.py:839-847)
        psnrs = []
        for i in range(len(self.dataset)):
            img, _ = tr.render_image(self.dataset.poses[i],
                                     self.dataset.intrinsics,
                                     self.dataset.H, self.dataset.W)
            gt = self.dataset.images[i]
            if gt.shape[-1] == 4:
                gt = gt[..., :3] * gt[..., 3:] + (1 - gt[..., 3:])
            psnrs.append(float(-10 * np.log10(
                max(np.mean((img - gt) ** 2), 1e-10))))
        results["psnr_train"] = float(np.mean(psnrs))
        with open(os.path.join(self.workspace, "results_psnr_train.json"),
                  "w") as f:
            json.dump(results, f, indent=2)

        for name, ds in (("val", val_dataset), ("test", test_dataset)):
            if ds is None:
                continue
            out_dir = os.path.join(self.workspace, f"render_{name}")
            mask_dir = os.path.join(self.workspace, "masks", name)
            os.makedirs(out_dir, exist_ok=True)
            os.makedirs(mask_dir, exist_ok=True)
            for i in range(len(ds)):
                img, depth = tr.render_image(ds.poses[i], ds.intrinsics,
                                             ds.H, ds.W)
                imageio.imwrite(
                    os.path.join(out_dir, f"{i:03d}.png"),
                    (np.clip(img, 0, 1) * 255).astype(np.uint8),
                )
                # edit-region mask in the ICE-NeRF G-channel convention so
                # scripts/eval/mse_background.py consumes these directly
                # via --masks_root (the reference ships hand-made masks;
                # here they are projected from the edit grid)
                mask = self.render_edit_mask(ds.poses[i], ds.intrinsics,
                                             ds.H, ds.W)
                mimg = np.zeros(mask.shape + (3,), np.uint8)
                mimg[..., 1] = (mask * 255).astype(np.uint8)
                imageio.imwrite(os.path.join(mask_dir, f"{i:03d}.png"), mimg)
        if video_dataset is not None:
            frames = []
            for i in range(len(video_dataset)):
                img, _ = tr.render_image(video_dataset.poses[i],
                                         video_dataset.intrinsics,
                                         video_dataset.H, video_dataset.W)
                frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
            write_video(os.path.join(self.workspace, "video.mp4"), frames)
        # timings of record (the r5 renderer has a single march path — the
        # r2-r4 fast-path portfolio was deleted after losing every on-TPU
        # A/B, so there is no fallback state to export anymore)
        timings = self.timer.summary()
        with open(os.path.join(self.workspace, "timings.json"), "w") as f:
            json.dump(timings, f, indent=2)
        log_fn(f"[eval] {results} timings={self.timer.summary()}")
        return results

    # ---------------------------------------------------------------------

    def run_all(self, val_dataset=None, test_dataset=None,
                video_dataset=None, log_fn=print):
        """The full --run_all sequence (gui.py:1930-2106)."""
        self.init_phase()
        self.train_laenerf_phase(log_fn=log_fn)
        self.distill_phase(log_fn=log_fn)
        self.finetune_phase(log_fn=log_fn)
        return self.eval_phase(val_dataset, test_dataset, video_dataset,
                               log_fn=log_fn)


def run_npr_pipeline(trainer, dataset, ref_npr_config: str, workspace: str,
                     weights: StyleLossWeights, train_steps_style: int = 3000,
                     train_steps_distill: int = 3000,
                     num_palette_bases: int = 4, reg_max_dist: float = 2e-2,
                     tv_min_dist: float = 10e-2, min_tv_factor: float = 0.1,
                     cos_loss_factor: float = 2.5, mse_loss: float = 6.0,
                     color_patch_loss: float = 30.0, feature_size: int = 256,
                     num_rays: int = 4096, log_fn=print, seed: int = 0):
    """Single-view reference NPR stylization (--ref_npr_config path,
    gui.py:181-185): register the stylized reference view, train LAENeRF on
    NPR targets, bake supervision images, and fine-tune the NeRF with
    train_step_npr."""
    from ..editing.laenerf import LAENeRFConfig
    from ..editing.npr_dataset import SingleViewEditDataset
    from ..editing.npr_trainer import (NPRTrainer, build_npr_nerf_dataset)
    from ..editing.semantic import SemanticEncoder

    os.makedirs(workspace, exist_ok=True)
    timer = PhaseTimer()
    sem = SemanticEncoder()
    timer.start("edit_dataset")
    npr_ds = SingleViewEditDataset(
        trainer, dataset, ref_npr_config, sem, min_dist=reg_max_dist,
        max_dist=tv_min_dist, min_tv_factor=min_tv_factor,
        feature_size=feature_size,
        out_dir=os.path.join(workspace, "styleenc_train_dataset"), seed=seed,
    )
    timer.stop("edit_dataset")

    # the NPR LAENeRF has no direction encoding (gui.py:253:
    # dir_encoding=None when train_styleenc_npr)
    lcfg = LAENeRFConfig(bound=trainer.model_cfg.bound,
                         num_palette_bases=num_palette_bases, dir_degree=0)
    npr_tr = NPRTrainer(lcfg, weights, npr_ds, sem, mse_loss_w=mse_loss,
                        cos_loss_w=cos_loss_factor,
                        color_patch_w=color_patch_loss, seed=seed)
    timer.start("train_style_enc")
    done = 0
    while done < train_steps_style:
        chunk = min(500, train_steps_style - done)
        mse = npr_tr.train_steps(chunk)
        done += chunk
        log_fn(f"[npr] step {done}/{train_steps_style} mse={mse:.5f}")
    timer.stop("train_style_enc")
    save_pytree(os.path.join(workspace, "style_enc.npz"),
                {"params": npr_tr.params, "active": npr_tr.active},
                meta={"paired_gather": lcfg.paired_gather,
                      "octo_gather": lcfg.octo_gather,
                      "gather_dtype": lcfg.gather_dtype})

    timer.start("distill_dataset")
    npr_views = build_npr_nerf_dataset(
        npr_ds, npr_tr.params, lcfg, npr_tr.active, dataset,
        out_dir=os.path.join(workspace, "nerf_retrain_dataset"),
    )
    timer.stop("distill_dataset")

    timer.start("distill_nerf")
    rng = np.random.RandomState(seed)
    for step in range(train_steps_distill):
        view = npr_views[rng.randint(len(npr_views))]
        aux = trainer.train_one_batch_npr(dataset, view, num_rays=num_rays)
        if (step + 1) % 500 == 0:
            log_fn(f"[npr finetune] {step + 1}/{train_steps_distill} "
                   f"loss={float(aux['loss']):.5f}")
    timer.stop("distill_nerf")
    trainer.save_checkpoint()
    timer.save(os.path.join(workspace, "timings.json"))
    return npr_tr
