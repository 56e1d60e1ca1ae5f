"""Training engine.

TPU-native equivalent of the reference Trainer
(/root/reference/nerf/utils.py:332-1753): Adam(0.9, 0.99, eps=1e-15) with the
LambdaLR decay to 0.1*lr at the last step (main_nerf.py:223-240), EMA(0.95)
of parameters, per-pixel random background compositing for RGBA targets,
error-map EMA updates, periodic occupancy-grid refresh (full for the first
16 updates, partial after — every 16 steps), evaluation with PSNR/SSIM,
and rolling checkpoints.

Design: all device work is in three jitted functions — train_step,
occ_update, render_eval — with explicit state pytrees. bf16 matmuls replace
the reference's fp16 AMP + GradScaler (bf16 needs no loss scaling). The
mesh hook in parallel/ shards rays across devices for data parallelism.
"""

import dataclasses
import os
import time
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map

from ..data.rays import get_rays, pixel_rays, tile_raster_order
from ..models.nerf import NeRFConfig, nerf_density, nerf_init
from ..models.occupancy import (OccupancyState, mark_untrained_grid,
                                occupancy_init, update_occupancy)
from ..models.renderer import RenderConfig, render_rays_infer, render_rays_train
from .checkpoints import CheckpointManager, load_pytree, save_pytree
from .metrics import psnr_meter, ssim_meter


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jax.Array


@partial(jax.jit, static_argnames=("bound",))
def _skip_flat_jit(occupancy, *, bound: float):
    """Per-frame flat skip field (ops/raymarch.build_skip_field)."""
    from ..ops.raymarch import build_skip_field

    return build_skip_field(occupancy, bound=bound).reshape(-1)


@jax.jit
def _take_tree(tree, ids):
    """Gather rows ids from every leaf (phased-inference repacking)."""
    return jax.tree.map(lambda a: jnp.take(a, ids, axis=0), tree)


@jax.jit
def _put_tree(tree, ids, new):
    """Scatter updated rows back (phased-inference repacking)."""
    return jax.tree.map(lambda a, b: a.at[ids].set(b), tree, new)


def make_optimizer(lr: float, iters: int):
    """Adam + LambdaLR 0.1**(step/iters) (main_nerf.py:223-240).

    LAENERF_FLAT_OPT=1 wraps adam in optax.flatten (one flat update
    vector). The microbench motivation (narrow-lane elementwise passes on
    the [T, 4] table run ~5x slower than flat, docs/PERF.md r5) did NOT
    survive the end-to-end A/B: the flatten concat/split traffic costs
    more than the lane tax saves (92 -> 109 ms/step on the warm bench
    state, perf/r5_train_probe.py flat0 vs flat1 logs), and the flat
    layout added enough temp pressure to OOM the L16C2 gate compile.
    Default OFF; kept as an opt-in for future toolchains."""
    schedule = lambda step: lr * (0.1 ** jnp.minimum(step / iters, 1.0))
    opt = optax.adam(learning_rate=schedule, b1=0.9, b2=0.99, eps=1e-15)
    if os.environ.get("LAENERF_FLAT_OPT", "0") == "1":
        opt = optax.flatten(opt)
    return opt


@partial(jax.jit, static_argnames=("model_cfg", "render_cfg", "optimizer",
                                   "ema_decay", "has_alpha", "bg_white",
                                   "H", "W", "distill", "patch_lpips_fn",
                                   "patch_size", "mesh"),
         donate_argnames=("state",))
def train_step(state: TrainState, occupancy, pose, intrinsics, inds, pixels,
               key, *, model_cfg: NeRFConfig, render_cfg: RenderConfig,
               optimizer, ema_decay: float, has_alpha: bool, bg_white: bool,
               H: int, W: int, distill: bool = False, depth_target=None,
               depth_weight: float = 1e-3, patch_lpips_fn=None,
               patch_size: int = 1, mesh=None):
    """One optimization step (utils.py:535-642).

    Args:
      pixels: [N, 3|4] ground-truth pixels.
      has_alpha: static; True when pixels have an alpha channel.
      bg_white: static; force white bg instead of per-pixel random.
      distill: static; fine-tune mode — depth is left un-normalized and an
        optional depth supervision term is added (utils.py:586-589,634-635).
      mesh: optional jax.sharding.Mesh with a "data" axis. When given, the
        loss/gradient computation is shard_mapped over it: each device runs
        the render + backward (including the Pallas scatter-add, which GSPMD
        cannot partition on its own) on its ray shard, and gradients are
        pmean'd across the axis — the explicit analogue of DDP's NCCL
        all-reduce (nerf/utils.py:379-383).
    Returns:
      (new_state, aux) where aux has loss and per-ray errors.
    """
    k_bg, k_render, k_next = jax.random.split(key, 3)
    rays_o, rays_d = get_rays(pose, intrinsics, inds, H, W)

    if has_alpha and not bg_white:
        bg = jax.random.uniform(k_bg, (inds.shape[0], 3))
    else:
        bg = jnp.ones((inds.shape[0], 3))
    if has_alpha:
        gt = pixels[:, :3] * pixels[:, 3:] + bg * (1.0 - pixels[:, 3:])
    else:
        gt = pixels[:, :3]

    def loss_fn(params, occupancy, rays_o, rays_d, gt, bg, depth_target,
                k_render):
        out = render_rays_train(params, occupancy, rays_o, rays_d, k_render,
                                model_cfg=model_cfg, render_cfg=render_cfg,
                                bg_color=bg, perturb=True)
        per_ray = jnp.mean((out["image"] - gt) ** 2, axis=-1)
        # capacity-truncated rays composite their evaluated prefix (the
        # reference's buffer-overflow behavior, raymarching.py:198-203), so
        # the plain MSE over all rays matches utils.py:563-585
        loss = jnp.mean(per_ray)
        if distill and depth_target is not None:
            dw = (depth_target > 0).astype(jnp.float32)
            dloss = jnp.mean(
                ((out["depth"] - (depth_target - out["nears"])) * dw) ** 2
            )
            loss = loss + depth_weight * dloss
        if patch_lpips_fn is not None and patch_size > 1:
            # patch-mode perceptual loss, 1e-3 weighted (utils.py:595-603).
            # The provider samples num_rays/patch_size^2 *independent*
            # patches at random screen locations, so the perceptual
            # distance runs per patch ([-1, ps, ps, 3] like the reference),
            # never across unrelated patch boundaries.
            ps = patch_size
            pred_p = out["image"].reshape(-1, ps, ps, 3)
            gt_p = gt.reshape(-1, ps, ps, 3)
            ploss = jnp.mean(jax.vmap(patch_lpips_fn)(pred_p, gt_p))
            loss = loss + 1e-3 * ploss
        return loss, (per_ray, out)

    if mesh is None:
        (loss, (per_ray, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, occupancy, rays_o, rays_d, gt, bg, depth_target,
          k_render)
        n_samples = out["n_samples"]
    else:
        from jax.sharding import PartitionSpec as P

        has_dt = depth_target is not None

        def sharded_grads(params, occupancy, rays_o, rays_d, gt, bg, dt,
                          key):
            # decorrelate march perturbation across shards
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
            (loss, (per_ray, out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, occupancy, rays_o, rays_d, gt, bg,
              dt if has_dt else None, key)
            # equal shard sizes: the global mean-loss gradient is the mean
            # of per-shard gradients (DDP all-reduce semantics)
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            return loss, per_ray, out["n_samples"], grads

        dt = depth_target if has_dt else jnp.zeros_like(rays_o[:, 0])
        # check_vma=False: pallas_call outputs don't declare varying-mesh
        # annotations, and the scatter kernel runs inside the backward here
        loss, per_ray, n_samples, grads = shard_map(
            sharded_grads, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"),
                      P("data"), P()),
            out_specs=(P(), P("data"), P("data"), P()),
            check_vma=False,
        )(state.params, occupancy, rays_o, rays_d, gt, bg, dt, k_render)

    updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_ema = jax.tree.map(
        lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
        state.ema_params, new_params,
    )
    new_state = TrainState(
        params=new_params, opt_state=new_opt_state, ema_params=new_ema,
        step=state.step + 1,
    )
    aux = {"loss": loss, "per_ray_error": per_ray, "n_samples": n_samples}
    return new_state, aux


@partial(jax.jit, static_argnames=("model_cfg", "render_cfg", "optimizer",
                                   "ema_decay", "H", "W", "style_weight_d",
                                   "depth_weight_d"),
         donate_argnames=("state",))
def train_step_npr(state: TrainState, occupancy, pose, intrinsics, inds,
                   target, style_img, target_weights, depth_target,
                   depth_weights, key, *, model_cfg: NeRFConfig,
                   render_cfg: RenderConfig, optimizer, ema_decay: float,
                   H: int, W: int, style_weight_d: float = 0.5,
                   depth_weight_d: float = 1e-3):
    """NPR fine-tune step (utils.py:487-533): weighted MSE toward the
    registration image + (1 - w/2)-weighted MSE toward the stylized image +
    masked depth supervision. target/style_img are RGBA rows for the
    sampled pixels."""
    k_bg, k_render, _ = jax.random.split(key, 3)
    rays_o, rays_d = get_rays(pose, intrinsics, inds, H, W)
    bg = jax.random.uniform(k_bg, (inds.shape[0], 3))
    gt_rgb = target[:, :3] * target[:, 3:] + bg * (1.0 - target[:, 3:])
    gt_style = style_img[:, :3] * style_img[:, 3:] + bg * (1.0 - style_img[:, 3:])
    w = target_weights[:, None]

    def loss_fn(params):
        out = render_rays_train(params, occupancy, rays_o, rays_d, k_render,
                                model_cfg=model_cfg, render_cfg=render_cfg,
                                bg_color=bg, perturb=True)
        pred = out["image"]
        loss = jnp.mean((w * (pred - gt_rgb)) ** 2)
        loss = loss + style_weight_d * jnp.mean(
            ((1.0 - w / 2.0) * (gt_style - pred)) ** 2
        )
        dloss = jnp.mean(
            (depth_weights * (out["depth"] - (depth_target - out["nears"])))
            ** 2
        )
        loss = loss + depth_weight_d * dloss
        return loss, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_ema = jax.tree.map(
        lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
        state.ema_params, new_params,
    )
    return TrainState(params=new_params, opt_state=new_opt_state,
                      ema_params=new_ema, step=state.step + 1), {"loss": loss}


@partial(jax.jit, static_argnames=("model_cfg", "render_cfg", "optimizer",
                                   "ema_decay", "H", "W"),
         donate_argnames=("state",))
def train_step_clip(state: TrainState, occupancy, clip_params, text_z,
                    pose, intrinsics, key, *, model_cfg: NeRFConfig,
                    render_cfg: RenderConfig, optimizer, ema_decay: float,
                    H: int, W: int):
    """CLIP-guided step (utils.py:543-557): render ALL rays of a low-res
    random-pose frame through the differentiable training path (white bg,
    like the reference's force_all_rays render) and minimize
    -(CLIP image embedding . text embedding). The CLIP vision tower
    (models/clip_vit.py) is frozen — gradients flow only into NeRF params,
    matching clip_utils.py:18-20's requires_grad=False."""
    from ..models.clip_vit import clip_similarity_loss

    k_render, _ = jax.random.split(key)
    inds = jnp.arange(H * W, dtype=jnp.int32)
    rays_o, rays_d = get_rays(pose, intrinsics, inds, H, W)

    def loss_fn(params):
        out = render_rays_train(params, occupancy, rays_o, rays_d,
                                k_render, model_cfg=model_cfg,
                                render_cfg=render_cfg, bg_color=None,
                                perturb=True)
        img = out["image"].reshape(1, H, W, 3)
        return clip_similarity_loss(clip_params, img, text_z)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_ema = jax.tree.map(
        lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
        state.ema_params, new_params,
    )
    return TrainState(params=new_params, opt_state=new_opt_state,
                      ema_params=new_ema, step=state.step + 1), {"loss": loss}


@partial(jax.jit, static_argnames=("model_cfg", "bound", "full",
                                   "density_scale", "density_thresh"))
def occ_update(params, occ_state: OccupancyState, key, *,
               model_cfg: NeRFConfig, bound: float, full: bool,
               density_scale: float = 1.0, density_thresh: float = 0.01):
    fn = lambda x: nerf_density(params, model_cfg, x)["sigma"]
    return update_occupancy(occ_state, fn, key, bound=bound, full=full,
                            density_scale=density_scale,
                            density_thresh=density_thresh)


class Trainer:
    """Host-side training orchestration (epoch loops, eval, checkpoints)."""

    def __init__(self, workspace: str, model_cfg: NeRFConfig,
                 render_cfg: RenderConfig, lr: float = 1e-2,
                 iters: int = 30000, ema_decay: float = 0.95,
                 update_interval: int = 16, bg_white: bool = False,
                 eval_chunk: int = 16384, seed: int = 0, name: str = "ngp",
                 max_keep_ckpt: int = 2, patch_size: int = 1):
        self.workspace = workspace
        os.makedirs(workspace, exist_ok=True)
        self.model_cfg = model_cfg
        self.render_cfg = render_cfg
        self.iters = iters
        self.ema_decay = ema_decay
        self.update_interval = update_interval
        self.bg_white = bg_white
        self.eval_chunk = eval_chunk

        self.key = jax.random.PRNGKey(seed)
        self.key, init_key = jax.random.split(self.key)
        params = nerf_init(init_key, model_cfg)
        self.optimizer = make_optimizer(lr, iters)
        self.state = TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            # a fresh copy: train_step donates the state, and params/ema
            # aliasing the same buffers would be a double donation
            ema_params=jax.tree.map(jnp.array, params),
            step=jnp.zeros((), jnp.int32),
        )
        self.occ_state = occupancy_init(render_cfg.cascades,
                                        render_cfg.grid_size)
        self.ckpt = CheckpointManager(workspace, name=name,
                                      max_keep=max_keep_ckpt)
        self.log_path = os.path.join(workspace, "log.txt")
        self.global_step = 0
        self.stats = {"loss": [], "psnr": []}
        # patch-mode perceptual loss (utils.py:595-603): active only when
        # rays are sampled as patches AND local VGG weights exist; degrades
        # to None otherwise (vgg.py docstring)
        self.patch_size = patch_size
        self.patch_lpips_fn = None
        if patch_size > 1:
            try:
                from ..editing.vgg import lpips_fn

                self.patch_lpips_fn = lpips_fn()
            except Exception:
                self.log("[warn] patch LPIPS loss disabled "
                         "(no local VGG16 weights)")
        # tensorboard scalars (the reference logs train/eval via tensorboardX,
        # utils.py:747-748,1492-1494)
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(os.path.join(workspace, "run"))
        except Exception:
            self.writer = None

    def log_scalar(self, tag, value, step=None):
        if self.writer is not None:
            self.writer.add_scalar(tag, value,
                                   self.global_step if step is None else step)

    # ------------------------------------------------------------------

    def log(self, msg):
        print(msg)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # ------------------------------------------------------------------

    def mark_untrained(self, dataset):
        grid = mark_untrained_grid(
            self.occ_state.density_grid, jnp.asarray(dataset.poses),
            tuple(float(v) for v in dataset.intrinsics),
            bound=self.render_cfg.bound, cascades=self.render_cfg.cascades,
            grid_size=self.render_cfg.grid_size,
            min_near=self.render_cfg.min_near,
        )
        self.occ_state = dataclasses.replace(self.occ_state,
                                             density_grid=grid)

    def maybe_update_occupancy(self):
        if self.global_step % self.update_interval != 0:
            return
        full = int(self.occ_state.iter_density) < 16
        self.occ_state = occ_update(
            self.state.params, self.occ_state, self._next_key(),
            model_cfg=self.model_cfg, bound=self.render_cfg.bound, full=full,
            density_scale=self.render_cfg.density_scale,
            density_thresh=self.render_cfg.density_thresh,
        )

    def train_one_batch(self, batch, has_alpha: bool):
        self.maybe_update_occupancy()
        self.state, aux = train_step(
            self.state, self.occ_state.occupancy,
            jnp.asarray(batch["pose"]), jnp.asarray(batch["intrinsics"]),
            jnp.asarray(batch["inds"]), jnp.asarray(batch["pixels"]),
            self._next_key(), model_cfg=self.model_cfg,
            render_cfg=self.render_cfg, optimizer=self.optimizer,
            ema_decay=self.ema_decay, has_alpha=has_alpha,
            bg_white=self.bg_white, H=batch["H"], W=batch["W"],
            patch_lpips_fn=self.patch_lpips_fn, patch_size=self.patch_size,
        )
        self.global_step += 1
        return aux

    def train_one_batch_distill(self, batch, has_alpha: bool,
                                depth_sup: bool = False):
        """Fine-tune step on distilled images (utils.py:535-642 with
        distill=True; depth supervision when stylizing, gui.py:200-202)."""
        self.maybe_update_occupancy()
        depth_target = None
        if depth_sup and "depth" in batch:
            depth_target = jnp.asarray(batch["depth"])
        self.state, aux = train_step(
            self.state, self.occ_state.occupancy,
            jnp.asarray(batch["pose"]), jnp.asarray(batch["intrinsics"]),
            jnp.asarray(batch["inds"]), jnp.asarray(batch["pixels"]),
            self._next_key(), model_cfg=self.model_cfg,
            render_cfg=self.render_cfg, optimizer=self.optimizer,
            ema_decay=self.ema_decay, has_alpha=has_alpha,
            bg_white=self.bg_white, H=batch["H"], W=batch["W"],
            distill=True, depth_target=depth_target,
            patch_lpips_fn=self.patch_lpips_fn, patch_size=self.patch_size,
        )
        self.global_step += 1
        return aux

    def train_one_batch_clip(self, clip_params, text_z, pose, intrinsics,
                             H: int, W: int):
        """One CLIP-guided step on a (typically rand_poses-sampled) camera
        with no GT image (utils.py:543-557). clip_params comes from
        models/clip_vit.load_clip_vision(); text_z is the fixed text
        embedding (train/clip_guidance.py text_embedding, or any [512])."""
        self.maybe_update_occupancy()
        self.state, aux = train_step_clip(
            self.state, self.occ_state.occupancy, clip_params,
            jnp.asarray(text_z), jnp.asarray(pose), jnp.asarray(intrinsics),
            self._next_key(), model_cfg=self.model_cfg,
            render_cfg=self.render_cfg, optimizer=self.optimizer,
            ema_decay=self.ema_decay, H=H, W=W,
        )
        self.global_step += 1
        return aux

    def train_one_batch_npr(self, dataset, npr_view, num_rays: int = 4096):
        """One NPR fine-tune step on a baked supervision view
        (utils.py:487-533 + single_view_edit_dataset.py:415-445)."""
        self.maybe_update_occupancy()
        H, W = dataset.H, dataset.W
        idx = npr_view["view_index"]
        inds = np.random.randint(0, H * W, num_rays).astype(np.int32)
        self.state, aux = train_step_npr(
            self.state, self.occ_state.occupancy,
            jnp.asarray(dataset.poses[idx]), jnp.asarray(dataset.intrinsics),
            jnp.asarray(inds),
            jnp.asarray(npr_view["target"].reshape(-1, 4)[inds]),
            jnp.asarray(npr_view["style_img"].reshape(-1, 4)[inds]),
            jnp.asarray(npr_view["target_weights"].reshape(-1)[inds]),
            jnp.asarray(npr_view["depth"].reshape(-1)[inds]),
            jnp.asarray(npr_view["depth_weights"].reshape(-1)[inds]),
            self._next_key(), model_cfg=self.model_cfg,
            render_cfg=self.render_cfg, optimizer=self.optimizer,
            ema_decay=self.ema_decay, H=H, W=W,
        )
        self.global_step += 1
        return aux

    def train(self, dataset, max_steps: Optional[int] = None,
              valid_dataset=None, eval_interval: int = 0, log_every: int = 100):
        """Full training loop over the dataset (utils.py:746-770)."""
        max_steps = max_steps or self.iters
        has_alpha = dataset.images.shape[-1] == 4
        self.mark_untrained(dataset)
        t_start = time.time()
        epoch = 0
        while self.global_step < max_steps:
            epoch += 1
            for idx in dataset.epoch_indices():
                if self.global_step >= max_steps:
                    break
                batch = dataset.get_batch(int(idx))
                aux = self.train_one_batch(batch, has_alpha)
                if "inds_coarse" in batch:
                    dataset.update_error_map(
                        int(idx), batch["inds_coarse"],
                        np.asarray(aux["per_ray_error"]),
                    )
                if self.global_step % log_every == 0:
                    loss = float(aux["loss"])
                    self.stats["loss"].append(loss)
                    self.log_scalar("train/loss", loss)
                    self.log(
                        f"step {self.global_step}/{max_steps} "
                        f"loss={loss:.6f} "
                        f"psnr={-10 * np.log10(max(loss, 1e-12)):.2f} "
                        f"samples/ray={float(jnp.mean(aux['n_samples'])):.1f} "
                        f"({time.time() - t_start:.1f}s)"
                    )
            # evaluate every eval_interval epochs (the reference's
            # self.epoch % self.eval_interval gate, utils.py:764-766) —
            # NOT every epoch, or the CLI default (50) triggers hundreds of
            # full-validation renders per run
            if (eval_interval and valid_dataset is not None
                    and epoch % eval_interval == 0):
                self.evaluate(valid_dataset)
        self.save_checkpoint()

    # ------------------------------------------------------------------

    def render_image(self, pose, intrinsics, H: int, W: int, bg_color=1.0,
                     use_ema: bool = True):
        """Render a full image with the inference path, chunked over rays."""
        params = self.state.ema_params if use_ema else self.state.params
        spec = self.model_cfg.grid_spec
        if spec.octo_gather:
            # build the octo gather view ONCE per frame; every chunk's
            # render_rays_infer call then skips the rebuild (ops/hashgrid)
            from ..ops.hashgrid import octo_view_jit
            params = dict(params,
                          encoder_view=octo_view_jit(
                              params["encoder"], spec=spec))
        # per-frame skip field: the chebyshev dilation passes over the full
        # grid run once here instead of inside every chunk's jit
        from ..models.renderer import build_march_tables
        skip_flat = build_march_tables(self.occ_state.occupancy,
                                       render_cfg=self.render_cfg)
        rays_o, rays_d = pixel_rays(jnp.asarray(pose),
                                    jnp.asarray(intrinsics), H, W)
        n = H * W
        chunk = self.eval_chunk
        # chunk in spatial-tile order so whole chunks retire early (see
        # tile_raster_order); undone after concatenation
        order, inv = tile_raster_order(H, W)
        rays_o = jnp.take(rays_o, jnp.asarray(order), axis=0)
        rays_d = jnp.take(rays_d, jnp.asarray(order), axis=0)
        imgs, depths = [], []
        pad = (-n) % chunk
        if pad:
            rays_o = jnp.concatenate([rays_o, rays_o[:pad]], axis=0)
            rays_d = jnp.concatenate([rays_d, rays_d[:pad]], axis=0)
        stats = os.environ.get("LAENERF_RENDER_STATS")
        # dispatch every chunk asynchronously (device arrays only) and fetch
        # once at the end — a per-chunk np.asarray would insert a ~30 ms
        # tunnel round-trip bubble between chunks (the XLA analogue of the
        # reference's stream pipelining)
        for s in range(0, n + pad, chunk):
            t0 = time.time()
            out = render_rays_infer(
                params, self.occ_state.occupancy,
                rays_o[s:s + chunk], rays_d[s:s + chunk], self._next_key(),
                model_cfg=self.model_cfg, render_cfg=self.render_cfg,
                bg_color=bg_color, skip_flat=skip_flat,
            )
            imgs.append(out["image"])
            depths.append(out["depth"])
            if stats:
                jax.block_until_ready(out["image"])
                print(f"# chunk {s // chunk}: {time.time() - t0:.3f}s "
                      f"rounds={int(out['rounds'])}", flush=True)
        inv_d = jnp.asarray(inv)
        img = np.asarray(
            jnp.take(jnp.concatenate(imgs, axis=0)[:n], inv_d, axis=0)
        ).reshape(H, W, 3)
        depth = np.asarray(
            jnp.take(jnp.concatenate(depths, axis=0)[:n], inv_d, axis=0)
        ).reshape(H, W)
        return img, depth

    def render_distill_frame(self, edit_grid, pose, intrinsics, H, W,
                             grow_grid=False, chunk=None, params=None):
        """Full-frame distill-path render (image/depth/weights/edit sums/
        x_term). Returns a dict of np arrays [H*W, ...] + scalar min_near.
        The skip field is built once per frame and shared by every chunk."""
        from ..models.renderer import render_rays_distill
        from ..ops.raymarch import build_skip_field

        rcfg = self.render_cfg
        cfg = rcfg.march_cfg
        chunk = chunk or self.eval_chunk
        params = params if params is not None else self.state.ema_params
        egrid = jnp.asarray(edit_grid)
        n = H * W
        rays_o, rays_d = pixel_rays(jnp.asarray(pose),
                                    jnp.asarray(intrinsics), H, W)
        march_src = egrid if grow_grid else self.occ_state.occupancy
        skip_flat = _skip_flat_jit(march_src, bound=cfg.bound)

        outs = {k: [] for k in ("image", "depth", "depth_edit",
                                "weights", "weights_edit", "x_term",
                                "nears")}
        min_nears = []
        pad = (-n) % chunk
        ro = (jnp.concatenate([rays_o, rays_o[:pad]]) if pad
              else rays_o)
        rd = (jnp.concatenate([rays_d, rays_d[:pad]]) if pad
              else rays_d)
        for s in range(0, n + pad, chunk):
            out = render_rays_distill(
                params, self.occ_state.occupancy, egrid,
                ro[s:s + chunk], rd[s:s + chunk],
                jax.random.PRNGKey(0), model_cfg=self.model_cfg,
                render_cfg=rcfg, grow_grid=grow_grid,
                skip_flat=skip_flat)
            for k in outs:
                outs[k].append(out[k])
            min_nears.append(out["min_near"])
        res = {k: np.concatenate([np.asarray(x) for x in v])[:n]
               for k, v in outs.items()}
        res["min_near"] = min(float(m) for m in min_nears)
        return res

    def evaluate(self, dataset, max_views: Optional[int] = None):
        """PSNR/SSIM/LPIPS over a dataset split (utils.py:1526-1624); LPIPS
        activates automatically when local VGG weights exist."""
        from .metrics import LPIPSMeter

        # LPIPSMeter is cached: constructing it builds (and jits) a fresh
        # VGG graph, which would otherwise recompile on every evaluate call
        if not hasattr(self, "_lpips_meter"):
            self._lpips_meter = LPIPSMeter()
        pm, sm, lm = psnr_meter(), ssim_meter(), self._lpips_meter
        lm.clear()
        n = len(dataset) if max_views is None else min(max_views, len(dataset))
        for i in range(n):
            img, _ = self.render_image(dataset.poses[i], dataset.intrinsics,
                                       dataset.H, dataset.W)
            gt = dataset.images[i]
            if gt.shape[-1] == 4:
                gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])
            pm.update(img, gt)
            sm.update(img, gt)
            lm.update(img, gt)
        self.log(f"[eval] {pm.report()} | {sm.report()} | {lm.report()}")
        self.stats["psnr"].append(pm.measure())
        self.log_scalar("eval/psnr", pm.measure())
        self.log_scalar("eval/ssim", sm.measure())
        if lm.available:
            self.log_scalar("eval/lpips", lm.measure())
        return pm.measure()

    # ------------------------------------------------------------------

    def _ckpt_tree(self):
        return {"state": self.state, "occ": self.occ_state}

    def save_checkpoint(self, best_metric: Optional[float] = None):
        meta = {"global_step": self.global_step}
        path = self.ckpt.save(self.global_step, self._ckpt_tree(), meta)
        if best_metric is not None:
            self.ckpt.save_best(best_metric, self._ckpt_tree(), meta)
        return path

    def load_checkpoint(self, mode="latest"):
        path = self.ckpt.resolve(mode)
        if path is None:
            self.log(f"[ckpt] no checkpoint for mode={mode}, from scratch")
            return False
        tree, meta = load_pytree(path, self._ckpt_tree())
        self.state = tree["state"]
        self.occ_state = tree["occ"]
        self.global_step = int(meta.get("global_step", int(self.state.step)))
        self.log(f"[ckpt] loaded {path} at step {self.global_step}")
        return True
