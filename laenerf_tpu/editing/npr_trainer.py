"""Reference-based NPR stylization training.

TPU-native equivalents of the reference's NPR path:
  * npr_train_step  <- Trainer.train_styleenc_step_npr
    (/root/reference/nerf/utils.py:1058-1176): LAENeRF trained on
    registration targets (distance-weighted MSE) + cosine NNFM feature loss
    + color-patch MSE + optional guided style/TV losses.
  * build_npr_nerf_dataset <- SingleViewEditDataset.dataloader_nerf
    (single_view_edit_dataset.py:447-520): bake registration colors and
    LAENeRF predictions into per-view supervision images.
  * Trainer.train_one_batch_npr uses train_step_npr semantics
    (utils.py:487-533): weighted MSE to registration + (1 - w/2)-weighted
    MSE to the stylized image + masked depth loss.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .laenerf import LAENeRFConfig, LAENeRFLosses, laenerf_forward_train
from .semantic import FEAT_LAYERS, SemanticEncoder
from .style_trainer import StyleLossWeights, make_style_optimizer
from .vgg import normalize_imagenet, vgg_features


@partial(jax.jit, static_argnames=("cfg", "weights", "optimizer", "H", "W",
                                   "crop_h", "crop_w", "feature_size",
                                   "mse_loss_w", "cos_loss_w",
                                   "color_patch_w", "vgg_kinds"))
def npr_train_step(params, opt_state, active, batch, vgg_p, key, *,
                   vgg_kinds,
                   cfg: LAENeRFConfig, weights: StyleLossWeights, optimizer,
                   H: int, W: int, crop_h: int, crop_w: int,
                   feature_size: int, mse_loss_w: float, cos_loss_w: float,
                   color_patch_w: float):
    """One NPR LAENeRF step on one padded view batch."""
    valid = batch["valid"].astype(jnp.float32)

    def loss_fn(params):
        colors, w_hat, o_hat = laenerf_forward_train(
            params, cfg, batch["x_term"], batch["dirs"], active
        )
        colors = colors * batch["w8s"][:, None]
        vm = valid[:, None]

        # distance-weighted registration MSE (utils.py:1098-1102)
        tw = (batch["target_weights"] * valid)[:, None]
        denom = jnp.maximum(jnp.sum(tw) * 3, 1.0)
        mse = jnp.sum(((colors - batch["targets"]) ** 2) * tw) / denom
        loss = mse * mse_loss_w
        loss = loss + LAENeRFLosses.weights(
            w_hat, weights.weight_loss_uniform,
            weights.weight_loss_non_uniform, valid=valid,
        )
        loss = loss + LAENeRFLosses.offsets(o_hat * vm, weights.offset_loss)
        loss = loss + LAENeRFLosses.palette(
            params["palette"], active, weights.palette_loss_valid,
            weights.palette_loss_distinct,
        )

        # scatter predictions, crop
        flat = jnp.zeros((H * W + 1, 3), jnp.float32)
        flat = flat.at[batch["inds"]].set(jnp.where(vm, colors, 0.0))
        full = flat[: H * W].reshape(H, W, 3)
        img = jax.lax.dynamic_slice(
            full, (batch["crop_origin"][0], batch["crop_origin"][1], 0),
            (crop_h, crop_w, 3),
        )
        img_chw = jnp.moveaxis(img, -1, 0)

        # NNFM cosine feature loss (utils.py:1115-1120)
        x = jax.image.resize(img_chw, (3, feature_size, feature_size),
                             "bilinear")
        feats = vgg_features(vgg_p, vgg_kinds, normalize_imagenet(x)[None],
                             FEAT_LAYERS)
        pred_feat = jnp.stack([f[0] for f in feats]).reshape(
            len(FEAT_LAYERS), feats[0].shape[1], -1
        )
        loss = loss + SemanticEncoder.cos_loss(
            pred_feat, batch["sup_feat"].reshape(pred_feat.shape)
        ) * cos_loss_w

        # color-patch loss on the full frame (utils.py:1122-1125)
        ph, pw = batch["col_patch"].shape[-2:]
        color_pred = jax.image.resize(jnp.moveaxis(full, -1, 0),
                                      (3, ph, pw), "bilinear")
        loss = loss + jnp.mean((color_pred - batch["col_patch"]) ** 2) \
            * color_patch_w

        # TV losses with the style-guide weighting (utils.py:1127-1146)
        if weights.tv_weight > 0:
            if weights.tv_depth_guide:
                tv = LAENeRFLosses.tv_depth_weighted(
                    img_chw, batch["tv_v"], batch["tv_h"],
                    1.0 - batch["style_guide"],
                )
            else:
                tv = LAENeRFLosses.tv(img_chw)
            loss = loss + weights.tv_weight * tv
        if weights.depth_disc_weight > 0:
            loss = loss + weights.depth_disc_weight * \
                LAENeRFLosses.depth_discontinuity(img_chw, batch["tv_v"],
                                                  batch["tv_h"])
        return loss, mse

    (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_opt_state, {"loss": loss, "mse": mse}


class NPRTrainer:
    """Drives NPR LAENeRF training over a SingleViewEditDataset."""

    def __init__(self, cfg: LAENeRFConfig, weights: StyleLossWeights,
                 npr_dataset, semantic_encoder: SemanticEncoder,
                 lr: float = 1e-3, mse_loss_w: float = 6.0,
                 cos_loss_w: float = 2.5, color_patch_w: float = 30.0,
                 seed: int = 0):
        from .laenerf import laenerf_init

        self.cfg = cfg
        self.weights = weights
        self.ds = npr_dataset
        self.sem = semantic_encoder
        self.mse_loss_w = mse_loss_w
        self.cos_loss_w = cos_loss_w
        self.color_patch_w = color_patch_w
        self.key = jax.random.PRNGKey(seed)
        self.key, k = jax.random.split(self.key)
        self.params, self.active = laenerf_init(k, cfg)
        self.optimizer = make_style_optimizer(lr)
        self.opt_state = self.optimizer.init(self.params)
        self.step = 0

    def _device_view(self, i: int):
        """Static view tensors uploaded once; depth jitter applied on device
        (same fix as LAENeRFTrainer: per-step uploads + loss syncs through
        the TPU tunnel dominated wall-clock)."""
        if not hasattr(self, "_dev_views"):
            self._dev_views = {}
        if i not in self._dev_views:
            v = self.ds.views[i]
            jb = {k: jax.device_put(a) for k, a in v.items()
                  if isinstance(a, np.ndarray)}
            self._dev_views[i] = (jb, float(v.get("depth_factor", 0.0)))
        return self._dev_views[i]

    def train_steps(self, n: int):
        mses = []
        order = self.ds.epoch_indices()
        oi = 0
        for _ in range(n):
            if oi >= len(order):
                order = self.ds.epoch_indices()
                oi = 0
            base, depth_factor = self._device_view(int(order[oi]))
            oi += 1
            self.key, k, kj = jax.random.split(self.key, 3)
            jb = dict(base)
            if depth_factor > 0:
                d = (jax.random.uniform(kj, (jb["x_term"].shape[0],))
                     - 0.5) * depth_factor
                jb["x_term"] = base["x_term"] + d[:, None] * base["dirs"]
            self.params, self.opt_state, aux = npr_train_step(
                self.params, self.opt_state, self.active, jb,
                self.sem.params, k, vgg_kinds=tuple(self.sem.kinds),
                cfg=self.cfg,
                weights=self.weights, optimizer=self.optimizer,
                H=self.ds.H, W=self.ds.W, crop_h=self.ds.crop_h,
                crop_w=self.ds.crop_w, feature_size=self.ds.feature_size,
                mse_loss_w=self.mse_loss_w, cos_loss_w=self.cos_loss_w,
                color_patch_w=self.color_patch_w,
            )
            self.step += 1
            mses.append(aux["mse"])
        return float(jnp.mean(jnp.stack(mses)))


def build_npr_nerf_dataset(npr_dataset, laenerf_params, laenerf_cfg, active,
                           dataset, out_dir=None):
    """Bake NPR supervision images (dataloader_nerf equivalent).

    Returns a list of per-view dicts consumed by Trainer.train_one_batch_npr:
    target (registration colors + alpha), style_img (LAENeRF predictions),
    target_weights, depth, depth_weights, plus the view's pose for ray gen.
    """
    H, W = npr_dataset.H, npr_dataset.W
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    out = []
    for v in npr_dataset.views:
        idx = int(v["view_index"])
        n = int(v["n_valid"])
        inds = v["inds"][:n]
        alpha = dataset.images[idx][..., -1].reshape(-1) \
            if dataset.images.shape[-1] == 4 else np.ones(H * W, np.float32)

        tw = np.zeros(H * W, np.float32)
        tw[inds] = v["target_weights"][:n]
        tw += 1.0 - alpha  # supervise empty space too

        ref_img = np.zeros((H * W, 4), np.float32)
        ref_img[:, 3] = alpha
        ref_img[inds, :3] = v["targets"][:n]

        colors, _, _ = laenerf_forward_train(
            laenerf_params, laenerf_cfg, jnp.asarray(v["x_term"]),
            jnp.asarray(v["dirs"]), active,
        )
        style_img = np.zeros((H * W, 4), np.float32)
        style_img[inds, 3] = alpha[inds]
        style_img[inds, :3] = np.asarray(colors)[:n]

        depth = np.zeros(H * W, np.float32)
        depth[inds] = v["depths"][:n]
        depth_w = np.zeros(H * W, np.float32)
        depth_w[inds] = 1.0

        out.append({
            "view_index": idx,
            "target": ref_img.reshape(H, W, 4),
            "style_img": style_img.reshape(H, W, 4),
            "target_weights": tw.reshape(H, W),
            "depth": depth.reshape(H, W),
            "depth_weights": depth_w.reshape(H, W),
        })
        if out_dir:
            import imageio.v2 as imageio

            imageio.imwrite(os.path.join(out_dir, f"style_img_{idx}.png"),
                            (np.clip(style_img[:, :3].reshape(H, W, 3), 0, 1)
                             * 255).astype(np.uint8))
    return out
