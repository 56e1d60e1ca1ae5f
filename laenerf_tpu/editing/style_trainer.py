"""LAENeRF training loop (the "style encoder" training phase).

TPU-native equivalent of Trainer.train_LAENeRF_step
(/root/reference/nerf/utils.py:953-1055): per step, one view's masked rays
are pushed through LAENeRF; the loss is MSE vs the frozen NeRF's colors
plus weight/offset/palette regularizers, and — after warmup_iterations —
style-Gram / (depth-weighted) TV / smooth-transition / depth-discontinuity
losses computed on the predicted colors scatter-reassembled into the view's
crop window. Optimized with Adam(1e-3), palette at 2x lr
(style_encoder.py:240-248). Palette pruning runs at
(train_steps_style - distill_palette_steps) (gui.py:2004-2021).

Design: fixed shapes throughout — rays padded to EditDataset.n_pad, crops
to (crop_h, crop_w) — so the whole step is one jitted function.
"""

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .laenerf import LAENeRFConfig, LAENeRFLosses, laenerf_forward_train, prune_palette
from .vgg import normalize_imagenet, vgg_features
from .style import gram_matrices


@dataclasses.dataclass(frozen=True)
class StyleLossWeights:
    """Loss weights (defaults mirror main_nerf.py:80-125; run scripts set
    the operative values, e.g. run_llff.sh:58-66,94-97)."""

    tv_weight: float = 0.0
    depth_disc_weight: float = 0.0
    smooth_trans_weight: float = 0.0
    style_weight: float = 0.0
    intensity_weight: float = 0.0
    offset_loss: float = 0.0
    weight_loss_non_uniform: float = 0.0
    weight_loss_uniform: float = 0.0
    palette_loss_valid: float = 0.0
    palette_loss_distinct: float = 0.0
    tv_depth_guide: bool = False
    warmup_iterations: int = 1000


def make_style_optimizer(lr: float = 1e-3):
    """Adam with the palette at 2x lr (style_encoder.py:240-248)."""

    def label_fn(params):
        return {k: ("palette" if k == "palette" else "net") for k in params}

    return optax.multi_transform(
        {"net": optax.adam(lr), "palette": optax.adam(2 * lr)}, label_fn
    )


@partial(jax.jit, static_argnames=("cfg", "weights", "optimizer", "H", "W",
                                   "crop_h", "crop_w", "use_style",
                                   "past_warmup", "style_layers",
                                   "vgg_kinds", "crop_size"))
def laenerf_train_step(params, opt_state, active, batch, key, *,
                       cfg: LAENeRFConfig, weights: StyleLossWeights,
                       optimizer, H: int, W: int, crop_h: int, crop_w: int,
                       use_style: bool, past_warmup: bool,
                       vgg_params=None, vgg_kinds=None, style_layers=None,
                       gram_targets=None, crop_size: int = 256):
    """One LAENeRF optimization step on one view's padded batch.

    Args:
      batch: dict from EditDataset.get_batch, as jnp arrays.
      use_style/past_warmup: static switches for the crop-loss block.
      vgg_params/style_layers/gram_targets: style-loss state (traced).
    Returns (new_params, new_opt_state, aux).
    """
    valid = batch["valid"]
    n_valid = jnp.maximum(jnp.sum(valid), 1)

    def loss_fn(params):
        colors, w_hat, o_hat = laenerf_forward_train(
            params, cfg, batch["x_term"], batch["dirs"], active
        )
        vm = valid[:, None]
        # masked MSE (reference: nn.MSELoss over the view's rays)
        mse = jnp.sum(((colors - batch["targets"]) ** 2) * vm) / (3 * n_valid)
        loss = mse
        loss = loss + LAENeRFLosses.weights(
            w_hat, weights.weight_loss_uniform,
            weights.weight_loss_non_uniform, valid=valid.astype(jnp.float32),
        )
        loss = loss + LAENeRFLosses.offsets(o_hat * vm, weights.offset_loss)
        loss = loss + LAENeRFLosses.palette(
            params["palette"], active, weights.palette_loss_valid,
            weights.palette_loss_distinct,
        )
        if weights.intensity_weight > 0:
            loss = loss + weights.intensity_weight * LAENeRFLosses.intensity(
                batch["targets"] * vm, colors * vm
            )

        if past_warmup and (weights.style_weight > 0 or weights.tv_weight > 0
                            or weights.smooth_trans_weight > 0
                            or weights.depth_disc_weight > 0):
            # scatter predictions into the full image, crop the window
            flat = jnp.zeros((H * W + 1, 3), jnp.float32)
            flat = flat.at[batch["inds"]].set(
                jnp.where(vm, colors.astype(jnp.float32), 0.0)
            )
            img = flat[: H * W].reshape(H, W, 3)
            img = jax.lax.dynamic_slice(
                img, (batch["crop_origin"][0], batch["crop_origin"][1], 0),
                (crop_h, crop_w, 3),
            )
            img_chw = jnp.moveaxis(img, -1, 0)

            if use_style and weights.style_weight > 0:
                # resize the crop window to --crop_size (the reference feeds
                # crop_size-sized tensors to the style net,
                # style_network.py:129-135) — not a 256 literal
                x = jax.image.resize(img_chw, (3, crop_size, crop_size),
                                     "bilinear")
                feats = vgg_features(vgg_params, vgg_kinds,
                                     normalize_imagenet(x)[None],
                                     style_layers)
                grams = gram_matrices(feats)
                sloss = 0.0
                n = 0
                for g, t in zip(grams, gram_targets):
                    sloss = sloss + jnp.sum((g - t) ** 2)
                    n += g.size
                loss = loss + weights.style_weight * sloss / n

            if weights.tv_weight > 0:
                if weights.tv_depth_guide:
                    tv = LAENeRFLosses.tv_depth_weighted(
                        img_chw, batch["tv_v"], batch["tv_h"],
                        batch["cut_smooth"]
                        if weights.smooth_trans_weight > 0 else None,
                    )
                else:
                    tv = LAENeRFLosses.tv(img_chw)
                loss = loss + weights.tv_weight * tv

            if weights.smooth_trans_weight > 0:
                loss = loss + weights.smooth_trans_weight * \
                    LAENeRFLosses.smooth_transition(
                        batch["cut_gt"], img, batch["cut_smooth"]
                    )

            if weights.depth_disc_weight > 0:
                loss = loss + weights.depth_disc_weight * \
                    LAENeRFLosses.depth_discontinuity(
                        img_chw, batch["tv_v"], batch["tv_h"]
                    )

        return loss, mse

    (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_opt_state, {"loss": loss, "mse": mse}


class LAENeRFTrainer:
    """Drives the LAENeRF training phase over an EditDataset."""

    def __init__(self, cfg: LAENeRFConfig, weights: StyleLossWeights,
                 edit_dataset, style_network=None, lr: float = 1e-3,
                 seed: int = 0, crop_size: int = 256):
        from .laenerf import laenerf_init

        self.cfg = cfg
        self.weights = weights
        self.ds = edit_dataset
        self.style_network = style_network
        self.crop_size = crop_size
        self.key = jax.random.PRNGKey(seed)
        self.key, k = jax.random.split(self.key)
        self.params, self.active = laenerf_init(k, cfg)
        self.optimizer = make_style_optimizer(lr)
        self.opt_state = self.optimizer.init(self.params)
        self.step = 0

        if style_network is not None:
            self._vgg = style_network.params
            self._vgg_kinds = tuple(style_network.kinds)
            self._style_layers = tuple(style_network.style_layers)
        else:
            self._vgg = None
            self._vgg_kinds = None
            self._style_layers = None

    def set_config(self, cfg: LAENeRFConfig):
        """Swap the static model config (e.g. to match a reloaded
        checkpoint's table layout); jitted steps re-specialize on it."""
        self.cfg = cfg

    def _gram_targets(self):
        if self.style_network is None:
            return None
        sn = self.style_network
        if sn.preserve_color and sn.gram_color is not None:
            return sn.gram_color
        return sn.gram_style

    def _device_view(self, i: int):
        """Static view tensors uploaded to device once (re-uploading each
        view every step through the TPU tunnel dominated style-phase
        wall-clock); the per-step depth jitter is applied on device."""
        if not hasattr(self, "_dev_views"):
            self._dev_views = {}
        if i not in self._dev_views:
            v = self.ds.views[i]
            jb = {k: jax.device_put(a) for k, a in v.items()
                  if isinstance(a, np.ndarray)}
            self._dev_views[i] = (jb, float(v.get("depth_factor", 0.0)))
        return self._dev_views[i]

    def train_steps(self, n: int):
        """Run n steps, cycling shuffled views (train_LAENeRF_step loop).

        The loss is fetched once at the end of the chunk — a per-step
        float() would insert a host round-trip between every step.
        """
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
                # collate-time x_term re-jitter along the ray
                # (edit_dataset.py:289-312), moved on-device
                d = (jax.random.uniform(kj, (jb["x_term"].shape[0],))
                     - 0.5) * depth_factor
                jb["x_term"] = base["x_term"] + d[:, None] * base["dirs"]
            self.params, self.opt_state, aux = laenerf_train_step(
                self.params, self.opt_state, self.active, jb, k,
                cfg=self.cfg, weights=self.weights, optimizer=self.optimizer,
                H=self.ds.H, W=self.ds.W, crop_h=self.ds.crop_h,
                crop_w=self.ds.crop_w,
                use_style=self.style_network is not None,
                past_warmup=self.step > self.weights.warmup_iterations,
                vgg_params=self._vgg, vgg_kinds=self._vgg_kinds,
                style_layers=self._style_layers,
                gram_targets=self._gram_targets(),
                crop_size=self.crop_size,
            )
            self.step += 1
            mses.append(aux["mse"])
        return float(jnp.mean(jnp.stack(mses)))

    def prune(self, n_views: int = 10, thresh: float = 0.025):
        """Palette pruning over 10 random views (style_encoder.py:160-172),
        with padded batch rows masked out of the per-view means."""
        idx = self.rngint(n_views)
        batches = [self.ds.get_batch(i, jitter=False) for i in idx]
        self.active = prune_palette(
            self.params, self.cfg, self.active,
            [b["x_term"] for b in batches], thresh,
            valid_views=[b["valid"] for b in batches],
        )
        return np.asarray(self.active)

    def rngint(self, n):
        self.key, k = jax.random.split(self.key)
        return np.asarray(
            jax.random.randint(k, (n,), 0, len(self.ds))
        )
