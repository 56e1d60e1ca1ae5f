"""Training-set distillation: bake LAENeRF's (re-paletted) outputs into the
training images.

TPU-native equivalent of NeRFGUI.distill_dataset
(/root/reference/nerf/gui.py:357-541): for every non-occluded view,
re-evaluate LAENeRF at the cached termination points with the *user
modified* palette (per-base weights/biases, clamped and renormalized,
gui.py:438-445), optionally interpolate toward the original palette in the
grow-grid transition shell (gui.py:447-453), scatter into the view, blend
over the original NeRF render by the edit weights, and composite into the
train image where w8s_edit > blend_thresh. Also installs edit-weight-driven
error maps (gui.py:399-425), records per-view depths for the fine-tune's
depth supervision, and writes palette/weight artifacts + palette_eval.json
stats.
"""

import json
import os

import jax.numpy as jnp
import numpy as np

try:
    import imageio.v2 as imageio
except ImportError:  # pragma: no cover
    import imageio

from .laenerf import laenerf_forward_train


def _resize_128(img):
    """Nearest-neighbour downsample to 128x128 (error-map resolution)."""
    H, W = img.shape
    ys = (np.arange(128) * H // 128).clip(0, H - 1)
    xs = (np.arange(128) * W // 128).clip(0, W - 1)
    return img[ys][:, xs]


def distill_dataset(dataset, edit_dataset, laenerf_params, laenerf_cfg,
                    active, palet_og, palet_mod, palet_weights=None,
                    palet_biases=None, blend_thresh: float = 0.5,
                    smooth_transition: bool = True, no_bg: bool = False,
                    use_error_maps: bool = False, out_dir=None,
                    save_train_dataset: bool = False):
    """Overwrite dataset.images with the distilled edit; returns stats dict.

    Args:
      dataset: training NeRFDataset (images mutated in place; depths filled).
      edit_dataset: EditDataset with cached per-view data.
      palet_og / palet_mod: [K, 3] original / modified palettes (full K;
        inactive rows are ignored since their weights are ~0).
      palet_weights / palet_biases: [K] user per-base weight/bias
        (gui.py:438-441); default 1 / 0.
    """
    K = laenerf_cfg.num_palette_bases
    palet_og = jnp.asarray(palet_og)
    palet_mod = jnp.asarray(palet_mod)
    pw = jnp.ones((K,)) if palet_weights is None else jnp.asarray(palet_weights)
    pb = jnp.zeros((K,)) if palet_biases is None else jnp.asarray(palet_biases)
    palette_changed = (not np.allclose(np.asarray(palet_og),
                                       np.asarray(palet_mod))
                       or not np.all(np.asarray(pw) == 1)
                       or not np.all(np.asarray(pb) == 0))

    H, W = dataset.H, dataset.W
    sp_losses, tv_losses = [], []
    dataset.depths = [np.zeros(H * W, np.float32) for _ in range(len(dataset))]
    if use_error_maps:
        dataset.error_map = np.ones((len(dataset), 128 * 128), np.float32)

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        from ..utils.palette import palette_to_img, palette_change_to_img

        palette_to_img(np.asarray(palet_og)[np.asarray(active)], out_dir,
                       prefix="original")
        palette_to_img(np.asarray(palet_mod)[np.asarray(active)], out_dir,
                       prefix="modified")
        palette_change_to_img(np.asarray(palet_og)[np.asarray(active)],
                              np.asarray(palet_mod)[np.asarray(active)],
                              out_dir, prefix="mod")

    for v in edit_dataset.views:
        idx = int(v["view_index"])
        n = int(v["n_valid"])
        inds = v["inds"][:n]
        # evaluate on the padded arrays so every view shares one jit shape
        x_term = jnp.asarray(v["x_term"])
        dirs = jnp.asarray(v["dirs"])

        _, weights_og, offsets = laenerf_forward_train(
            laenerf_params, laenerf_cfg, x_term, dirs, active
        )
        # user-guided remap (gui.py:438-445)
        weights = jnp.clip(pb[None] + pw[None] * weights_og, min=0.0)
        weights = weights / jnp.maximum(jnp.sum(weights, -1, keepdims=True),
                                        1e-8)
        pred_colors = jnp.clip(offsets + weights @ palet_mod, 0.0, 1.0)

        dist = jnp.asarray(v["dist_factor"])
        if smooth_transition and palette_changed:
            # palette-space interpolation in the transition shell
            # (gui.py:447-453)
            palet_interp = (dist[:, None, None] * palet_og[None]
                            + (1 - dist[:, None, None]) * palet_mod[None])
            weight_interp = (weights_og * dist[:, None]
                             + weights * (1 - dist[:, None]))
            interp_colors = jnp.clip(
                jnp.einsum("bi,bik->bk", weight_interp, palet_interp)
                + offsets, 0.0, 1.0,
            )
            pred_colors = jnp.where((dist > 0)[:, None], interp_colors,
                                    pred_colors)

        pred_colors = np.asarray(pred_colors)[:n]
        w8s_edit = np.zeros(H * W, np.float32)
        w8s_edit[inds] = v["w8s"][:n]
        style_img = np.zeros((H * W, 3), np.float32)
        style_img[inds] = pred_colors

        pred_img = np.zeros((H * W, 3), np.float32)
        pred_img[inds] = v["pred_img"][:n]

        if no_bg:
            styled = w8s_edit[:, None] * style_img
        else:
            styled = ((1 - w8s_edit)[:, None] * pred_img
                      + w8s_edit[:, None] * style_img)

        train_img = dataset.images[idx][..., :3].reshape(-1, 3).copy()
        blend = w8s_edit > blend_thresh
        train_img[blend] = np.clip(styled[blend], 0, 1)
        dataset.images[idx][..., :3] = train_img.reshape(H, W, 3)

        # per-view depth for the fine-tune's depth supervision
        # (gui.py:509-512, utils.py:586-589)
        d_full = np.zeros(H * W, np.float32)
        d_full[inds] = v["depths"][:n]
        dataset.depths[idx] = d_full

        if use_error_maps:
            em = np.clip(_resize_128(w8s_edit.reshape(H, W)) + 0.15, 0, 1)
            dataset.error_map[idx] = em.reshape(-1)

        # palette sparsity / weight-TV stats (gui.py:483-494)
        wnp = np.asarray(weights)[:n]
        sp_losses.append(float(
            np.mean(wnp.sum(-1) / np.maximum((wnp ** 2).sum(-1), 1e-8) - 1)
        ))
        wimg = np.zeros((H * W, wnp.shape[-1]), np.float32)
        wimg[inds] = wnp
        wimg = wimg.reshape(H, W, -1)
        we = w8s_edit.reshape(H, W, 1)
        tv1 = np.sum(((wimg[1:] - wimg[:-1]) * we[1:] * we[:-1]) ** 2) / n
        tv2 = np.sum(((wimg[:, 1:] - wimg[:, :-1]) * we[:, 1:] * we[:, :-1]) ** 2) / n
        tv_losses.append(float(tv1 + tv2))

        if out_dir and save_train_dataset:
            img = dataset.images[idx]
            if img.shape[-1] == 4:
                out = img[..., :3] * img[..., 3:] + (1 - img[..., 3:])
            else:
                out = img[..., :3]
            imageio.imwrite(os.path.join(out_dir, f"train_{idx:03d}.png"),
                            (np.clip(out, 0, 1) * 255).astype(np.uint8))
            imageio.imwrite(os.path.join(out_dir, f"w8s_{idx:03d}.png"),
                            (w8s_edit.reshape(H, W) * 255).astype(np.uint8))

    stats = {
        "sparsity_loss": float(np.mean(sp_losses)) if sp_losses else 0.0,
        "tv_loss": float(np.mean(tv_losses)) if tv_losses else 0.0,
    }
    if out_dir:
        with open(os.path.join(out_dir, "palette_eval.json"), "w") as f:
            json.dump(stats, f, indent=2)
    return stats
