"""Single-view reference (Ref-NPR style) stylization dataset.

TPU-native equivalent of the reference's SingleViewEditDataset
(/root/reference/editing/single_view_edit_dataset.py:18-523): register a
user-stylized reference view against every training view through shared 3D
ray-termination points (plus 2 jittered ray passes over the reference view
for denser coverage), derive per-ray color targets weighted by registration
distance and direction agreement, and precompute per-view NN-replaced
feature/color-patch supervision.

Fixed-shape policy mirrors EditDataset: per-view masked rays are padded to
one global bucket; registration targets live in full-length arrays with
zero weights where unregistered.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

try:
    import imageio.v2 as imageio
except ImportError:  # pragma: no cover
    import imageio

from ..data.rays import pixel_rays
from ..models.renderer import render_rays_distill
from .semantic import COLOR_LAYERS, FEAT_LAYERS, SemanticEncoder


def _round_up(x, m):
    return int(-(-x // m) * m)


class SingleViewEditDataset:
    def __init__(self, trainer, dataset, config_dir: str,
                 semantic_encoder: SemanticEncoder, num_steps: int = 512,
                 min_dist: float = 1e-2, max_dist: float = 10e-2,
                 min_tv_factor: float = 0.1, feature_size: int = 256,
                 out_dir=None, eval_chunk: int = 16384, seed: int = 0):
        self.sem = semantic_encoder
        self.num_steps = num_steps
        self.min_dist = min_dist
        self.max_dist = max_dist
        self.min_tv_factor = min_tv_factor
        self.feature_size = feature_size
        self.rng = np.random.RandomState(seed)
        self.H, self.W = dataset.H, dataset.W
        self.eval_chunk = eval_chunk
        self.out_dir = out_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)

        with open(os.path.join(config_dir, "data_config.json")) as f:
            self.config = json.load(f)
        ref_files = [f for f in sorted(os.listdir(config_dir))
                     if f.lower().endswith((".png", ".jpg", ".jpeg"))]
        ref = np.asarray(imageio.imread(os.path.join(config_dir,
                                                     ref_files[0])),
                         np.float32) / 255.0
        if ref.shape[-1] == 4:
            ref = ref[..., :3] * ref[..., 3:]
        self.ref_img = np.moveaxis(ref, -1, 0)  # [3, H, W]

        self.views = []
        self._build(trainer, dataset)

    # ------------------------------------------------------------------

    def _render_view(self, trainer, dataset, idx, dir_offset=None):
        """Full-frame distill render marching the density grid itself
        (the reference passes density_bitfield with grow_grid=True)."""
        H, W = self.H, self.W
        rays_o, rays_d = pixel_rays(jnp.asarray(dataset.poses[idx]),
                                    jnp.asarray(dataset.intrinsics), H, W,
                                    dir_offset=dir_offset)
        occ = trainer.occ_state.occupancy
        if dir_offset is None:
            # pixel-center frames take the raster-stream path when enabled
            # (jittered AA renders keep the march: the stream assumes the
            # get_rays pixel-center geometry)
            r = trainer.render_distill_frame(occ, dataset.poses[idx],
                                             dataset.intrinsics, H, W,
                                             grow_grid=True,
                                             chunk=self.eval_chunk,
                                             params=trainer.state.ema_params)
            res = {k: r[k] for k in ("image", "x_term", "weights", "depth")}
            res["rays_d"] = np.asarray(rays_d)
            return res
        outs = {k: [] for k in ("image", "x_term", "weights", "depth")}
        n = H * W
        chunk = self.eval_chunk
        pad = (-n) % chunk
        ro = jnp.concatenate([rays_o, rays_o[:pad]]) if pad else rays_o
        rd = jnp.concatenate([rays_d, rays_d[:pad]]) if pad else rays_d
        # async chunk dispatch, single fetch (no per-chunk tunnel sync)
        for s in range(0, n + pad, chunk):
            out = render_rays_distill(
                trainer.state.ema_params, occ, occ,
                ro[s:s + chunk], rd[s:s + chunk], jax.random.PRNGKey(0),
                model_cfg=trainer.model_cfg, render_cfg=trainer.render_cfg,
                grow_grid=True,
            )
            for k in outs:
                outs[k].append(out[k])
        res = {k: np.concatenate([np.asarray(x) for x in v])[:n]
               for k, v in outs.items()}
        res["rays_d"] = np.asarray(rays_d)
        return res

    def _build(self, trainer, dataset):
        H, W = self.H, self.W
        ref_idx = int(self.config["tmpl_idx_train"])

        # reference view registration points: base pass + 2 jittered passes
        # (single_view_edit_dataset.py:102-187)
        # only treat the 4th channel as alpha; on RGB (colmap/LLFF) datasets
        # every pixel registers (build_npr_nerf_dataset does the same)
        if dataset.images.shape[-1] == 4:
            alpha = dataset.images[ref_idx, ..., -1].reshape(-1)
        else:
            alpha = np.ones(self.H * self.W, np.float32)
        ref_mask = np.nonzero(alpha > 0)[0]
        ref_x, ref_rgb, ref_dirs = [], [], []
        for k in range(3):
            off = (jnp.asarray(self.rng.rand(2).astype(np.float32) - 0.5)
                   if k > 0 else None)
            r = self._render_view(trainer, dataset, ref_idx, dir_offset=off)
            ref_x.append(r["x_term"][ref_mask])
            ref_rgb.append(
                self.ref_img.reshape(3, -1).T[ref_mask]
            )
            ref_dirs.append(r["rays_d"][ref_mask])
        ref_x = np.concatenate(ref_x)
        ref_rgb = np.concatenate(ref_rgb)
        ref_dirs = np.concatenate(ref_dirs)

        # ref-crop features (style + content + color)
        xs, ys = np.divmod(ref_mask, W)
        x0, x1 = xs.min(), xs.max() + 1
        y0, y1 = ys.min(), ys.max() + 1
        ref_full = np.zeros((H * W, 3), np.float32)
        ref_full[ref_mask] = self.ref_img.reshape(3, -1).T[ref_mask]
        ref_chw = np.moveaxis(ref_full.reshape(H, W, 3), -1, 0)
        self.style_img = ref_chw[:, x0:x1, y0:y1]
        fs = (self.feature_size, self.feature_size)
        self.style_feat = np.asarray(self.sem.encode_feats(
            self.style_img, FEAT_LAYERS, fs))
        content_im = np.moveaxis(dataset.images[ref_idx][..., :3], -1, 0)
        self.content_feat = np.asarray(self.sem.encode_feats(
            content_im[:, x0:x1, y0:y1], FEAT_LAYERS, fs))
        self.color_feat_ref = np.asarray(self.sem.encode_feats(
            content_im, COLOR_LAYERS, size=None))
        self.patch_color = np.asarray(self.sem.get_mean_patch_color(
            ref_chw, size=self.color_feat_ref.shape[-2:]))

        raw = []
        for i in range(len(dataset)):
            r = self._render_view(trainer, dataset, i)
            alpha_i = dataset.images[i, ..., -1].reshape(-1)
            mask = np.nonzero(alpha_i > 0)[0]
            if mask.size == 0:
                continue
            x_term = r["x_term"][mask]

            # registration (single_view_edit_dataset.py:320-349)
            min_d = np.full(mask.shape[0], np.inf, np.float32)
            argmin = np.zeros(mask.shape[0], np.int64)
            for s in range(0, ref_x.shape[0], 8192):
                d = np.linalg.norm(
                    x_term[:, None, :] - ref_x[None, s:s + 8192], axis=-1
                )
                am = d.argmin(1)
                dm = d[np.arange(len(am)), am]
                upd = dm < min_d
                argmin[upd] = am[upd] + s
                min_d[upd] = dm[upd]

            reg = min_d < self.min_dist
            target = np.zeros((mask.shape[0], 3), np.float32)
            target[reg] = ref_rgb[argmin[reg]]
            tw = np.zeros(mask.shape[0], np.float32)
            if reg.any():
                td = min_d[reg]
                rng_d = max(td.max() - td.min(), 1e-8)
                w = 1.0 - (td - td.min()) / rng_d
                # direction agreement down-weighting
                # (single_view_edit_dataset.py:337-348; note the reference
                # clamps cos to [-1, -0.5], zeroing same-direction pairs —
                # we mirror its arithmetic exactly)
                dirs_i = r["rays_d"][mask][reg]
                tdirs = ref_dirs[argmin[reg]]
                cos = np.sum(dirs_i * tdirs, -1) / (
                    np.linalg.norm(dirs_i, axis=-1)
                    * np.linalg.norm(tdirs, axis=-1) + 1e-8)
                factor = (np.clip(cos, -1, -0.5) + 1) / 0.5
                tw[reg] = np.clip(w * factor, 0, None)

            # style guidance mask from registration distance
            ms = np.clip(min_d, self.min_dist, self.max_dist)
            ms = (ms - self.min_dist) / (self.max_dist - self.min_dist)
            style_guide_ray = np.maximum(ms, self.min_tv_factor)

            w8s = r["weights"][mask]
            target_gt = dataset.images[i][..., :3].reshape(-1, 3)[mask]
            if dataset.images.shape[-1] == 4:
                target_gt = (dataset.images[i][..., :3]
                             * dataset.images[i][..., 3:]).reshape(-1, 3)[mask]

            xs, ys = np.divmod(mask, W)
            bbox = (int(xs.min()), int(xs.max()) + 1,
                    int(ys.min()), int(ys.max()) + 1)
            depths = r["depth"][mask]
            raw.append({
                "view_index": i,
                "mask_inds": mask.astype(np.int32),
                "w8s": w8s, "targets": target, "targets_gt": target_gt,
                "target_weights": tw, "x_term": x_term,
                "dirs": r["rays_d"][mask], "depths": depths,
                "pred_img": r["image"][mask],
                "style_guide_ray": style_guide_ray.astype(np.float32),
                "bbox": bbox,
                "depth_factor": float((depths.max() - depths.min())
                                      / self.num_steps),
            })

        self.n_pad = _round_up(max(v["mask_inds"].shape[0] for v in raw), 4096)
        self.crop_h = min(_round_up(max(v["bbox"][1] - v["bbox"][0]
                                        for v in raw), 8), H)
        self.crop_w = min(_round_up(max(v["bbox"][3] - v["bbox"][2]
                                        for v in raw), 8), W)

        for v in raw:
            self.views.append(self._pad_view(v, dataset))

    def _pad_view(self, v, dataset):
        H, W = self.H, self.W
        n = v["mask_inds"].shape[0]
        P = self.n_pad

        def pad1(a, fill=0):
            out = np.full((P,) + a.shape[1:], fill, a.dtype)
            out[:n] = a
            return out

        x0, x1, y0, y1 = v["bbox"]
        cx = min(max(0, (x0 + x1 - self.crop_h) // 2), H - self.crop_h)
        cy = min(max(0, (y0 + y1 - self.crop_w) // 2), W - self.crop_w)

        def cut(vals, channels=None):
            shape = (H * W,) + (() if channels is None else (channels,))
            m = np.zeros(shape, np.float32)
            m[v["mask_inds"]] = vals
            m = m.reshape((H, W) + (() if channels is None else (channels,)))
            return m[cx:cx + self.crop_h, cy:cy + self.crop_w]

        cut_gt = cut(v["targets_gt"], 3)
        cut_depth = cut(v["depths"])
        w_map = cut(v["w8s"])
        style_guide = cut(v["style_guide_ray"])

        w = w_map.copy()
        w[w < 0.98] = 0
        w_h = w[:-1, :] * w[1:, :]
        w_h[1:] *= w[:-2, :] * w[2:, :]
        w_v = w[:, :-1] * w[:, 1:]
        w_v[:, 1:] *= w[:, :-2] * w[:, 2:]
        rgb_h = np.abs(cut_gt[:-1] - cut_gt[1:]).sum(-1)
        rgb_v = np.abs(cut_gt[:, :-1] - cut_gt[:, 1:]).sum(-1)
        tv_h = np.abs(cut_depth[:-1] - cut_depth[1:]) * w_h * rgb_h
        tv_v = np.abs(cut_depth[:, :-1] - cut_depth[:, 1:]) * w_v * rgb_v

        # supervision features (NN-replaced) for this view
        fs = (self.feature_size, self.feature_size)
        sup = self.sem.encode_feats(np.moveaxis(cut_gt, -1, 0), FEAT_LAYERS,
                                    fs)
        sup_nn = np.asarray(self.sem.nn_feat_replace(
            sup, jnp.asarray(self.content_feat), jnp.asarray(self.style_feat)
        ))
        # per-view color-patch target: match this view's deep features
        # against the reference view's, pull the reference colors
        # (single_view_edit_dataset.py:275-279)
        full_img = np.moveaxis(
            dataset.images[v["view_index"]][..., :3], -1, 0)
        col = self.sem.encode_feats(full_img, COLOR_LAYERS, size=None)
        col_nn = np.asarray(self.sem.nn_feat_replace_color(
            col, jnp.asarray(self.color_feat_ref),
            jnp.asarray(self.patch_color),
        ))

        return {
            "view_index": v["view_index"],
            "n_valid": n,
            "inds": pad1(v["mask_inds"], fill=H * W),
            "valid": np.arange(P) < n,
            "w8s": pad1(v["w8s"]),
            "targets": pad1(v["targets"]),
            "targets_gt": pad1(v["targets_gt"]),
            "target_weights": pad1(v["target_weights"]),
            "x_term": pad1(v["x_term"]),
            "dirs": pad1(v["dirs"]),
            "depths": pad1(v["depths"]),
            "pred_img": pad1(v["pred_img"]),
            "crop_origin": np.array([cx, cy], np.int32),
            "cut_gt": cut_gt,
            "style_guide": style_guide.astype(np.float32),
            "tv_h": tv_h.astype(np.float32),
            "tv_v": tv_v.astype(np.float32),
            "sup_feat": sup_nn.astype(np.float32),
            "col_patch": col_nn.astype(np.float32),
            "depth_factor": v["depth_factor"],
        }

    # ------------------------------------------------------------------

    def __len__(self):
        return len(self.views)

    def get_batch(self, i, jitter=True):
        v = self.views[i]
        batch = dict(v)
        if jitter:
            d = (self.rng.rand(self.n_pad).astype(np.float32) - 0.5) \
                * v["depth_factor"]
            batch["x_term"] = v["x_term"] + d[:, None] * v["dirs"]
        return batch

    def epoch_indices(self, shuffle=True):
        idx = np.arange(len(self.views))
        if shuffle:
            self.rng.shuffle(idx)
        return idx
