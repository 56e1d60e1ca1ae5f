"""Semantic feature encoder for reference-based NPR stylization.

TPU-native equivalent of the reference's SemanticEncoder
(/root/reference/editing/semantic_encoder.py:44-269) and the vendored
Ref-NPR NNFM machinery (editing/ref_loss.py): VGG-16 feature extraction,
chunked cosine nearest-neighbour feature/color replacement, cosine feature
loss, and covariance color matching.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .vgg import normalize_imagenet, vgg_features, vgg_init

FEAT_LAYERS = (11, 13, 15)  # relu3_x block (semantic_encoder.py:53)
COLOR_LAYERS = (25, 27, 29)  # relu5_x block (single_view_edit_dataset.py:158)


class SemanticEncoder:
    """VGG-16 based feature matching (weights from local npz if present)."""

    def __init__(self):
        self.params, self.kinds, self.pretrained = vgg_init("vgg16")

    def encode_feats(self, img, layers=FEAT_LAYERS, size=(256, 256)):
        """img: [3, H, W] in [0,1] -> stacked [L, C, h, w] features
        (layers must share channel count, as the reference's do)."""
        x = jnp.asarray(img)
        if size is not None:
            x = jax.image.resize(x, (3,) + tuple(size), "bilinear")
        feats = vgg_features(self.params, self.kinds,
                             normalize_imagenet(x)[None], tuple(layers))
        return jnp.stack([f[0] for f in feats], axis=0)

    # -- cosine NN matching (semantic_encoder.py:139-196) ----------------

    @staticmethod
    def cos_loss(a, b):
        """Mean (1 - cosine similarity) along the channel axis
        (semantic_encoder.py:126-135). a, b: [L, C, HW]."""
        an = a / (jnp.sqrt(jnp.sum(a * a, 1, keepdims=True)) + 1e-8)
        bn = b / (jnp.sqrt(jnp.sum(b * b, 1, keepdims=True)) + 1e-8)
        return jnp.mean(1.0 - jnp.sum(an * bn, axis=1))

    @staticmethod
    def _argmin_cos(a, b, chunk=4096):
        """Per-column nearest neighbour of a in b by cosine distance.
        a: [C, HW], b: [C, H2W2] -> (idx [HW], dist [HW])."""
        bn = b / (jnp.sqrt(jnp.sum(b * b, 0, keepdims=True) + 1e-8) + 1e-8)
        idxs, dists = [], []
        hw = a.shape[-1]
        for s in range(0, hw, chunk):
            ac = a[:, s:s + chunk]
            an = ac / (jnp.sqrt(jnp.sum(ac * ac, 0, keepdims=True) + 1e-8)
                       + 1e-8)
            d = 1.0 - an.T @ bn  # [chunk, H2W2]
            idxs.append(jnp.argmin(d, axis=1))
            dists.append(jnp.min(d, axis=1))
        return jnp.concatenate(idxs), jnp.concatenate(dists)

    def nn_feat_replace(self, content, content_style, style):
        """For each content location, take the style feature whose
        *content_style* feature is most similar (semantic_encoder.py:83-100).
        All inputs [L, C, h, w]; returns [L, C, hw]."""
        L, C = content.shape[:2]
        out = []
        for i in range(L):
            c = content[i].reshape(C, -1)
            cs = content_style[i].reshape(C, -1)
            st = style[i].reshape(C, -1)
            idx, _ = self._argmin_cos(c, cs)
            out.append(st[:, idx])
        return jnp.stack(out, axis=0)

    def nn_feat_replace_color(self, content, content_style, style_color):
        """Color transfer: each location takes the style color at the
        best-matching layer's NN (semantic_encoder.py:102-124).
        style_color: [3, h, w]; returns [3, h, w]."""
        L, C = content.shape[:2]
        h, w = style_color.shape[-2:]
        sc = style_color.reshape(3, -1)
        colors, dists = [], []
        for i in range(L):
            c = content[i].reshape(C, -1)
            cs = content_style[i].reshape(C, -1)
            idx, d = self._argmin_cos(c, cs)
            colors.append(sc[:, idx])
            dists.append(d)
        dists = jnp.stack(dists)  # [L, hw]
        best = jnp.argmin(dists, axis=0)  # [hw]
        colors = jnp.stack(colors)  # [L, 3, hw]
        picked = jnp.take_along_axis(
            colors, best[None, None, :].repeat(3, 1), axis=0
        )[0]
        return picked.reshape(3, h, w)

    @staticmethod
    def get_mean_patch_color(img, size=(32, 32)):
        """Resize to the color-feature resolution
        (semantic_encoder.py:197-205)."""
        return jax.image.resize(jnp.asarray(img), (3,) + tuple(size),
                                "bilinear")

    # -- color statistics matching (semantic_encoder.py:210-241) ---------

    @staticmethod
    def match_colors_for_image_set(image, style_img):
        """Whiten-recolor covariance transfer of image toward style_img.
        image, style_img: [..., 3] in [0,1] (NumPy). Returns (matched,
        color_tf [4,4])."""
        img = np.asarray(image, np.float64).reshape(-1, 3)
        sty = np.asarray(style_img, np.float64).reshape(-1, 3)
        mu_c, mu_s = img.mean(0), sty.mean(0)
        cov_c = (img - mu_c).T @ (img - mu_c) / len(img)
        cov_s = (sty - mu_s).T @ (sty - mu_s) / len(sty)
        u_c, sig_c, _ = np.linalg.svd(cov_c)
        u_s, sig_s, _ = np.linalg.svd(cov_s)
        scl_c = np.diag(1.0 / np.sqrt(np.clip(sig_c, 1e-8, 1e8)))
        scl_s = np.diag(np.sqrt(np.clip(sig_s, 1e-8, 1e8)))
        tmp = u_s @ scl_s @ u_s.T @ u_c @ scl_c @ u_c.T
        vec = mu_s - mu_c @ tmp.T
        out = np.clip(img @ tmp.T + vec, 0, 1).reshape(np.shape(image))
        tf = np.eye(4)
        tf[:3, :3] = tmp
        tf[:3, 3] = vec
        return out.astype(np.float32), tf.astype(np.float32)


def nnfm_loss(encoder: SemanticEncoder, pred_feats, target_nn_feats):
    """Ref-NPR's nearest-neighbour feature-matching loss (ref_loss.py:172):
    cosine distance between rendered features and precomputed NN-replaced
    style features."""
    return encoder.cos_loss(
        pred_feats.reshape(pred_feats.shape[0], pred_feats.shape[1], -1),
        target_nn_feats,
    )
