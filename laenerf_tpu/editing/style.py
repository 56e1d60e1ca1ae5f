"""VGG-19 Gram-matrix style network.

TPU-native equivalent of the reference's StyleNetwork
(/root/reference/editing/style_network.py:55-191): precomputes Gram targets
from a (random-cropped) style image, scores rendered crops by Gram MSE, and
offers eigendecomposition color matching for --preserve_color.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .vgg import normalize_imagenet, vgg_features, vgg_init


def gram_matrices(feats):
    """Per-layer Gram matrices, normalized by b*c*d
    (style_network.py:146-157). feats: list of [1, C, H, W]."""
    outs = []
    for f in feats:
        _, c, h, w = f.shape
        flat = f[0].reshape(c, h * w)
        outs.append((flat @ flat.T) / (c * h * w))
    return outs


def match_color(style_img, target_img, eps=1e-5):
    """Transfer the target image's color statistics onto the style image via
    covariance eigendecomposition (style_network.py:93-123).

    Args:
      style_img, target_img: [3, H, W] float arrays in [0, 1] (numpy).
    Returns matched style image [3, H, W].
    """
    style_img = np.asarray(style_img, np.float64)
    target_img = np.asarray(target_img, np.float64)

    mu_t = style_img.mean(axis=(1, 2), keepdims=True)
    t = (style_img - mu_t).reshape(3, -1)
    Ct = t @ t.T / t.shape[1] + eps * np.eye(3)

    mu_s = target_img.mean(axis=(1, 2), keepdims=True).reshape(3, 1, 1)
    s = (target_img - target_img.mean(axis=(1, 2), keepdims=True)).reshape(3, -1)
    Cs = s @ s.T / s.shape[1] + eps * np.eye(3)

    eva_t, eve_t = np.linalg.eigh(Ct)
    Qt = eve_t @ np.diag(np.sqrt(np.maximum(eva_t, 0))) @ eve_t.T
    eva_s, eve_s = np.linalg.eigh(Cs)
    Qs = eve_s @ np.diag(np.sqrt(np.maximum(eva_s, 0))) @ eve_s.T
    ts = Qs @ np.linalg.inv(Qt) @ t

    matched = ts.reshape(style_img.shape) + mu_s
    return np.clip(matched, 0.0, 1.0).astype(np.float32)


def _resize_chw(img, size):
    """Nearest-free bilinear resize of [3, H, W] to [3, size, size]."""
    return jax.image.resize(img, (img.shape[0], size, size), "bilinear")


class StyleNetwork:
    """Gram style loss against a target style image.

    Args:
      style_img: [3, H, W] float in [0, 1].
      style_layers: torchvision feature indices (default run_llff.sh:94 uses
        10 12 14; main_nerf.py:149 defaults [10, 12, 14]).
      size: crop size (--crop_size, 256).
      preserve_color: use color-matched Gram targets (set via match_color).
    """

    def __init__(self, style_img, style_layers: Sequence[int] = (10, 12, 14),
                 size: int = 256, preserve_color: bool = False, seed: int = 0):
        self.params, self.kinds, self.pretrained = vgg_init("vgg19")
        self.style_layers = tuple(sorted(style_layers))
        self.size = size
        self.preserve_color = preserve_color
        self.rng = np.random.RandomState(seed)
        self.image = np.asarray(style_img, np.float32)
        self.gram_style = self._target_grams(self.image, crop=True)
        self.gram_color = None

        max_layer = max(self.style_layers)

        @jax.jit
        def _loss(img, targets):
            feats = vgg_features(self.params, self.kinds,
                                 normalize_imagenet(img)[None],
                                 self.style_layers)
            grams = gram_matrices(feats)
            total = 0.0
            n = 0
            for g, t in zip(grams, targets):
                total = total + jnp.sum((g - t) ** 2)
                n += g.size
            return total / n  # matches F.mse_loss over the stacked grams

        self._loss = _loss

    # ------------------------------------------------------------------

    def _random_crop(self, img):
        """Random crop to size x size, padding if needed
        (style_network.py:72,129-135)."""
        c, h, w = img.shape
        if h < self.size or w < self.size:
            ph, pw = max(0, self.size - h), max(0, self.size - w)
            img = np.pad(img, ((0, 0), (ph // 2, ph - ph // 2),
                               (pw // 2, pw - pw // 2)))
            c, h, w = img.shape
        i = self.rng.randint(0, h - self.size + 1)
        j = self.rng.randint(0, w - self.size + 1)
        return img[:, i:i + self.size, j:j + self.size]

    def _target_grams(self, img, crop: bool):
        img = self._random_crop(img) if crop else np.asarray(
            _resize_chw(jnp.asarray(img), self.size))
        feats = vgg_features(self.params, self.kinds,
                             normalize_imagenet(jnp.asarray(img))[None],
                             self.style_layers)
        return [jax.lax.stop_gradient(g) for g in gram_matrices(feats)]

    def set_color_target(self, target_img):
        """match_color + store the color-matched Gram target
        (style_network.py:93-123)."""
        matched = match_color(self.image, target_img)
        self.gram_color = self._target_grams(matched, crop=False)
        return matched

    def __call__(self, img):
        """Gram MSE of a rendered [3, H, W] image in [0, 1]
        (style_network.py:182-191); the image is resized (not cropped) to
        the style size as the reference does at loss time."""
        img = _resize_chw(img, self.size)
        targets = (self.gram_color if (self.preserve_color and
                                       self.gram_color is not None)
                   else self.gram_style)
        return self._loss(img, targets)

    def guided_loss(self, img, guide, style_feats=None):
        """Guided Gram MSE (style_network.py:160-179): features of both the
        style and the rendered image are modulated by a spatial guide before
        the Gram computation.

        Args:
          img: [3, H, W] rendered image; guide: [H, W] in [0, 1].
          style_feats: optional precomputed style features (defaults to the
            stored style image's features at the crop size).
        """
        img = _resize_chw(img, self.size)
        g = jax.image.resize(jnp.asarray(guide)[None], (1, self.size,
                                                        self.size),
                             "bilinear")
        feats_img = vgg_features(self.params, self.kinds,
                                 normalize_imagenet(img)[None],
                                 self.style_layers)
        if style_feats is None:
            s = _resize_chw(jnp.asarray(self.image), self.size)
            style_feats = vgg_features(self.params, self.kinds,
                                       normalize_imagenet(s)[None],
                                       self.style_layers)
        loss = 0.0
        for fi, fs in zip(feats_img, style_feats):
            _, c, h, w = fi.shape
            gg = jax.image.resize(g, (1, h, w), "bilinear")[0]
            a = (fi[0] * gg).reshape(c, -1)
            b = (jax.lax.stop_gradient(fs[0]) * gg).reshape(c, -1)
            Ga = a @ a.T / (c * h * w)
            Gb = b @ b.T / (c * h * w)
            loss = loss + jnp.mean((Ga - Gb) ** 2)
        return loss / len(feats_img)
