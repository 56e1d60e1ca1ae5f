"""Palette imagery helpers.

Equivalent of the reference's plot_utils.palette_utils
(/root/reference/plot_utils/palette_utils.py:9-84): render a color palette
(and a before->after change strip) as small PNGs for run artifacts.
"""

import os

import numpy as np

try:
    import imageio.v2 as imageio
except ImportError:  # pragma: no cover
    import imageio


def _swatch_strip(palette, swatch: int = 64, pad: int = 4):
    """[K, 3] palette -> horizontal swatch strip image."""
    palette = np.clip(np.asarray(palette, np.float32), 0, 1)
    K = palette.shape[0]
    W = K * swatch + (K + 1) * pad
    img = np.ones((swatch + 2 * pad, W, 3), np.float32)
    for k in range(K):
        x0 = pad + k * (swatch + pad)
        img[pad:pad + swatch, x0:x0 + swatch] = palette[k]
    return (img * 255).astype(np.uint8)


def palette_to_img(palette, path, prefix: str = "palette"):
    out = os.path.join(path, f"{prefix}_palette.png")
    imageio.imwrite(out, _swatch_strip(palette))
    return out


def palette_change_to_img(palette_og, palette_mod, path, prefix: str = "mod"):
    """Two stacked strips: original over modified, with an arrow gap."""
    top = _swatch_strip(palette_og)
    bot = _swatch_strip(palette_mod)
    gap = np.full((8, top.shape[1], 3), 255, np.uint8)
    img = np.concatenate([top, gap, bot], axis=0)
    out = os.path.join(path, f"{prefix}_palette_change.png")
    imageio.imwrite(out, img)
    return out
