"""Color-space conversions (the reference's srgb_to_linear / linear_to_srgb
used by --color_space linear, nerf/utils.py:44-59 equivalent)."""

import jax.numpy as jnp


def srgb_to_linear(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.04045, x / 12.92,
                     ((x + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, x * 12.92,
                     1.055 * x ** (1.0 / 2.4) - 0.055)
