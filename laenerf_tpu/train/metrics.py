"""Quality metrics: PSNR / SSIM in pure jnp, LPIPS via the shared VGG port.

Equivalents of the reference's PSNRMeter / SSIMMeter / LPIPSMeter
(/root/reference/nerf/utils.py:222-330). LPIPS needs pretrained VGG/Alex
weights; laenerf_tpu.editing.vgg loads them from a local npz when available
(this environment has no network egress), so LPIPSMeter degrades gracefully
to "unavailable" instead of downloading.
"""

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred, gt):
    """PSNR over the full batch (utils.py:232-238 reduces over all dims)."""
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(pred, gt, max_val=1.0):
    """SSIM with the standard 11x11 gaussian window.

    Args:
      pred, gt: [H, W, C] images in [0, max_val].
    """
    k = _gaussian_kernel()
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    def filt(img):
        # [H, W, C] -> depthwise conv. precision=HIGHEST: the TPU conv
        # default is bf16, whose rounding survives the E[x^2]-E[x]^2
        # cancellation below and can push SSIM above 1 on near-identical
        # images (observed +0.004 at 800x800).
        img = jnp.moveaxis(img, -1, 0)[:, None]  # [C, 1, H, W]
        out = jax.lax.conv_general_dilated(
            img, k[None, None], (1, 1), "VALID",
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.moveaxis(out[:, 0], 0, -1)

    mu_p, mu_g = filt(pred), filt(gt)
    mu_pp, mu_gg, mu_pg = mu_p * mu_p, mu_g * mu_g, mu_p * mu_g
    # clamp the moment estimates: in exact arithmetic the variances are
    # nonnegative and |cov| <= sqrt(var_p var_g), which bounds SSIM to
    # [-1, 1]; enforcing it removes the residual fp-cancellation drift
    s_pp = jnp.maximum(filt(pred * pred) - mu_pp, 0.0)
    s_gg = jnp.maximum(filt(gt * gt) - mu_gg, 0.0)
    s_pg = filt(pred * gt) - mu_pg
    bound = jnp.sqrt(s_pp * s_gg)
    s_pg = jnp.clip(s_pg, -bound, bound)
    num = (2 * mu_pg + c1) * (2 * s_pg + c2)
    den = (mu_pp + mu_gg + c1) * (s_pp + s_gg + c2)
    return jnp.mean(num / den)


class Meter:
    """Running average of a metric over eval batches."""

    def __init__(self, fn, name):
        self.fn = fn
        self.name = name
        self.clear()

    def clear(self):
        self.vals = []

    def update(self, pred, gt):
        self.vals.append(float(self.fn(jnp.asarray(pred), jnp.asarray(gt))))

    def measure(self):
        return float(np.mean(self.vals)) if self.vals else 0.0

    def report(self):
        return f"{self.name} = {self.measure():.6f}"


def psnr_meter():
    return Meter(psnr, "PSNR")


def ssim_meter():
    return Meter(ssim, "SSIM")


class LPIPSMeter:
    """LPIPS using the JAX VGG16 port; unavailable without local weights."""

    def __init__(self):
        self.name = "LPIPS"
        self.vals = []
        try:
            from ..editing.vgg import lpips_fn

            self._fn = lpips_fn()
        except Exception:
            self._fn = None

    @property
    def available(self):
        return self._fn is not None

    def clear(self):
        self.vals = []

    def update(self, pred, gt):
        if self._fn is None:
            return
        self.vals.append(float(self._fn(jnp.asarray(pred), jnp.asarray(gt))))

    def measure(self):
        return float(np.mean(self.vals)) if self.vals else 0.0

    def report(self):
        if not self.available:
            return "LPIPS = n/a (no local VGG weights)"
        return f"LPIPS = {self.measure():.6f}"
