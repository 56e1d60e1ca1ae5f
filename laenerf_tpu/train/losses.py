"""Auxiliary training losses.

TPU-native equivalent of the reference's loss.py: mape/huber criteria and
the O(N) distortion loss. The reference implements the distortion loss as a
custom autograd Function with hand-written gradients
(loss.py:30-75, from torch_efficient_distloss); here the same prefix-sum
formulation is plain differentiable jnp — autodiff of cumsum reproduces the
suffix-sum gradient, no custom VJP needed.
"""

import jax.numpy as jnp


def mape_loss(pred, target, reduction="mean"):
    """Mean absolute percentage error (loss.py:7-16)."""
    loss = jnp.abs(pred - target) / (jnp.abs(target) + 1e-2)
    return jnp.mean(loss) if reduction == "mean" else loss


def huber_loss(pred, target, delta=0.1, reduction="mean"):
    """Huber with the reference's parameterisation (loss.py:18-26)."""
    rel = jnp.abs(pred - target)
    sqr = 0.5 / delta * rel * rel
    loss = jnp.where(rel > delta, rel - 0.5 * delta, sqr)
    return jnp.mean(loss) if reduction == "mean" else loss


def eff_distloss(w, m, interval):
    """O(N) distortion loss (mip-NeRF 360), prefix-sum form (loss.py:30-59).

    Args:
      w: [B, N] volume-rendering weights.
      m: [B, N] sample midpoint distances.
      interval: scalar or [B, N] sample interval widths.
    """
    n_rays = w.shape[0] if w.ndim > 1 else 1
    wm = w * m
    w_cumsum = jnp.cumsum(w, axis=-1)
    wm_cumsum = jnp.cumsum(wm, axis=-1)
    w_prefix = jnp.concatenate(
        [jnp.zeros_like(w_cumsum[..., :1]), w_cumsum[..., :-1]], axis=-1
    )
    wm_prefix = jnp.concatenate(
        [jnp.zeros_like(wm_cumsum[..., :1]), wm_cumsum[..., :-1]], axis=-1
    )
    loss_uni = (1.0 / 3.0) * interval * w ** 2
    loss_bi = 2.0 * w * (m * w_prefix - wm_prefix)
    return (jnp.sum(loss_bi) + jnp.sum(loss_uni)) / n_rays
