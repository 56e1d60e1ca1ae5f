"""Stratified + importance-sampled rendering (the occupancy-grid-free path).

TPU-native equivalent of the reference's non-CUDA NeRFRenderer.run
(/root/reference/nerf/renderer.py:128-256) and sample_pdf (:12-46): uniform
z samples in [near, far], a coarse density pass, inverse-CDF importance
upsampling, a merged sorted fine pass, and standard alpha compositing.
Used when no occupancy grid is available (early experiments, unbounded
debugging) and by the staged max_ray_batch render dispatch
(renderer.py:652-685).

Everything is fixed shape by construction; sort+gather merges the coarse
and fine samples (torch.sort equivalent).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.raymarch import near_far_from_aabb
from .nerf import NeRFConfig, nerf_color, nerf_density
from .renderer import RenderConfig, _background


def sample_pdf(key, bins, weights, n_samples: int, det: bool = False):
    """Inverse-CDF sampling (renderer.py:12-46).

    Args:
      bins: [B, T] bin positions; weights: [B, T-1]... here [B, T] midpoints
        with [B, T_w] weights as the reference slices them.
      n_samples: number of new samples.
      det: deterministic (eval) vs uniform-random u.
    Returns [B, n_samples] new z values.
    """
    B = bins.shape[0]
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [B, T]

    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (B, n_samples))
    else:
        u = jax.random.uniform(key, (B, n_samples))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1),
                                 axis=-1)
    bins_a = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1),
                                 axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


@partial(jax.jit, static_argnames=("model_cfg", "render_cfg", "num_steps",
                                   "upsample_steps", "perturb", "training"))
def render_rays_stratified(params, rays_o, rays_d, key, *,
                           model_cfg: NeRFConfig, render_cfg: RenderConfig,
                           num_steps: int = 128, upsample_steps: int = 128,
                           bg_color=None, perturb: bool = False,
                           training: bool = False):
    """Coarse-to-fine stratified rendering (renderer.py:128-256).

    Returns dict(image [N,3], depth [N], weights_sum [N]).
    """
    N = rays_o.shape[0]
    bound = render_cfg.bound
    aabb = jnp.array([-bound] * 3 + [bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb,
                                     render_cfg.min_near)
    nears = nears[:, None]
    fars = fars[:, None]

    k1, k2, k3 = jax.random.split(key, 3)
    z = jnp.linspace(0.0, 1.0, num_steps)[None, :]
    z_vals = nears + (fars - nears) * z  # [N, T]
    sample_dist = (fars - nears) / num_steps
    if perturb:
        z_vals = z_vals + (jax.random.uniform(k1, z_vals.shape) - 0.5) \
            * sample_dist

    def query_density(zv):
        xyz = rays_o[:, None, :] + rays_d[:, None, :] * zv[..., None]
        xyz = jnp.clip(xyz, -bound, bound)
        out = nerf_density(params, model_cfg, xyz.reshape(-1, 3))
        T = zv.shape[1]
        return (out["sigma"].reshape(N, T),
                out["geo_feat"].reshape(N, T, -1), xyz)

    sigmas, geo, xyzs = query_density(z_vals)

    if upsample_steps > 0:
        # importance sampling on the coarse weights (renderer.py:172-196)
        deltas = jnp.diff(z_vals, axis=-1)
        deltas = jnp.concatenate(
            [deltas, jnp.broadcast_to(sample_dist, deltas[..., :1].shape)],
            -1)
        sd = jax.lax.stop_gradient(sigmas) * render_cfg.density_scale * deltas
        csum = jnp.cumsum(sd, -1)
        weights = (1.0 - jnp.exp(-sd)) * jnp.exp(-(csum - sd))
        z_mid = z_vals[..., :-1] + 0.5 * deltas[..., :-1]
        new_z = sample_pdf(k2, z_mid, weights[:, 1:-1], upsample_steps,
                           det=not training)
        new_z = jax.lax.stop_gradient(new_z)
        new_sig, new_geo, new_xyz = query_density(new_z)

        z_vals = jnp.concatenate([z_vals, new_z], axis=1)
        order = jnp.argsort(z_vals, axis=1)
        z_vals = jnp.take_along_axis(z_vals, order, axis=1)
        sigmas = jnp.take_along_axis(
            jnp.concatenate([sigmas, new_sig], axis=1), order, axis=1)
        geo = jnp.take_along_axis(
            jnp.concatenate([geo, new_geo], axis=1), order[..., None], axis=1)
        xyzs = jnp.take_along_axis(
            jnp.concatenate([xyzs, new_xyz], axis=1), order[..., None], axis=1)

    T_total = z_vals.shape[1]
    deltas = jnp.diff(z_vals, axis=-1)
    deltas = jnp.concatenate(
        [deltas, jnp.broadcast_to(sample_dist, deltas[..., :1].shape)], -1)
    sd = sigmas * render_cfg.density_scale * deltas
    csum = jnp.cumsum(sd, -1)
    weights = (1.0 - jnp.exp(-sd)) * jnp.exp(-(csum - sd))  # [N, T]

    dirs = jnp.broadcast_to(rays_d[:, None, :], (N, T_total, 3))
    rgbs = nerf_color(params, model_cfg, dirs.reshape(-1, 3),
                      geo.reshape(N * T_total, -1)).reshape(N, T_total, 3)

    weights_sum = jnp.sum(weights, -1)
    # the reference's run() composites absolute z then normalizes by
    # [near, far] at the caller (renderer.py:247-252 equivalent behavior)
    depth = jnp.sum(weights * z_vals, -1)
    image = jnp.sum(weights[..., None] * rgbs, axis=1)
    bg = _background(params, model_cfg, rays_o, rays_d, bg_color)
    image = image + (1.0 - weights_sum)[:, None] * bg
    return {"image": image, "depth": depth, "weights_sum": weights_sum,
            "nears": nears[:, 0], "fars": fars[:, 0]}
