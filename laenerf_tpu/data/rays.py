"""Ray generation from camera poses.

TPU-native equivalent of the reference's get_rays
(/root/reference/nerf/utils.py:62-153). The host picks pixel indices
(uniform / error-map / patch sampling lives in provider.py); this module is
the jittable part that turns (pose, intrinsics, inds) into rays, so it can
be fused into the train step.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("H", "W"))
def get_rays(pose, intrinsics, inds, H: int, W: int, dir_offset=None):
    """Rays through the given flat pixel indices.

    Args:
      pose: [4, 4] cam2world.
      intrinsics: (fx, fy, cx, cy) array [4].
      inds: [N] int32 flat pixel indices (row-major, i = ind // W cols?) —
        matches the reference's `inds = inds_x * W + inds_y` with inds_x the
        row (vertical) index.
      H, W: image size.
      dir_offset: optional [2] anti-aliasing jitter subtracted from the pixel
        center (the reference's perturb_ray_dirs, utils.py:136-139).
    Returns:
      rays_o, rays_d: [N, 3].
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    row = (inds // W).astype(jnp.float32) + 0.5  # j (vertical)
    col = (inds % W).astype(jnp.float32) + 0.5  # i (horizontal)
    if dir_offset is not None:
        col = col - dir_offset[0]
        row = row - dir_offset[1]
    xs = (col - cx) / fx
    ys = (row - cy) / fy
    zs = jnp.ones_like(xs)
    d = jnp.stack([xs, ys, zs], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = d @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def pixel_rays(pose, intrinsics, H: int, W: int, dir_offset=None):
    """Rays for every pixel of an HxW image (eval path)."""
    inds = jnp.arange(H * W, dtype=jnp.int32)
    return get_rays(pose, intrinsics, inds, H, W, dir_offset)


_TILE_ORDER_CACHE = {}


def tile_raster_order(H: int, W: int, tile: int = 128):
    """Pixel permutation grouping HxW into tile x tile blocks (row-major
    within and across tiles).

    Rendering chunks in tile order instead of scanline order makes every
    chunk spatially coherent: background tiles retire after one march
    round and object tiles share termination depth, so the lockstep
    while_loop wastes far fewer events on the slowest ray (the batched
    analogue of the reference's alive-ray compaction benefit). Returns
    (order, inverse) int32 arrays of length H*W.
    """
    key = (H, W, tile)
    if key not in _TILE_ORDER_CACHE:
        idx = np.arange(H * W, dtype=np.int32).reshape(H, W)
        blocks = []
        for ty in range(0, H, tile):
            for tx in range(0, W, tile):
                blocks.append(idx[ty:ty + tile, tx:tx + tile].reshape(-1))
        order = np.concatenate(blocks)
        inv = np.empty_like(order)
        inv[order] = np.arange(H * W, dtype=np.int32)
        _TILE_ORDER_CACHE[key] = (order, inv)
    return _TILE_ORDER_CACHE[key]
