"""Data-parallel rendering over the device mesh.

Equivalent of the reference's eval-time collectives (dist.all_gather of
preds/depths, nerf/utils.py:1555-1570): pixels of a full-image render are
sharded across the 'data' mesh axis; each device runs the inference
while_loop on its shard and the host gathers the result (device_get of a
sharded array performs the all-gather).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.rays import pixel_rays
from ..models.renderer import render_rays_infer


def dp_render_image(mesh, params, occupancy, pose, intrinsics, H, W, *,
                    model_cfg, render_cfg, bg_color=1.0, key=None):
    """Render one HxW image with rays sharded over the mesh.

    Returns (image [H, W, 3], depth [H, W]) as NumPy arrays.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    rays_o, rays_d = pixel_rays(jnp.asarray(pose), jnp.asarray(intrinsics),
                                H, W)
    n = H * W
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    if pad:
        rays_o = jnp.concatenate([rays_o, rays_o[:pad]], axis=0)
        rays_d = jnp.concatenate([rays_d, rays_d[:pad]], axis=0)

    shard = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    rays_o = jax.device_put(rays_o, shard)
    rays_d = jax.device_put(rays_d, shard)
    params = jax.tree.map(lambda x: jax.device_put(x, rep), params)
    occupancy = jax.device_put(occupancy, rep)
    spec = model_cfg.grid_spec
    if spec.octo_gather and "encoder_view" not in params:
        # one replicated view build per image (ops/hashgrid.octo_view)
        from ..ops.hashgrid import octo_view_jit
        params = dict(params, encoder_view=octo_view_jit(params["encoder"],
                                                         spec=spec))

    out = render_rays_infer(params, occupancy, rays_o, rays_d, key,
                            model_cfg=model_cfg, render_cfg=render_cfg,
                            bg_color=bg_color)
    image = np.asarray(out["image"])[:n].reshape(H, W, 3)
    depth = np.asarray(out["depth"])[:n].reshape(H, W)
    return image, depth
