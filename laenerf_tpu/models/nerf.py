"""Instant-NGP-style NeRF network as a functional pytree.

TPU-native equivalent of the reference's NeRFNetwork
(/root/reference/nerf/network.py:10-206): hash encoding -> 2-layer sigma MLP
-> trunc_exp density + geometric feature; SH(dir) ++ geo-feature -> 3-layer
color MLP -> sigmoid; optional background net on sphere coords with its own
small hash grid. Parameters live in a plain dict pytree; all applies are
pure functions (jit/pjit/grad friendly).
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.activation import trunc_exp
from ..ops.hashgrid import HashGridSpec, hashgrid_encode, hashgrid_init
from ..ops.sh import sh_encode, sh_output_dim
from .mlp import mlp_apply, mlp_init


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    """Static model configuration (defaults match nerf/network.py:11-24)."""

    bound: float = 1.0
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    sh_degree: int = 4
    bg_radius: float = -1.0
    density_scale: float = 1.0
    # hash encoder (defaults: gridencoder/grid.py:97, desired res 2048*bound)
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    paired_gather: bool = False  # TPU row-gather optimization (ops/hashgrid)
    # default layout: all 8 cell corners in one gathered row, fetched in
    # bf16 (XLA row gathers are byte-bound; the reference's -O mode likewise
    # stores tables at half precision, gridencoder/grid.py:119)
    octo_gather: bool = True
    gather_dtype: str = "bf16"  # "bf16" halves byte-bound gather traffic

    @property
    def grid_spec(self) -> HashGridSpec:
        return HashGridSpec.create(
            desired_resolution=2048 * self.bound,
            num_levels=self.num_levels,
            level_dim=self.level_dim,
            base_resolution=self.base_resolution,
            log2_hashmap_size=self.log2_hashmap_size,
            paired_gather=self.paired_gather,
            octo_gather=self.octo_gather,
            gather_dtype=self.gather_dtype,
        )

    @property
    def bg_grid_spec(self) -> HashGridSpec:
        # smaller 2D hashgrid for the background (nerf/network.py:74)
        return HashGridSpec.create(
            desired_resolution=2048,
            input_dim=2,
            num_levels=4,
            level_dim=2,
            base_resolution=16,
            log2_hashmap_size=19,
        )

    @property
    def in_dim(self) -> int:
        return self.grid_spec.output_dim

    @property
    def in_dim_dir(self) -> int:
        return sh_output_dim(self.sh_degree)


def nerf_init(key, cfg: NeRFConfig):
    """Initialise all parameters as a dict pytree."""
    keys = jax.random.split(key, 6)
    sigma_dims = [cfg.in_dim] + [cfg.hidden_dim] * (cfg.num_layers - 1) + [
        1 + cfg.geo_feat_dim
    ]
    color_dims = [cfg.in_dim_dir + cfg.geo_feat_dim] + [cfg.hidden_dim_color] * (
        cfg.num_layers_color - 1
    ) + [3]

    params = {
        "encoder": hashgrid_init(keys[0], cfg.grid_spec),
        "sigma_net": mlp_init(keys[1], sigma_dims),
        "color_net": mlp_init(keys[2], color_dims),
    }
    if cfg.bg_radius > 0:
        bg_dims = [cfg.bg_grid_spec.output_dim + cfg.in_dim_dir] + [
            cfg.hidden_dim_bg
        ] * (cfg.num_layers_bg - 1) + [3]
        params["encoder_bg"] = hashgrid_init(keys[3], cfg.bg_grid_spec)
        params["bg_net"] = mlp_init(keys[4], bg_dims)
    return params


def nerf_density(params, cfg: NeRFConfig, x):
    """sigma + geo features (nerf/network.py:126-143).

    Args:
      x: [N, 3] in [-bound, bound].
    Returns:
      dict(sigma=[N], geo_feat=[N, geo_feat_dim]).
    """
    # "encoder_view" is an optional prebuilt octo view injected by render
    # paths so per-round/per-chunk evals skip the view rebuild (ops/hashgrid)
    feats = hashgrid_encode(params["encoder"], x, cfg.grid_spec,
                            bound=cfg.bound,
                            view=params.get("encoder_view"))
    h = mlp_apply(params["sigma_net"], feats)
    sigma = trunc_exp(h[..., 0])
    return {"sigma": sigma, "geo_feat": h[..., 1:]}


def nerf_color(params, cfg: NeRFConfig, d, geo_feat):
    """Directional color head (nerf/network.py:163-191)."""
    d_enc = sh_encode(d, cfg.sh_degree)
    h = jnp.concatenate([d_enc, geo_feat], axis=-1)
    h = mlp_apply(params["color_net"], h)
    return jax.nn.sigmoid(h)


def nerf_forward(params, cfg: NeRFConfig, x, d):
    """Full forward (nerf/network.py:95-124).

    Args:
      x: [N, 3] positions in [-bound, bound].
      d: [N, 3] unit view directions.
    Returns:
      sigma [N], rgb [N, 3].
    """
    dens = nerf_density(params, cfg, x)
    rgb = nerf_color(params, cfg, d, dens["geo_feat"])
    return dens["sigma"], rgb


def nerf_background(params, cfg: NeRFConfig, sph, d):
    """Background color from sphere coords (nerf/network.py:145-160).

    Args:
      sph: [N, 2] in [-1, 1]; d: [N, 3] unit directions.
    Returns:
      [N, 3] rgb.
    """
    h = hashgrid_encode(params["encoder_bg"], sph, cfg.bg_grid_spec, bound=1.0)
    d_enc = sh_encode(d, cfg.sh_degree)
    h = jnp.concatenate([d_enc, h], axis=-1)
    h = mlp_apply(params["bg_net"], h)
    return jax.nn.sigmoid(h)
