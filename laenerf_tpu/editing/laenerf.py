"""LAENeRF: the palette-based local appearance editing model.

TPU-native equivalent of the reference's LAENeRF
(/root/reference/editing/style_encoder.py:20-256): a hash-grid encoder over
ray-termination points feeding (a) a weight net -> softmax barycentric
palette weights and (b) an offset net (optionally with an SH direction
encoding) -> tanh view-dependent offsets; colors are
clamp(weights @ palette + offset, 0, 1). A learnable [K, 3] palette with an
activity mask supports pruning and user recoloring.

The reference's tinycudann FullyFusedMLPs are plain jitted bf16 MLP chains
here (see models/mlp.py). The dynamic `active_palets` boolean indexing
becomes a masked softmax (inactive logits -> -inf) so shapes stay static
under jit.
"""

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.mlp import mlp_apply, mlp_init
from ..ops.hashgrid import HashGridSpec, hashgrid_encode, hashgrid_init
from ..ops.sh import sh_encode, sh_output_dim


@dataclasses.dataclass(frozen=True)
class LAENeRFConfig:
    bound: float = 1.0
    num_layers: int = 3
    hidden_dim: int = 64
    num_palette_bases: int = 8
    dir_degree: int = 3  # SH degree for the offset net (0 = no dir input)
    # hash encoder (same config as the NeRF's, style_encoder.py:36-38)
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    # TPU row-gather layout (ops/hashgrid): halves encoder gather rows;
    # measured 317 -> 217 ms/style-step on the 800x800 recolor workload
    paired_gather: bool = True
    # one [8C]-row gather per (sample, level): 4x fewer rows than paired
    # in the forward and 4x fewer scatter rows in the backward (ops/hashgrid)
    octo_gather: bool = True
    gather_dtype: str = "bf16"  # byte-bound gathers: half the traffic

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
    def in_dim(self) -> int:
        return self.grid_spec.output_dim

    @property
    def in_dim_dir(self) -> int:
        return sh_output_dim(self.dir_degree) if self.dir_degree > 0 else 0


def laenerf_init(key, cfg: LAENeRFConfig, color_palette=None):
    """Initialise parameters. The palette starts U(0,1) random
    (style_encoder.py:49) unless given. Returns (params, active_mask)."""
    keys = jax.random.split(key, 4)
    K = cfg.num_palette_bases
    hidden = [cfg.hidden_dim] * (cfg.num_layers - 1)
    params = {
        "encoder": hashgrid_init(keys[0], cfg.grid_spec),
        "weight_net": mlp_init(keys[1], [cfg.in_dim] + hidden + [K]),
        "offset_net": mlp_init(
            keys[2], [cfg.in_dim + cfg.in_dim_dir] + hidden + [3]
        ),
        "palette": (jnp.asarray(color_palette, jnp.float32)
                    if color_palette is not None
                    else jax.random.uniform(keys[3], (K, 3))),
    }
    active = jnp.ones((K,), bool)
    return params, active


def _encode(params, cfg: LAENeRFConfig, x):
    return hashgrid_encode(params["encoder"], x, cfg.grid_spec,
                           bound=cfg.bound)


def laenerf_weights(params, cfg: LAENeRFConfig, x, active):
    """Softmax palette weights over active bases (style_encoder.py:93-96)."""
    feats = _encode(params, cfg, x)
    logits = mlp_apply(params["weight_net"], feats)
    logits = jnp.where(active[None, :], logits, -jnp.inf)
    return jax.nn.softmax(logits, axis=-1)


def laenerf_offsets(params, cfg: LAENeRFConfig, x, d):
    """Raw offsets (style_encoder.py:98-108; tanh applied by callers)."""
    feats = _encode(params, cfg, x)
    if cfg.dir_degree > 0 and d is not None:
        feats = jnp.concatenate([feats, sh_encode(d, cfg.dir_degree)], -1)
    return mlp_apply(params["offset_net"], feats)


@partial(jax.jit, static_argnames=("cfg",))
def laenerf_forward_train(params, cfg: LAENeRFConfig, x, d, active,
                          palette_override=None):
    """Full forward (style_encoder.py:135-158).

    Args:
      x: [N, 3] termination points in [-bound, bound].
      d: [N, 3] unit directions (or None when dir_degree == 0).
      active: [K] bool palette activity mask.
      palette_override: optional [K, 3] palette replacing the learned one
        (used at distillation time with the user-modified palette).
    Returns:
      colors [N, 3] in [0, 1], weights [N, K], offsets [N, 3].
    """
    feats = _encode(params, cfg, x)
    offset_in = feats
    if cfg.dir_degree > 0 and d is not None:
        offset_in = jnp.concatenate([feats, sh_encode(d, cfg.dir_degree)], -1)

    logits = mlp_apply(params["weight_net"], feats)
    logits = jnp.where(active[None, :], logits, -jnp.inf)
    w_hat = jax.nn.softmax(logits, axis=-1)
    o_hat = jnp.tanh(mlp_apply(params["offset_net"], offset_in))

    palette = palette_override if palette_override is not None else params["palette"]
    colors = w_hat @ palette + o_hat
    return jnp.clip(colors, 0.0, 1.0), w_hat, o_hat


def prune_palette(params, cfg: LAENeRFConfig, active, x_term_views,
                  thresh: float = 0.025, valid_views=None):
    """distill_color_palettes (style_encoder.py:160-172): deactivate bases
    whose mean weight over sampled views falls below thresh.

    Args:
      x_term_views: list of [Ni, 3] termination-point arrays (sampled views).
      valid_views: optional matching list of [Ni] masks. Padded x_term rows
        are all-zero and would bias the mean toward whichever basis owns the
        origin, so they must be excluded from the per-view mean.
    Returns new active mask [K] bool.
    """
    mean_w = jnp.zeros((cfg.num_palette_bases,))
    for i, x in enumerate(x_term_views):
        w = laenerf_weights(params, cfg, jnp.asarray(x), active)
        if valid_views is not None:
            v = jnp.asarray(valid_views[i]).astype(w.dtype)[:, None]
            mean_w = mean_w + (jnp.sum(w * v, axis=0)
                               / jnp.maximum(jnp.sum(v), 1.0))
        else:
            mean_w = mean_w + jnp.mean(w, axis=0)
    mean_w = mean_w / len(x_term_views)
    return mean_w >= thresh


class LAENeRFLosses:
    """Regularization losses (style_encoder.py:188-238), as static methods.

    All reductions match the reference (sums, not means, where it sums).
    """

    @staticmethod
    def weights(pred_weights, uniform_w: float, non_uniform_w: float,
                valid=None):
        """uniform: minimize the largest per-base column sum; non-uniform:
        push each point's max weight toward 1 (style_encoder.py:188-193).
        `valid` masks padded rows out of both reductions."""
        if valid is None:
            valid = jnp.ones(pred_weights.shape[:1], pred_weights.dtype)
        v = valid[:, None].astype(pred_weights.dtype)
        uniform_loss = jnp.max(jnp.sum(pred_weights * v, axis=0))
        non_uniform_loss = jnp.sum(
            (1.0 - jnp.max(pred_weights, axis=-1)) * valid
        )
        return uniform_loss * uniform_w + non_uniform_loss * non_uniform_w

    @staticmethod
    def palette(palette, active, valid_w: float, distinct_w: float):
        """Out-of-gamut penalty + pairwise distinctness
        (style_encoder.py:195-202)."""
        dists = jnp.sum(
            (palette[:, None, :] - palette[None, :, :]) ** 2, axis=-1
        )
        dist_loss = jnp.mean(1.0 - dists / jnp.maximum(jnp.max(dists), 1e-8))
        valid_loss = jnp.sum(jnp.floor(palette) * palette)
        return valid_loss * valid_w + dist_loss * distinct_w

    @staticmethod
    def offsets(pred_offsets, w: float):
        return jnp.sum(pred_offsets ** 2) * w

    @staticmethod
    def tv(img):
        """Plain TV on a [C, H, W]-style image (style_encoder.py:207-210:
        dim-1 and last-dim differences)."""
        w_var = jnp.sum((img[:, :-1, :] - img[:, 1:, :]) ** 2)
        v_var = jnp.sum((img[..., :-1] - img[..., 1:]) ** 2)
        return w_var + v_var

    @staticmethod
    def depth_discontinuity(img, depth_v_var, depth_w_var):
        """Negative loss encouraging color edges at depth+RGB edges
        (style_encoder.py:212-219)."""
        dv = depth_v_var / jnp.maximum(jnp.max(depth_v_var), 1e-8)
        dw = depth_w_var / jnp.maximum(jnp.max(depth_w_var), 1e-8)
        w_var = (img[:, :-1, :] - img[:, 1:, :]) ** 2 * dw[None]
        v_var = (img[..., :-1] - img[..., 1:]) ** 2 * dv[None]
        return -jnp.sum(w_var) - jnp.sum(v_var)

    @staticmethod
    def tv_depth_weighted(img, depth_v_var, depth_w_var, weights_trans=None):
        """TV weighted away from depth edges (style_encoder.py:221-231)."""
        if weights_trans is not None:
            dv = (1.0 - depth_v_var) * (1.0 - weights_trans[:, 1:])
            dw = (1.0 - depth_w_var) * (1.0 - weights_trans[1:, :])
        else:
            dv = 1.0 - depth_v_var
            dw = 1.0 - depth_w_var
        w_var = jnp.sum((img[:, :-1, :] - img[:, 1:, :]) ** 2 * dw[None])
        v_var = jnp.sum((img[..., :-1] - img[..., 1:]) ** 2 * dv[None])
        return w_var + v_var

    @staticmethod
    def smooth_transition(ref_img, img, transition_weights):
        """Pull colors toward the frozen NeRF in the transition shell
        (style_encoder.py:233-235)."""
        diff = jnp.sum((img - ref_img) ** 2, axis=-1)
        return jnp.sum(diff * transition_weights)

    @staticmethod
    def intensity(ref_img, img):
        return jnp.sum(
            (jnp.linalg.norm(img, axis=-1) - jnp.linalg.norm(ref_img, axis=-1))
            ** 2
        )
