"""Occupancy (density) grid state and its update rules.

TPU-native equivalent of the reference's density-grid machinery
(/root/reference/nerf/renderer.py:482-647): cascaded 128^3 density grid,
EMA updates (full recompute for the first 16 updates, random+occupied
partial sampling after), threshold min(mean_density, density_thresh), and
mark_untrained_grid camera-visibility culling.

Redesigns for XLA:
  * The grid is stored in plain (cascade, x, y, z) layout — the marching
    lookup is a single gather, no morton codes on the hot path (the
    reference's morton layout is a CUDA cache trick; ops/morton.py provides
    conversion for serialization parity).
  * "Random occupied cells" sampling (renderer.py:601-609) is done with a
    cumsum + searchsorted draw instead of torch.nonzero (dynamic shapes).
  * The state is an explicit pytree threaded through jitted update fns.
"""

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OccupancyState:
    density_grid: jax.Array  # [CAS, H, H, H] fp32; -1 marks untrained cells
    occupancy: jax.Array  # [CAS, H, H, H] uint8 bitfield (unpacked)
    mean_density: jax.Array  # scalar fp32
    iter_density: jax.Array  # scalar int32


def occupancy_init(cascades: int, grid_size: int = 128) -> OccupancyState:
    H = grid_size
    return OccupancyState(
        density_grid=jnp.zeros((cascades, H, H, H), jnp.float32),
        occupancy=jnp.zeros((cascades, H, H, H), jnp.uint8),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
    )


def _cell_world_coords(coords, cas: int, bound: float, grid_size: int, key):
    """Grid coords [N, 3] -> jittered world positions for a cascade
    (renderer.py:585-590)."""
    H = grid_size
    cas_bound = min(2.0 ** cas, bound)
    half = cas_bound / H
    xyz = 2.0 * coords.astype(jnp.float32) / (H - 1) - 1.0
    xyz = xyz * (cas_bound - half)
    noise = jax.random.uniform(key, xyz.shape, minval=-half, maxval=half)
    return xyz + noise


def _all_coords(grid_size: int):
    H = grid_size
    r = jnp.arange(H, dtype=jnp.int32)
    gx, gy, gz = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], axis=-1)


def _finish_update(state: OccupancyState, tmp_grid, density_thresh: float,
                   decay: float) -> OccupancyState:
    """EMA + threshold + re-threshold bitfield (renderer.py:633-647)."""
    grid = state.density_grid
    valid = (grid >= 0) & (tmp_grid >= 0)
    grid = jnp.where(valid, jnp.maximum(grid * decay, tmp_grid), grid)
    mean_density = jnp.mean(jnp.clip(grid, min=0.0))
    thresh = jnp.minimum(mean_density, density_thresh)
    occupancy = (grid > thresh).astype(jnp.uint8)
    return OccupancyState(
        density_grid=grid,
        occupancy=occupancy,
        mean_density=mean_density,
        iter_density=state.iter_density + 1,
    )


def update_occupancy_full(state: OccupancyState, density_fn, key, *,
                          bound: float, density_scale: float = 1.0,
                          density_thresh: float = 0.01, decay: float = 0.95,
                          chunk: int = 2 ** 16) -> OccupancyState:
    """Recompute density for every cell of every cascade (renderer.py:567-595).

    Args:
      density_fn: (x [M, 3]) -> sigma [M]; typically a closure over params.
    """
    cas_n, H = state.density_grid.shape[0], state.density_grid.shape[1]
    coords = _all_coords(H)  # [H^3, 3]
    n = coords.shape[0]
    tmp = []
    for cas in range(cas_n):
        key, sub = jax.random.split(key)
        xyz = _cell_world_coords(coords, cas, bound, H, sub)

        def eval_chunk(c):
            return density_fn(c) * density_scale

        sig = jax.lax.map(eval_chunk, xyz.reshape(n // chunk, chunk, 3)
                          if n % chunk == 0 else xyz.reshape(1, n, 3))
        tmp.append(sig.reshape(H, H, H))
    tmp_grid = jnp.stack(tmp, axis=0)
    return _finish_update(state, tmp_grid, density_thresh, decay)


def update_occupancy_partial(state: OccupancyState, density_fn, key, *,
                             bound: float, density_scale: float = 1.0,
                             density_thresh: float = 0.01, decay: float = 0.95,
                             chunk: int = 2 ** 16) -> OccupancyState:
    """Partial update, redesigned for TPU (reference: renderer.py:598-626).

    The reference draws H^3/4 uniform cells + H^3/4 occupied-biased cells
    WITH replacement per cascade. At the ~2% steady-state occupancy that
    revisits each occupied cell ~12x per update, and the categorical draw
    costs a full-grid cdf + a 0.5M-row searchsorted. Redesign (measured
    163 -> ~60 ms/update on v5e at H=128, cascades=1):

      * stratified sweep (uniform part): one of the 8 interleaved 2x2x2
        sub-lattices, rotating with iter_density — H^3/8 cells per update
        with a GUARANTEED full-grid refresh every 8 updates (random draws
        need ~3x more evals for the same worst-case coverage, and pruning
        speed is set by coverage: a stale cell only decays when sampled).
      * occupied refresh: a rotating window over the occupied set, each
        cell visited AT MOST ONCE per update (capacity H^3/16, compacted
        scatter-free via ops/compaction). Same intent as the reference's
        biased draw — keep the cells the march reads fresh — without the
        with-replacement oversampling.

    Cells sampled by both parts just write twice (last jitter wins),
    exactly like the reference's duplicate draws.
    """
    from ..ops.compaction import compact_samples

    cas_n, H = state.density_grid.shape[0], state.density_grid.shape[1]
    n_cells = H ** 3
    cap_o = max(n_cells // 16, 8)
    tmp_grid = -jnp.ones_like(state.density_grid)

    # rotating 2x2x2 sub-lattice phase (traced: iter_density is an array)
    phase = state.iter_density % 8
    dx, dy, dz = phase & 1, (phase >> 1) & 1, (phase >> 2) & 1
    m = H // 2
    r = jnp.arange(m, dtype=jnp.int32)
    gx, gy, gz = jnp.meshgrid(r, r, r, indexing="ij")
    sweep_coords = jnp.stack(
        [2 * gx.reshape(-1) + dx, 2 * gy.reshape(-1) + dy,
         2 * gz.reshape(-1) + dz], axis=-1)  # [H^3/8, 3]
    sweep_flat = ((sweep_coords[:, 0] * H + sweep_coords[:, 1]) * H
                  + sweep_coords[:, 2])

    for cas in range(cas_n):
        key, k3 = jax.random.split(key)
        # rotating at-most-once window over the occupied set
        occ_mask = state.density_grid[cas].reshape(-1) > 0
        rank = jnp.cumsum(occ_mask.astype(jnp.int32)) - 1  # [H^3]
        total = jnp.maximum(rank[-1] + 1, 1)
        start = (state.iter_density * cap_o) % total
        win = occ_mask & (jnp.mod(rank - start, total) < cap_o)
        # scatter-free compaction of the window's flat cell ids
        gidx, gmask, _ = compact_samples(win.reshape(n_cells // H, H), cap_o)
        occ_coords = jnp.stack(
            [gidx // (H * H), (gidx // H) % H, gidx % H], axis=-1)
        # masked slots write to a dumpster row past the grid
        occ_flat = jnp.where(gmask, gidx, n_cells).astype(jnp.int32)

        coords = jnp.concatenate([sweep_coords, occ_coords], axis=0)
        xyz = _cell_world_coords(coords, cas, bound, H, k3)
        n2 = xyz.shape[0]
        if n2 % chunk == 0:
            sig = jax.lax.map(lambda c: density_fn(c) * density_scale,
                              xyz.reshape(n2 // chunk, chunk, 3)).reshape(-1)
        else:
            sig = density_fn(xyz) * density_scale
        flat_idx = jnp.concatenate([sweep_flat, occ_flat], axis=0)
        tmp_cas = jnp.full((n_cells + 1,), -1.0, tmp_grid.dtype).at[
            flat_idx].set(sig)[:n_cells]
        tmp_grid = tmp_grid.at[cas].set(tmp_cas.reshape(H, H, H))

    return _finish_update(state, tmp_grid, density_thresh, decay)


def update_occupancy(state: OccupancyState, density_fn, key, *, bound: float,
                     full: bool, **kw) -> OccupancyState:
    """Dispatch full/partial on a host-side flag (the trainer tracks
    iter_density < 16, renderer.py:567)."""
    if full:
        return update_occupancy_full(state, density_fn, key, bound=bound, **kw)
    return update_occupancy_partial(state, density_fn, key, bound=bound, **kw)


@partial(jax.jit, static_argnames=("bound", "grid_size", "min_near",
                                   "filter_close_point", "cascades"))
def mark_untrained_grid(density_grid, poses, intrinsics, *, bound: float,
                        cascades: int, grid_size: int = 128,
                        min_near: float = 0.2,
                        filter_close_point: bool = False):
    """Mark cells invisible from every training camera as -1
    (renderer.py:482-554).

    Args:
      density_grid: [CAS, H, H, H].
      poses: [B, 4, 4] cam2world.
      intrinsics: (fx, fy, cx, cy).
    Returns:
      updated density_grid.
    """
    H = grid_size
    fx, fy, cx, cy = intrinsics
    coords = _all_coords(H)  # [H^3, 3]
    world = 2.0 * coords.astype(jnp.float32) / (H - 1) - 1.0  # [-1, 1]

    rot = poses[:, :3, :3]  # [B, 3, 3]
    trans = poses[:, :3, 3]  # [B, 3]

    new_grid = []
    for cas in range(cascades):
        cas_bound = min(2.0 ** cas, bound)
        half = cas_bound / H
        pts = world * (cas_bound - half)  # [H^3, 3]

        def count_chunk(p):
            # p: [C, 3] -> visibility count over all cameras
            rel = p[None, :, :] - trans[:, None, :]  # [B, C, 3]
            cam = jnp.einsum("bcd,bde->bce", rel, rot)  # world2cam (R^T ok
            # since einsum contracts rel @ R, matching renderer.py:528-529)
            z = cam[..., 2]
            mask_z = z > 0
            mask_x = jnp.abs(cam[..., 0]) < cx / fx * z + half * 2
            mask_y = jnp.abs(cam[..., 1]) < cy / fy * z + half * 2
            vis = mask_z & mask_x & mask_y
            close = vis & (z < min_near)
            if filter_close_point:
                close = close | (jnp.linalg.norm(cam, axis=-1) < min_near)
            return jnp.sum(vis, axis=0), jnp.sum(close, axis=0)

        n = pts.shape[0]
        chunk = 2 ** 15
        counts, closes = jax.lax.map(
            count_chunk, pts.reshape(n // chunk, chunk, 3)
        )
        count = counts.reshape(-1) * (closes.reshape(-1) == 0)
        grid_cas = jnp.where(
            count.reshape(H, H, H) == 0, -1.0, density_grid[cas]
        )
        new_grid.append(grid_cas)
    return jnp.stack(new_grid, axis=0)
