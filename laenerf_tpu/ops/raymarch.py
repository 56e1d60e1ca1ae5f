"""Occupancy-grid ray marching, redesigned for XLA/TPU.

TPU-native equivalent of the reference's raymarching CUDA extension
(/root/reference/raymarching/src/raymarching.cu): near/far slab test (:92-156),
background-sphere coords (:163-209), and the occupancy-skipping ray march
(:312-480 march_rays_train, :714-800 march_rays).

Redesign (see SURVEY.md §7): the reference launches one CUDA thread per ray,
runs a data-dependent while loop, and atomically compacts samples into a
ragged [M] buffer. On TPU we instead run a *fixed-length* `lax.scan` over
"march events", vectorized over all rays on the VPU. Each event either takes
a sample (when the occupancy grid is hit) or jumps past the empty voxel.
Outputs are fixed-shape [N, S] sample grids plus validity masks; a cumsum
based per-row compaction packs each ray's samples to the front. The grid is
stored *unpacked* as uint8 [CAS, H, H, H] so the hot lookup is one gather —
no morton bit-twiddling on the critical path (morton/packbits live in
ops/morton.py for parity and serialization).

dt schedule, multi-mip selection (mip_from_pos/mip_from_dt), voxel skip
geometry, and the perturbation of t0 all match the reference. The only
deliberate deviation: an empty-space skip jumps in one closed-form step of
`n * dt` (exact for dt_gamma == 0); for dt_gamma > 0 a short jump simply
triggers another skip event next iteration, so correctness is preserved.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

SQRT3 = 1.7320508075688772


@dataclasses.dataclass(frozen=True)
class MarchConfig:
    """Static marching configuration (hashable; safe as a jit static arg)."""

    bound: float = 1.0
    cascades: int = 1
    grid_size: int = 128
    dt_gamma: float = 0.0
    max_steps: int = 1024  # sets dt_min = 2*sqrt(3)/max_steps
    # scan length == padded sample-grid width S; march events are samples
    # OR empty-space skips, so budget a margin above the expected samples
    march_iters: int = 256

    @property
    def dt_min(self) -> float:
        return 2.0 * SQRT3 / self.max_steps

    @property
    def dt_max(self) -> float:
        return 2.0 * SQRT3 * (2 ** (self.cascades - 1)) / self.grid_size


def near_far_from_aabb(rays_o, rays_d, aabb, min_near: float = 0.2):
    """Ray/AABB slab test (raymarching.cu:92-156).

    Args:
      rays_o, rays_d: [N, 3].
      aabb: [6] (xmin, ymin, zmin, xmax, ymax, zmax).
      min_near: minimum near distance.
    Returns:
      nears, fars: [N]. Missing rays get near == far == a huge value.
    """
    rdir = 1.0 / rays_d  # inf where a component is 0 is fine for slab tests
    t1 = (aabb[:3] - rays_o) * rdir
    t2 = (aabb[3:] - rays_o) * rdir
    tmin = jnp.minimum(t1, t2)
    tmax = jnp.maximum(t1, t2)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    miss = near > far
    big = jnp.finfo(rays_o.dtype).max
    near = jnp.maximum(near, min_near)
    near = jnp.where(miss, big, near)
    far = jnp.where(miss, big, far)
    return near, far


def sph_from_ray(rays_o, rays_d, radius: float):
    """Project rays onto a background sphere (raymarching.cu:163-209).

    Returns [N, 2] (theta, phi) normalized to [-1, 1], y treated as up.
    """
    a = jnp.sum(rays_d * rays_d, axis=-1)
    b = jnp.sum(rays_o * rays_d, axis=-1)
    c = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    t = (-b + jnp.sqrt(jnp.maximum(b * b - a * c, 0.0))) / a
    p = rays_o + t[..., None] * rays_d
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    theta = jnp.arctan2(jnp.sqrt(x * x + z * z), y)  # [0, pi)
    phi = jnp.arctan2(z, x)  # [-pi, pi)
    return jnp.stack([2.0 * theta / jnp.pi - 1.0, phi / jnp.pi], axis=-1)


def _mip_level(x, y, z, dt, cfg: MarchConfig):
    """max(mip_from_pos, mip_from_dt), clamped to [0, cascades-1].

    frexp's exponent (raymarching.cu:42-54) equals floor(log2(v)) + 1 for
    v > 0: [0.5, 1) -> 0, [1, 2) -> 1, ...
    """
    mx_pos = jnp.maximum(jnp.abs(x), jnp.maximum(jnp.abs(y), jnp.abs(z)))
    mx_dt = dt * cfg.grid_size * 0.5

    def frexp_exp(v):
        v = jnp.maximum(v, 1e-30)
        return jnp.floor(jnp.log2(v)).astype(jnp.int32) + 1

    lvl = jnp.maximum(frexp_exp(mx_pos), frexp_exp(mx_dt))
    return jnp.clip(lvl, 0, cfg.cascades - 1)


COARSE_FACTOR = 8  # coarse skip grid is H/8 per axis


def build_coarse_occupancy(occupancy):
    """Max-pool the [CAS, H, H, H] occupancy by COARSE_FACTOR per axis.

    Hierarchical empty-space skipping (in the spirit of VDB-style
    hierarchical ray traversal): one march event can skip a whole empty
    8^3-voxel block instead of a single voxel. A coarse cell is occupied iff
    any fine cell inside it is, so skips never jump over occupied space and
    sample positions are unchanged (skips stay on the dt lattice).
    """
    f = COARSE_FACTOR
    cas, H = occupancy.shape[0], occupancy.shape[1]
    return occupancy.reshape(cas, H // f, f, H // f, f, H // f, f).max(
        axis=(2, 4, 6)
    )


def _march_event(t, rays_o, rays_d, grid_flat, edit_flat, cfg: MarchConfig,
                 coarse_flat=None):
    """One march event per ray: sample if occupied, else skip the fine voxel
    (or the whole coarse block when it is empty).

    Args:
      t: [N] current ray parameter.
      rays_o, rays_d: [N, 3].
      grid_flat: [CAS*H*H*H] uint8 occupancy (density grid bitfield, unpacked).
      edit_flat: optional second grid of the same shape (distill path), or None.
      cfg: static config.
      coarse_flat: optional [CAS*(H/8)^3] uint8 coarse occupancy.
    Returns:
      (t_next, sample) where sample = (ts, dt, occ, edit_occ) all [N].
    """
    H = cfg.grid_size
    bound = cfg.bound
    dt_min, dt_max = cfg.dt_min, cfg.dt_max
    gamma = cfg.dt_gamma
    single_level = cfg.cascades == 1  # static: no mip math needed

    x = jnp.clip(rays_o[:, 0] + t * rays_d[:, 0], -bound, bound)
    y = jnp.clip(rays_o[:, 1] + t * rays_d[:, 1], -bound, bound)
    z = jnp.clip(rays_o[:, 2] + t * rays_d[:, 2], -bound, bound)

    if gamma == 0.0:  # static: constant step (synthetic/llff configs)
        dt = jnp.full_like(t, dt_min)
    else:
        dt = jnp.clip(t * gamma, dt_min, dt_max)

    if single_level:
        level = jnp.zeros_like(t, dtype=jnp.int32)
        mip_bound = jnp.full_like(t, min(1.0, bound))
    else:
        level = _mip_level(x, y, z, dt, cfg)
        mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), bound)
    inv_mb = 1.0 / mip_bound

    def cell(v):
        return jnp.clip(0.5 * (v * inv_mb + 1.0) * H, 0.0, H - 1.0).astype(jnp.int32)

    nx, ny, nz = cell(x), cell(y), cell(z)
    if single_level:
        flat_idx = (nx * H + ny) * H + nz
    else:
        flat_idx = ((level * H + nx) * H + ny) * H + nz
    occ = jnp.take(grid_flat, flat_idx, axis=0) > 0
    edit_occ = (
        jnp.take(edit_flat, flat_idx, axis=0) > 0 if edit_flat is not None
        else jnp.zeros_like(occ)
    )

    rd = 1.0 / rays_d
    sgn = jnp.sign(rays_d)
    pos = jnp.stack([x, y, z], axis=-1)

    def boundary_t(cells, grid_h):
        """Distance to the exit face of the current cell on a grid_h grid."""
        c = cells.astype(jnp.float32)
        tv = (((c + 0.5 + 0.5 * sgn) * (2.0 / grid_h) - 1.0)
              * mip_bound[:, None] - pos) * rd
        return t + jnp.maximum(0.0, jnp.min(tv, axis=-1))

    tt_fine = boundary_t(jnp.stack([nx, ny, nz], -1), H)
    if coarse_flat is not None:
        f = COARSE_FACTOR
        Hc = H // f
        cx, cy, cz = nx // f, ny // f, nz // f
        if single_level:
            cidx = (cx * Hc + cy) * Hc + cz
        else:
            cidx = ((level * Hc + cx) * Hc + cy) * Hc + cz
        occ_c = jnp.take(coarse_flat, cidx, axis=0) > 0
        tt_coarse = boundary_t(jnp.stack([cx, cy, cz], -1), Hc)
        tt = jnp.where(occ_c, tt_fine, tt_coarse)
    else:
        tt = tt_fine

    # jump on the dt lattice (exact for gamma == 0; self-correcting
    # otherwise: a short jump just re-skips next event)
    n_skip = jnp.floor((tt - t) / dt) + 1.0
    t_skip = t + jnp.maximum(n_skip, 1.0) * dt

    t_next = jnp.where(occ, t + dt, t_skip)
    return t_next, (t, dt, occ, edit_occ)


@partial(jax.jit, static_argnames=("cfg", "with_edit"))
def march_rays_train(rays_o, rays_d, occupancy, nears, fars, noises,
                     cfg: MarchConfig, edit_grid=None, with_edit: bool = False):
    """March all rays, producing fixed-shape padded sample grids.

    Equivalent of the reference's two-pass march_rays_train
    (raymarching.cu:312-480) without the count/compact passes: one
    fixed-length scan over march events. The event grid [N, I] *is* the
    padded sample grid — skip events are simply invalid slots (masked in
    compositing, dropped before network eval by ops/compaction.py). This
    avoids the reference's ragged compaction entirely: TPU scatters are
    expensive, and the composite is mask-tolerant anyway.

    The scan is unrolled 2x: each loop iteration is tiny VPU work over [N]
    vectors plus one occupancy gather, so loop-dispatch overhead dominates
    without unrolling (higher unroll factors blow up XLA compile time for
    marginal gain — the train step is gather-bound, not march-bound).

    Args:
      rays_o, rays_d: [N, 3] float32.
      occupancy: [CAS, H, H, H] uint8 density-grid occupancy.
      nears, fars: [N] from near_far_from_aabb.
      noises: [N] in [0, 1) (zeros when not perturbing).
      cfg: static MarchConfig (march_iters == padded sample width S).
      edit_grid: optional [CAS, H, H, H] uint8 second grid (distill path).
      with_edit: static flag; must be True to thread edit_grid.

    Returns dict with:
      ts:    [N, S] sample start t (pre-increment, as the reference samples).
      dts:   [N, S] per-sample dt.
      valid: [N, S] bool sample validity.
      t0:    [N] perturbed march origin (for depth accumulation).
      n_samples: [N] int32 number of valid samples per ray.
      edit_occ: [N, S] bool (all False unless with_edit).
    """
    grid_flat = occupancy.reshape(-1)
    coarse_flat = build_coarse_occupancy(occupancy).reshape(-1)
    edit_flat = edit_grid.reshape(-1) if with_edit else None

    t0 = nears + jnp.clip(nears * cfg.dt_gamma, cfg.dt_min, cfg.dt_max) * noises

    def step(t, _):
        t_next, sample = _march_event(t, rays_o, rays_d, grid_flat, edit_flat,
                                      cfg, coarse_flat)
        # Freeze rays that have left the volume.
        done = t >= fars
        t_next = jnp.where(done, t, t_next)
        ts, dt, occ, eocc = sample
        occ = occ & ~done
        return t_next, (ts, dt, occ, eocc)

    _, (ts, dts, occs, eoccs) = jax.lax.scan(
        step, t0, None, length=cfg.march_iters, unroll=2
    )
    # [I, N] -> [N, I]; the event axis is already t-ordered per ray.
    ts, dts = ts.T, dts.T
    occs, eoccs = occs.T, eoccs.T
    n_samples = jnp.sum(occs, axis=1).astype(jnp.int32)

    return {
        "ts": ts,
        "dts": dts,
        "valid": occs,
        "t0": t0,
        "n_samples": n_samples,
        "edit_occ": eoccs & occs,
    }


def sample_positions(rays_o, rays_d, ts, bound: float):
    """Recompute clamped sample positions from t values (cheaper than storing
    [N, S, 3] through the march). Returns [N, S, 3]."""
    p = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    return jnp.clip(p, -bound, bound)
