"""Raster-built per-ray sample streams: the march without march gathers.

TPU-native replacement for the inference-path ray march on camera frames.
The reference's alive-ray march (raymarching.cu:714-800) — and our event
scan — discovers each ray's samples by serialized occupancy lookups, whose
per-lookup cost (~8-9 ns on v5e, batched or not) is the measured render
floor. But at render time the full sample set is *known* from geometry
alone: a sample is a lattice point t0 + k*dt whose grid cell is occupied.
So instead of asking the grid once per event per ray, this module inverts
the loop over the (few, ~2% occupancy) occupied cells:

  1. project every occupied cell's AABB into the camera, take a
     conservative pixel bbox (+1 px margin over the corner hull);
  2. expand cell bboxes into (cell, pixel) pairs by prefix-sum rank
     expansion (exact, no per-cell padding);
  3. per pair, run the exact ray/cell slab test and emit the lattice
     indices k inside the intersection (<= ceil(sqrt3*cell/dt)+1 per pair);
  4. one radix sort of packed (ray << KBITS | k) keys yields every ray's
     ordered sample list; searchsorted gives per-ray (base, count).

Rendering rounds then just *pop* the next K keys per alive ray — the only
per-sample lookup left is the one the compacted network eval already pays.
Each lattice point lies in exactly one cell, so the stream reproduces the
event-scan sample sequence exactly (tests/test_raster_stream.py).

Requires dt_gamma == 0 and cascades == 1 (the same lattice precondition as
the packed-window march) and a pinhole camera (get_rays convention).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .raymarch import MarchConfig, lattice_march_supported


@dataclasses.dataclass(frozen=True)
class StreamCaps:
    """Static capacities for the stream builder. Overflow sets ok=False in
    the result; the caller falls back to the march path for that frame."""

    cells: int = 1 << 17  # occupied-cell capacity (2% of 128^3 ~= 42k)
    pairs: int = 1 << 21  # (cell, pixel) pair capacity
    samples_per_pair: int = 3  # ceil(sqrt3 * cell / dt) + 1 for the config


def samples_per_pair(cfg: MarchConfig) -> int:
    cell = 2.0 * min(1.0, cfg.bound) / cfg.grid_size
    return int(jnp.ceil(1.7320508 * cell / cfg.dt_min)) + 1


def kbits_for(cfg: MarchConfig) -> int:
    # k counts dt steps from the per-ray near; the whole AABB diagonal is
    # 2*sqrt(3)*bound = max_steps * dt * bound, so k < max_steps * bound + 2
    n = int(cfg.max_steps * max(cfg.bound, 1.0)) + 2
    return max(1, (n - 1).bit_length())


@partial(jax.jit, static_argnames=("H", "W", "cfg", "caps", "min_near"))
def build_sample_stream(occupancy, pose, intrinsics, H: int, W: int,
                        cfg: MarchConfig, caps: StreamCaps,
                        min_near: float = 0.2):
    """Build the frame's sorted sample-key stream.

    Returns dict(keys [caps.pairs * S] int32 sorted, base [H*W] int32,
    count [H*W] int32, ok bool scalar). Keys pack (ray << KBITS) | k;
    invalid slots hold INT32_MAX and sort to the tail.
    """
    assert lattice_march_supported(cfg)
    S = caps.samples_per_pair
    KBITS = kbits_for(cfg)
    # packed (ray << KBITS | k) must fit int32
    assert (H * W + 1) << KBITS < 2 ** 31, (H, W, KBITS)
    dt = cfg.dt_min
    mb = min(1.0, cfg.bound)
    Hg = cfg.grid_size
    cell_w = 2.0 * mb / Hg
    fx, fy, cx, cy = (intrinsics[0], intrinsics[1], intrinsics[2],
                      intrinsics[3])
    rot = pose[:3, :3]
    cam_t = pose[:3, 3]

    # -- 1. occupied cells ------------------------------------------------
    occ_flat = occupancy.reshape(-1) > 0  # single cascade
    (cell_ids,) = jnp.nonzero(occ_flat, size=caps.cells, fill_value=0)
    n_cells = jnp.sum(occ_flat)
    cell_ok = jnp.arange(caps.cells) < n_cells

    cz = cell_ids % Hg
    cy_ = (cell_ids // Hg) % Hg
    cx_ = cell_ids // (Hg * Hg)
    lo = (jnp.stack([cx_, cy_, cz], -1).astype(jnp.float32) * cell_w - mb)
    # [C, 8, 3] corners
    bits = jnp.asarray([[(c >> d) & 1 for d in range(3)] for c in range(8)],
                       jnp.float32)
    corners = lo[:, None, :] + bits[None, :, :] * cell_w

    # -- 2. conservative pixel bboxes ------------------------------------
    cam = jnp.einsum("csd,ed->cse", corners - cam_t[None, None, :], rot.T)
    # get_rays: d_cam = ((i+.5-cx)/fx, (j+.5-cy)/fy, 1) -> u = fx X/Z + cx
    Z = cam[..., 2]
    behind = jnp.any(Z < 1e-3, axis=1)
    Zs = jnp.maximum(Z, 1e-3)
    u = fx * cam[..., 0] / Zs + cx
    v = fy * cam[..., 1] / Zs + cy
    # pixel i covers centers i+0.5: margin 1 px over the corner hull
    u0 = jnp.clip(jnp.floor(jnp.min(u, 1) - 0.5) - 1, 0, W - 1)
    u1 = jnp.clip(jnp.ceil(jnp.max(u, 1) - 0.5) + 1, 0, W - 1)
    v0 = jnp.clip(jnp.floor(jnp.min(v, 1) - 0.5) - 1, 0, H - 1)
    v1 = jnp.clip(jnp.ceil(jnp.max(v, 1) - 0.5) + 1, 0, H - 1)
    offscreen = (jnp.max(u, 1) < 0.5) | (jnp.min(u, 1) > W - 0.5) \
        | (jnp.max(v, 1) < 0.5) | (jnp.min(v, 1) > H - 0.5)
    valid_cell = cell_ok & ~behind & ~offscreen
    bw = jnp.where(valid_cell, (u1 - u0 + 1).astype(jnp.int32), 0)
    bh = jnp.where(valid_cell, (v1 - v0 + 1).astype(jnp.int32), 0)
    area = bw * bh

    # -- 3. rank-expand to (cell, pixel) pairs ---------------------------
    cum = jnp.cumsum(area)
    total_pairs = cum[-1]
    # overflow checks: n_cells beyond the static capacity silently
    # truncates the nonzero() list, and the int32 area cumsum can WRAP for
    # pathological close-up frames — validate the total in f32 (exact
    # comparison matters only near caps.pairs ~ 2^21, well within f32)
    total_f = jnp.cumsum(area.astype(jnp.float32))[-1]
    ok = ((total_f <= caps.pairs) & (n_cells <= caps.cells)
          & ~jnp.any(cell_ok & behind))
    pid = jnp.arange(caps.pairs, dtype=jnp.int32)
    ci = jnp.searchsorted(cum, pid, side="right").astype(jnp.int32)
    ci = jnp.minimum(ci, caps.cells - 1)
    rank = pid - jnp.where(ci > 0, jnp.take(cum, ci - 1), 0)
    p_ok = pid < total_pairs
    bw_p = jnp.maximum(jnp.take(bw, ci), 1)
    du = rank % bw_p
    dv = rank // bw_p
    px = jnp.take(u0.astype(jnp.int32), ci) + du
    py = jnp.take(v0.astype(jnp.int32), ci) + dv
    ray = py * W + px  # flat pixel id (row-major, get_rays convention)

    # -- 4. exact slab tests + lattice emission --------------------------
    # ray direction straight from the get_rays formula (no gathers)
    dcx = (px.astype(jnp.float32) + 0.5 - cx) / fx
    dcy = (py.astype(jnp.float32) + 0.5 - cy) / fy
    d_cam = jnp.stack([dcx, dcy, jnp.ones_like(dcx)], -1)
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    d = d_cam @ rot.T  # [P, 3] world, unit length
    o = cam_t[None, :]

    rd = 1.0 / d
    # per-ray near on the GLOBAL aabb (must match near_far_from_aabb)
    t1g = (-cfg.bound - o) * rd
    t2g = (cfg.bound - o) * rd
    near = jnp.max(jnp.minimum(t1g, t2g), -1)
    farg = jnp.min(jnp.maximum(t1g, t2g), -1)
    miss = near > farg
    near = jnp.maximum(near, min_near)
    # cell box
    c_lo = jnp.take(lo, ci, axis=0)
    t1 = (c_lo - o) * rd
    t2 = (c_lo + cell_w - o) * rd
    t_in = jnp.maximum(jnp.max(jnp.minimum(t1, t2), -1), near)
    t_out = jnp.minimum(jnp.min(jnp.maximum(t1, t2), -1), farg)

    k_lo = jnp.ceil((t_in - near) / dt - 1e-4).astype(jnp.int32)
    k_hi = (jnp.ceil((t_out - near) / dt - 1e-4) - 1).astype(jnp.int32)
    k_lo = jnp.maximum(k_lo, 0)
    n_k = jnp.where(p_ok & ~miss & (t_out > t_in),
                    jnp.clip(k_hi - k_lo + 1, 0, S), 0)

    SENT = jnp.int32(2 ** 31 - 1)
    keys = []
    for s in range(S):
        k = k_lo + s
        good = s < n_k
        keys.append(jnp.where(good, (ray << KBITS) | k, SENT))
    keys = jnp.concatenate(keys)

    # -- 5. one sort; per-ray segments -----------------------------------
    keys = jax.lax.sort(keys)
    ray_ids = jnp.arange(H * W + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(keys, ray_ids << KBITS).astype(jnp.int32)
    base = bounds[:-1]
    count = bounds[1:] - bounds[:-1]
    # k16: the per-sample payload the rounds actually gather. int16 halves
    # the gather operand (v5e row-gather cost is operand-footprint-bound);
    # k < max_steps * bound + 2 always fits. bounds[-1] = #real keys, so
    # the caller can slice the stream to the smallest capacity tier.
    k16 = (keys & ((1 << KBITS) - 1)).astype(jnp.int16)
    return {"keys": keys, "k16": k16, "base": base, "count": count,
            "ok": ok, "total": bounds[-1]}


def slice_stream_payload(stream):
    """Host-side: slice the sorted k16 payload to the smallest power-of-two
    capacity tier holding the real keys. Gather cost is operand-footprint-
    bound on v5e and the sorted tail is all sentinel padding. Syncs once
    (fetches the scalar total)."""
    total = int(stream["total"])
    full = stream["k16"].shape[0]
    tier = 1 << 20
    while tier < total and tier < full:
        tier *= 2
    return stream["k16"][:min(tier, full)]
