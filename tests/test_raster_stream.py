"""Raster-built sample streams vs the serialized event march (ops/raster).

The stream must enumerate EXACTLY the event scan's samples: every lattice
point t0 + k*dt whose grid cell is occupied, in t order, per ray.
"""

import numpy as np
import jax
import jax.numpy as jnp

from laenerf_tpu.data.rays import pixel_rays
from laenerf_tpu.models.renderer import _march_round
from laenerf_tpu.ops.raster import (StreamCaps, build_sample_stream,
                                    samples_per_pair)
from laenerf_tpu.ops.raymarch import (MarchConfig, build_skip_field,
                                      make_march_event, near_far_from_aabb)
from laenerf_tpu.data.provider import nerf_matrix_to_ngp
from laenerf_tpu.data.synthetic import _look_at_pose


def test_stream_matches_event_march_samples():
    rng = np.random.RandomState(3)
    Hg = 32
    occ = (rng.rand(1, Hg, Hg, Hg) > 0.9).astype(np.uint8)
    cfg = MarchConfig(bound=1.0, cascades=1, grid_size=Hg, max_steps=128,
                      march_iters=128)
    H = W = 48
    focal = W / (2 * np.tan(0.4))
    intr = jnp.asarray([focal, focal, W / 2, H / 2], jnp.float32)
    pose = jnp.asarray(
        nerf_matrix_to_ngp(_look_at_pose((2.2, 1.1, 1.8)), scale=1.0),
        jnp.float32)

    caps = StreamCaps(cells=1 << 14, pairs=1 << 17,
                      samples_per_pair=samples_per_pair(cfg))
    stream = build_sample_stream(jnp.asarray(occ), pose, intr, H, W, cfg,
                                 caps, min_near=0.05)
    assert bool(stream["ok"])
    k16 = np.asarray(stream["k16"])
    base = np.asarray(stream["base"])
    count = np.asarray(stream["count"])

    # event-scan ground truth
    rays_o, rays_d = pixel_rays(pose, intr, H, W)
    aabb = jnp.array([-1.0] * 3 + [1.0] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, 0.05)
    skip_flat = build_skip_field(jnp.asarray(occ)).reshape(-1)
    event = make_march_event(rays_o, rays_d, skip_flat, None, cfg)

    t = nears
    N = H * W
    seqs = [[] for _ in range(N)]
    for _ in range(64):
        alive = t < fars
        if not bool(alive.any()):
            break
        t, ts, dt, valid, _ = _march_round(event, t, fars, alive, 16, 32)
        ts_np, v_np = np.asarray(ts), np.asarray(valid)
        for i in range(N):
            seqs[i].extend(ts_np[i][v_np[i]].tolist())

    dt = cfg.dt_min
    nears_np = np.asarray(nears)
    n_diff = 0
    for i in range(N):
        got = nears_np[i] + k16[base[i]:base[i] + count[i]].astype(
            np.float64) * dt
        want = np.asarray(seqs[i])
        if len(got) != len(want):
            n_diff += 1
            continue
        if len(want) and not np.allclose(got, want, atol=1e-4):
            n_diff += 1
    # identical math up to f32 rounding at cell boundaries; both sides
    # resolve boundary lattice points with the same half-open convention,
    # so only float-noise stragglers may differ
    assert n_diff <= max(2, N // 100), f"{n_diff}/{N} rays differ"


def test_distill_frame_stream_matches_march():
    """render_distill_frame with raster streams must match the chunked
    render_rays_distill fallback (image, weights, edit sums, x_term)."""
    import dataclasses
    import tempfile

    from laenerf_tpu.data import NeRFDataset, generate_synthetic_scene
    from laenerf_tpu.models import NeRFConfig, RenderConfig
    from laenerf_tpu.train import Trainer

    tmp = tempfile.mkdtemp(prefix="raster_distill_")
    generate_synthetic_scene(tmp, n_train=6, n_val=1, n_test=1, H=48, W=48)
    ds = NeRFDataset(tmp, "train", num_rays=512)
    mc = NeRFConfig(bound=1.0, num_levels=8, log2_hashmap_size=15)
    rc = RenderConfig(bound=1.0, cascades=1, grid_size=32, max_steps=256,
                      march_iters=192, m_cap_per_ray=48)
    tr = Trainer(tmp + "/ws", mc, rc, lr=1e-2, iters=1000, eval_chunk=1024)
    tr.mark_untrained(ds)
    for step in range(50):
        tr.train_one_batch(ds.get_batch(step % len(ds)), has_alpha=True)

    # edit region: a ball around the densest area
    g = np.linspace(-1, 1, 32) + 1 / 32
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    egrid = ((X ** 2 + Y ** 2 + Z ** 2) < 0.2).astype(np.uint8)[None]

    ref = tr.render_distill_frame(egrid, ds.poses[0], ds.intrinsics,
                                  48, 48)
    tr.render_cfg = dataclasses.replace(rc, infer_raster=True)
    got = tr.render_distill_frame(egrid, ds.poses[0], ds.intrinsics,
                                  48, 48)
    for k in ("image", "weights", "weights_edit", "depth", "depth_edit",
              "x_term"):
        np.testing.assert_allclose(got[k], ref[k], atol=3e-3,
                                   err_msg=k)
