"""Multi-cascade (mip) marching correctness tests (VERDICT r3 item 6).

Reference semantics: raymarching.cu:42-54 (frexp-based mip_from_pos /
mip_from_dt), :345-399 (train march with per-level cell math),
nerf/renderer.py:74-75 (cascades = 1 + ceil(log2(bound))). At cascades=C
the occupancy grid has C levels of the same resolution H; level l covers
[-2^l, 2^l]^3 (clamped to bound).

Every other test file runs cascades=1; this one pins down the level-math
branch the mip360 configs (bound=2) actually exercise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from laenerf_tpu.models import (
    NeRFConfig,
    RenderConfig,
    nerf_init,
    occupancy_init,
    render_rays_infer,
    render_rays_train,
    update_occupancy,
)
from laenerf_tpu.ops.composite import composite_rays_train
from laenerf_tpu.ops.raymarch import (
    MarchConfig,
    _mip_level,
    march_rays_train,
    near_far_from_aabb,
    sample_positions,
)

BOUND = 2.0
AABB = jnp.array([-BOUND, -BOUND, -BOUND, BOUND, BOUND, BOUND])


def _cfg(grid_size=16, max_steps=64, march_iters=128):
    return MarchConfig(bound=BOUND, cascades=2, grid_size=grid_size,
                       dt_gamma=0.0, max_steps=max_steps,
                       march_iters=march_iters)


def _z_ray():
    rays_o = jnp.array([[0.0, 0.0, -4.0]])
    rays_d = jnp.array([[0.0, 0.0, 1.0]])
    return rays_o, rays_d


def test_mip_level_matches_numpy_frexp():
    """_mip_level == the reference's max(mip_from_pos, mip_from_dt)
    computed with numpy frexp (raymarching.cu:42-54)."""
    cfg = MarchConfig(bound=4.0, cascades=3, grid_size=32, max_steps=128)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-4, 4, (256, 3)).astype(np.float32)
    dts = rng.uniform(cfg.dt_min, cfg.dt_max, 256).astype(np.float32)

    def np_ref(p, dt):
        mx_pos = np.max(np.abs(p))
        mx_dt = dt * cfg.grid_size * 0.5
        # np.frexp: v = m * 2^e with m in [0.5, 1) -> e == floor(log2 v)+1
        e_pos = np.frexp(max(mx_pos, 1e-30))[1]
        e_dt = np.frexp(max(mx_dt, 1e-30))[1]
        return int(np.clip(max(e_pos, e_dt), 0, cfg.cascades - 1))

    got = np.asarray(_mip_level(jnp.asarray(pts[:, 0]),
                                jnp.asarray(pts[:, 1]),
                                jnp.asarray(pts[:, 2]),
                                jnp.asarray(dts), cfg))
    want = np.array([np_ref(p, dt) for p, dt in zip(pts, dts)])
    np.testing.assert_array_equal(got, want)


def test_march_cascade2_full_grid_uniform_steps():
    """Fully-occupied 2-level grid, dt_gamma=0: samples advance by dt_min
    across BOTH cascades (the level switch must not disturb the lattice)."""
    cfg = _cfg()
    rays_o, rays_d = _z_ray()
    grid = jnp.ones((2, 16, 16, 16), jnp.uint8)
    nears, fars = near_far_from_aabb(rays_o, rays_d, AABB)
    out = march_rays_train(rays_o, rays_d, grid, nears, fars, jnp.zeros(1),
                           cfg)
    n = int(out["n_samples"][0])
    assert n > 0
    ts = np.asarray(out["ts"][0])[np.asarray(out["valid"][0])]
    np.testing.assert_allclose(ts[0], 2.0, atol=1e-5)
    np.testing.assert_allclose(np.diff(ts), cfg.dt_min, rtol=1e-4)
    # the ray crosses both cascades: z = -4 + t, inner |z|<1 <=> t in (3,5)
    assert ts.min() < 2.5, "no samples in the outer cascade (enter side)"
    assert ts.max() > 4.5, "march stopped before re-entering the outer shell"


def test_march_cascade2_outer_empty_samples_confined():
    """Level-1 grid empty, level-0 full: samples only where the mip math
    selects level 0, i.e. max|coord| < 1 (one-cell slack at the border)."""
    cfg = _cfg()
    rays_o, rays_d = _z_ray()
    grid = np.zeros((2, 16, 16, 16), np.uint8)
    grid[0] = 1
    nears, fars = near_far_from_aabb(rays_o, rays_d, AABB)
    out = march_rays_train(rays_o, rays_d, jnp.asarray(grid), nears, fars,
                           jnp.zeros(1), cfg)
    n = int(out["n_samples"][0])
    assert n > 0
    xyz = np.asarray(sample_positions(rays_o, rays_d, out["ts"], BOUND))[0]
    xyz = xyz[np.asarray(out["valid"][0])]
    cell = 2.0 * BOUND / cfg.grid_size  # one level-1 cell of slack
    assert np.abs(xyz).max() <= 1.0 + cell


def test_march_cascade2_inner_empty_samples_confined():
    """Level-0 grid empty, level-1 full: no samples in the inner cube."""
    cfg = _cfg()
    rays_o, rays_d = _z_ray()
    grid = np.zeros((2, 16, 16, 16), np.uint8)
    grid[1] = 1
    nears, fars = near_far_from_aabb(rays_o, rays_d, AABB)
    out = march_rays_train(rays_o, rays_d, jnp.asarray(grid), nears, fars,
                           jnp.zeros(1), cfg)
    n = int(out["n_samples"][0])
    assert n > 0
    xyz = np.asarray(sample_positions(rays_o, rays_d, out["ts"], BOUND))[0]
    valid = np.asarray(out["valid"][0])
    z = xyz[valid][:, 2]
    cell = 2.0 * BOUND / cfg.grid_size
    # samples exist in both outer shells and skip the inner cube
    assert (z < -1.0 + cell).any() and (z > 1.0 - cell).any()
    inner = np.abs(xyz[valid]).max(axis=1) < 1.0 - cell
    assert not inner.any()


def test_march_cascade2_composite_matches_numpy():
    """End-to-end: cascade-2 march output fed through the composite matches
    the literal NumPy transcription of raymarching.cu:500-576."""
    from tests.test_march_composite import _np_composite

    cfg = _cfg()
    rays_o = jnp.array([[0.0, 0.0, -4.0], [0.3, -0.2, -4.0]])
    rays_d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.05, 1.0]])
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    grid = np.zeros((2, 16, 16, 16), np.uint8)
    grid[0] = 1
    grid[1, :, :, 8:] = 1  # outer level occupied for z >= 0 only
    nears, fars = near_far_from_aabb(rays_o, rays_d, AABB)
    out = march_rays_train(rays_o, rays_d, jnp.asarray(grid), nears, fars,
                           jnp.zeros(2), cfg)
    valid = np.asarray(out["valid"])
    assert valid.any()
    rng = np.random.RandomState(3)
    sigmas = rng.uniform(0, 20, valid.shape).astype(np.float32)
    rgbs = rng.uniform(0, 1, valid.shape + (3,)).astype(np.float32)
    ws, depth, image = composite_rays_train(
        jnp.asarray(sigmas), jnp.asarray(rgbs), out["dts"], out["ts"],
        out["valid"], out["t0"])
    ws_r, depth_r, image_r = _np_composite(
        sigmas, rgbs, np.asarray(out["dts"]), np.asarray(out["ts"]),
        valid, np.asarray(out["t0"]))
    np.testing.assert_allclose(np.asarray(ws), ws_r, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(image), image_r, rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), depth_r, rtol=1e-3,
                               atol=1e-5)


MODEL_CFG2 = NeRFConfig(bound=BOUND, num_levels=4, log2_hashmap_size=12)
# march budget chosen so nothing truncates: the occupied span is the inner
# cube (~74 samples at dt = 2*sqrt(3)/128) plus a few skip events through
# the empty outer shell; compact_factor=1 because at N=8 rays the tier
# capacity would otherwise starve the last rays (flat-order compaction)
RENDER_CFG2 = RenderConfig(bound=BOUND, cascades=2, grid_size=16,
                           max_steps=128, march_iters=192, m_cap_per_ray=96,
                           infer_chunk_events=8, infer_compact_factor=1)


def test_render_infer_matches_train_cascade2():
    """Train and inference renderers agree at cascades=2 (the inference
    while_loop path takes the multi-level branch of make_march_event)."""
    params = nerf_init(jax.random.PRNGKey(0), MODEL_CFG2)
    occ = np.zeros((2, 16, 16, 16), np.uint8)
    occ[0] = 1  # object in the inner cube, empty outer shell
    occ = jnp.asarray(occ)
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, -3.5]]), (8, 1))
    d = (jax.random.normal(jax.random.PRNGKey(1), (8, 3)) * 0.05
         + jnp.array([0.0, 0.0, 1.0]))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out_t = render_rays_train(params, occ, rays_o, rays_d,
                              jax.random.PRNGKey(0), model_cfg=MODEL_CFG2,
                              render_cfg=RENDER_CFG2, bg_color=1.0,
                              perturb=False)
    out_i = render_rays_infer(params, occ, rays_o, rays_d,
                              jax.random.PRNGKey(0), model_cfg=MODEL_CFG2,
                              render_cfg=RENDER_CFG2, bg_color=1.0)
    np.testing.assert_allclose(np.asarray(out_t["image"]),
                               np.asarray(out_i["image"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_t["weights_sum"]),
                               np.asarray(out_i["weights_sum"]), atol=2e-3)


def test_update_occupancy_cascade2_ball():
    """A radius-1.5 density ball occupies the level-0 center and a level-1
    shell, and leaves the level-1 corners empty (renderer.py:567-595)."""
    state = occupancy_init(2, 16)

    def density_fn(x):
        return jnp.where(jnp.linalg.norm(x, axis=-1) < 1.5, 50.0, 0.0)

    state = update_occupancy(state, density_fn, jax.random.PRNGKey(0),
                             bound=BOUND, density_thresh=0.5, full=True)
    occ = np.asarray(state.occupancy)
    assert occ.shape == (2, 16, 16, 16)
    assert occ[0, 8, 8, 8] == 1, "level-0 center should be occupied"
    assert occ[1].sum() > 0, "level-1 shell should have occupied cells"
    assert occ[1, 0, 0, 0] == 0, "level-1 corner (|x|~3.5) must be empty"


import pytest


@pytest.mark.slow
def test_pipeline_bound2_recolor(tmp_path):
    """End-to-end train + render + recolor on a bound=2, cascades=2 scene
    with content in BOTH cascades (the mip360-config shape: bound=2 =>
    cascades=2, nerf/renderer.py:74-75). Guards the whole multi-level
    path, not just the march unit."""
    import tempfile

    from laenerf_tpu.data import NeRFDataset, generate_synthetic_scene
    from laenerf_tpu.editing import EditGrid, StyleLossWeights
    from laenerf_tpu.pipeline import (EditPipeline, PipelineConfig,
                                      project_points)
    from laenerf_tpu.train import Trainer

    tmp = tempfile.mkdtemp(prefix="laenerf_cas2_", dir=str(tmp_path))
    # central sphere (inner cascade) + one at z=1.3 (outer cascade)
    spheres = [((0.0, 0.0, 0.0), 0.45, (0.8, 0.3, 0.2), 60.0),
               ((0.0, 0.0, 1.3), 0.3, (0.2, 0.4, 0.8), 60.0)]
    generate_synthetic_scene(tmp, n_train=8, n_val=1, n_test=1, H=48, W=48,
                             spheres=spheres)
    model_cfg = NeRFConfig(bound=BOUND, num_levels=8, log2_hashmap_size=15)
    render_cfg = RenderConfig(bound=BOUND, cascades=2, grid_size=32,
                              max_steps=256, march_iters=256,
                              m_cap_per_ray=48, infer_chunk_events=16)
    ds = NeRFDataset(tmp, "train", num_rays=512)
    tr = Trainer(tmp + "/ws", model_cfg, render_cfg, lr=1e-2, iters=1000)
    tr.mark_untrained(ds)
    for step in range(250):
        aux = tr.train_one_batch(ds.get_batch(step % len(ds)),
                                 has_alpha=True)
    assert np.isfinite(float(aux["loss"]))
    occ = np.asarray(tr.occ_state.occupancy)
    assert occ[0].sum() > 0, "inner cascade never marked occupied"
    assert occ[1].sum() > 0, "outer cascade never marked occupied"

    img, _ = tr.render_image(ds.poses[0], ds.intrinsics, ds.H, ds.W)
    assert np.isfinite(img).all()
    gt = ds.images[0]
    gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])
    psnr = -10 * np.log10(max(float(np.mean((img - gt) ** 2)), 1e-10))
    assert psnr > 12.0, f"bound=2 render unusably bad: {psnr:.1f} dB"

    # recolor the central sphere
    pts = project_points(tr, ds.poses[0], ds.intrinsics, [[24, 24]],
                         ds.H, ds.W)
    eg = EditGrid(cascades=2, grid_size=32)
    eg.new_from_points(pts, bound=BOUND)
    density = np.asarray(tr.occ_state.density_grid)
    thresh = min(float(tr.occ_state.mean_density), 0.01)
    eg.grow_region_queue(density, thresh, grow_iterations=100000)
    assert eg.grid.sum() > 10
    grow = EditGrid(2, 32)
    grow.grid_from_growing_queue(eg, density, thresh)

    cfg = PipelineConfig(
        mode="recolor", train_steps_style=40, train_steps_distill=30,
        distill_palette_steps=15, num_palette_bases=4, depth_diff=0.5,
        weights=StyleLossWeights(
            offset_loss=1e-4, weight_loss_uniform=1e-5,
            weight_loss_non_uniform=1e-5, palette_loss_valid=1e-4,
            palette_loss_distinct=1e-4, warmup_iterations=10))
    pipe = EditPipeline(tr, ds, cfg, tmp + "/edit_ws", eg, grow)
    pipe.init_phase()
    assert len(pipe.edit_dataset) > 0
    pipe.train_laenerf_phase(log_every=30, log_fn=lambda *a: None)
    pal = np.asarray(pipe.style_trainer.params["palette"])
    cfg.palette_mod = np.clip(pal * np.array([0.1, 1.5, 0.1]), 0, 1)
    stats = pipe.distill_phase(log_fn=lambda *a: None)
    assert np.isfinite(stats["sparsity_loss"])
