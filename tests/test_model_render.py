"""Model + renderer wiring tests on tiny configurations."""

import jax
import jax.numpy as jnp
import numpy as np

from laenerf_tpu.models import (
    NeRFConfig,
    RenderConfig,
    nerf_init,
    nerf_forward,
    occupancy_init,
    update_occupancy,
    render_rays_train,
    render_rays_infer,
    mark_untrained_grid,
)

MODEL_CFG = NeRFConfig(bound=1.0, num_levels=4, log2_hashmap_size=12)
# march budget chosen so nothing truncates on a fully-occupied grid
# (a [-1,1] traversal at dt_min = 2*sqrt(3)/128 needs ~74 samples)
RENDER_CFG = RenderConfig(bound=1.0, cascades=1, grid_size=32, max_steps=128,
                          march_iters=128, m_cap_per_ray=96,
                          infer_chunk_events=8)


def _rays(n=8, key=0):
    k = jax.random.PRNGKey(key)
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]]), (n, 1))
    d = jax.random.normal(k, (n, 3)) * 0.05 + jnp.array([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return rays_o, rays_d


def test_nerf_forward_shapes():
    params = nerf_init(jax.random.PRNGKey(0), MODEL_CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1, maxval=1)
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (16, 1))
    sigma, rgb = nerf_forward(params, MODEL_CFG, x, d)
    assert sigma.shape == (16,)
    assert rgb.shape == (16, 3)
    assert bool(jnp.all(sigma >= 0))
    assert bool(jnp.all((rgb >= 0) & (rgb <= 1)))


def test_nerf_bg_network():
    cfg = NeRFConfig(bound=1.0, num_levels=4, log2_hashmap_size=12,
                     bg_radius=4.0)
    params = nerf_init(jax.random.PRNGKey(0), cfg)
    assert "bg_net" in params and "encoder_bg" in params
    rays_o, rays_d = _rays(4)
    out = render_rays_train(params, occupancy_init(1, 32).occupancy,
                            rays_o, rays_d, jax.random.PRNGKey(0),
                            model_cfg=cfg, render_cfg=RENDER_CFG)
    assert out["image"].shape == (4, 3)


def test_render_train_shapes_and_grad():
    params = nerf_init(jax.random.PRNGKey(0), MODEL_CFG)
    occ = jnp.ones((1, 32, 32, 32), jnp.uint8)
    rays_o, rays_d = _rays(8)

    def loss_fn(p):
        out = render_rays_train(p, occ, rays_o, rays_d, jax.random.PRNGKey(1),
                                model_cfg=MODEL_CFG, render_cfg=RENDER_CFG,
                                bg_color=1.0, perturb=True)
        return jnp.mean(out["image"] ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # encoder must receive gradient
    assert float(jnp.sum(jnp.abs(grads["encoder"]))) > 0


def test_render_infer_matches_train_composite():
    """With the same params/occupancy and no perturb, eval and train paths
    must produce near-identical images (they share dt schedules)."""
    params = nerf_init(jax.random.PRNGKey(0), MODEL_CFG)
    occ = jnp.ones((1, 32, 32, 32), jnp.uint8)
    rays_o, rays_d = _rays(8)
    out_t = render_rays_train(params, occ, rays_o, rays_d,
                              jax.random.PRNGKey(0), model_cfg=MODEL_CFG,
                              render_cfg=RENDER_CFG, bg_color=1.0,
                              perturb=False)
    out_i = render_rays_infer(params, occ, rays_o, rays_d,
                              jax.random.PRNGKey(0), model_cfg=MODEL_CFG,
                              render_cfg=RENDER_CFG, bg_color=1.0)
    np.testing.assert_allclose(np.asarray(out_t["image"]),
                               np.asarray(out_i["image"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_t["weights_sum"]),
                               np.asarray(out_i["weights_sum"]), atol=2e-3)


def test_update_occupancy_full_and_partial():
    state = occupancy_init(1, 32)

    def density_fn(x):
        # dense ball of radius 0.5
        return jnp.where(jnp.sum(x ** 2, -1) < 0.25, 50.0, 0.0)

    state = update_occupancy(state, density_fn, jax.random.PRNGKey(0),
                             bound=1.0, full=True, density_thresh=0.01,
                             chunk=2 ** 13)
    assert int(state.iter_density) == 1
    assert float(state.mean_density) > 0
    occ = np.asarray(state.occupancy[0])
    # center occupied, corner not
    assert occ[16, 16, 16] == 1
    assert occ[0, 0, 0] == 0

    state2 = update_occupancy(state, density_fn, jax.random.PRNGKey(1),
                              bound=1.0, full=False, density_thresh=0.01)
    assert int(state2.iter_density) == 2
    occ2 = np.asarray(state2.occupancy[0])
    assert occ2[16, 16, 16] == 1


def test_partial_update_sweep_covers_grid_in_8_updates():
    """The stratified 2x2x2 sub-lattice sweep guarantees every cell is
    re-evaluated within 8 partial updates — the coverage property the
    redesign trades the reference's random draws for (renderer.py:598-609
    samples with replacement and has no such bound)."""
    from laenerf_tpu.models.occupancy import update_occupancy_partial

    state = occupancy_init(1, 16)
    # seed a full update so density_grid is trained everywhere
    state = update_occupancy(state, lambda x: jnp.full(x.shape[:-1], 5.0),
                             jax.random.PRNGKey(0), bound=1.0, full=True,
                             density_thresh=0.01)
    # switch density to zero: a cell reads 0 only when re-sampled, so after
    # 8 partial updates the max EMA'd density proves total coverage
    key = jax.random.PRNGKey(1)
    for _ in range(8):
        key, k = jax.random.split(key)
        state = update_occupancy_partial(
            state, lambda x: jnp.zeros(x.shape[:-1]), k, bound=1.0,
            density_thresh=0.01, decay=0.95)
    grid = np.asarray(state.density_grid[0])
    # a sampled cell becomes max(old * 0.95, 0) <= 4.75; an unsampled cell
    # keeps 5.0 exactly — so full coverage means nothing is left at 5.0
    assert grid.max() < 5.0, "some cell was never re-sampled in 8 updates"


def test_mark_untrained_grid():
    grid = jnp.zeros((1, 32, 32, 32), jnp.float32)
    # one camera at z=-2 looking at +z with a narrow fov
    pose = jnp.array([[[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.0],
                       [0, 0, 0, 1.0]]])
    marked = mark_untrained_grid(grid, pose, (64.0, 64.0, 16.0, 16.0),
                                 bound=1.0, cascades=1, grid_size=32)
    m = np.asarray(marked[0])
    # on-axis cells in front of the camera stay 0; cells far outside the
    # narrow frustum (cx/fx = 0.25 half-angle) are marked -1
    assert m[16, 16, 24] == 0
    assert m[0, 16, 0] == -1
    assert 0.05 < (m == 0).mean() < 0.95
