"""Editing subsystem tests: edit grid, LAENeRF model/losses, style network."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laenerf_tpu.editing import (
    EditGrid,
    LAENeRFConfig,
    LAENeRFLosses,
    StyleNetwork,
    laenerf_forward_train,
    laenerf_init,
    match_color,
    prune_palette,
    voxelize_points,
)

LCFG = LAENeRFConfig(bound=1.0, num_levels=4, log2_hashmap_size=12,
                     num_palette_bases=4)


def test_editgrid_voxelize_and_points():
    eg = EditGrid(cascades=1, grid_size=32)
    pts = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]], np.float32)
    eg.new_from_points(pts)
    assert eg.grid.sum() == 2
    assert len(eg.growing_queue) == 12
    sel = eg.get_selection_points()
    # selected cell centers should be near the input points
    d = np.linalg.norm(sel[None] - pts[:, None], axis=-1).min(1)
    assert d.max() < 2.0 / 32


def test_editgrid_grow():
    eg = EditGrid(cascades=1, grid_size=32)
    eg.new_from_points(np.array([[0.0, 0.0, 0.0]], np.float32))
    # density: a solid ball of radius 0.4 around origin
    xs = (np.arange(32) + 0.5) / 32 * 2 - 1
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    density = np.where(X ** 2 + Y ** 2 + Z ** 2 < 0.16, 1.0, 0.0)[None]
    before = eg.grid.sum()
    eg.grow_region_queue(density, density_thresh=0.5, grow_iterations=20000)
    after = eg.grid.sum()
    assert after > before
    # grown selection stays inside the dense ball
    lvl, x, y, z = np.nonzero(eg.grid)
    assert np.all(density[0, x, y, z] > 0.5)


def test_editgrid_algebra():
    a = EditGrid(1, 16)
    a.grid = np.zeros((1, 16, 16, 16), np.uint8)
    a.grid[0, :8] = 1
    neg = np.zeros_like(a.grid)
    neg[0, :4] = 1
    a.xor(neg)  # remove negative region
    assert a.grid[0, :4].sum() == 0
    assert a.grid[0, 4:8].sum() == 12 * 16 * 16 - 8 * 16 * 16  # remaining

    b = EditGrid(1, 16)
    b.grid = np.zeros((1, 16, 16, 16), np.uint8)
    b.grid[0, 0, 0, 0] = 1
    b.morphological()
    assert b.grid.sum() == 4  # center + 3 in-bounds neighbors


def test_editgrid_save_load(tmp_path):
    eg = EditGrid(1, 16)
    eg.new_from_points(np.array([[0.2, 0.1, -0.3]], np.float32))
    p = str(tmp_path / "grid.npz")
    eg.save(p)
    eg2 = EditGrid.load(p)
    np.testing.assert_array_equal(eg2.grid, eg.grid)


def test_laenerf_forward():
    params, active = laenerf_init(jax.random.PRNGKey(0), LCFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (32, 1))
    colors, w, o = laenerf_forward_train(params, LCFG, x, d, active)
    assert colors.shape == (32, 3)
    assert w.shape == (32, 4)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
    assert bool(jnp.all((colors >= 0) & (colors <= 1)))
    assert bool(jnp.all((o >= -1) & (o <= 1)))


def test_laenerf_masked_palette():
    params, active = laenerf_init(jax.random.PRNGKey(0), LCFG)
    active = active.at[2:].set(False)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=-1, maxval=1)
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))
    colors, w, o = laenerf_forward_train(params, LCFG, x, d, active)
    # inactive bases get exactly zero weight
    np.testing.assert_allclose(np.asarray(w[:, 2:]), 0.0)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)


def test_laenerf_losses():
    key = jax.random.PRNGKey(0)
    w = jax.nn.softmax(jax.random.normal(key, (16, 4)), -1)
    valid = jnp.ones(16)
    l1 = LAENeRFLosses.weights(w, 1.0, 1.0, valid)
    assert np.isfinite(float(l1))
    # padded rows must not contribute to the non-uniform term
    w_pad = jnp.concatenate([w, jnp.zeros((8, 4))])
    v_pad = jnp.concatenate([valid, jnp.zeros(8)])
    l2 = LAENeRFLosses.weights(w_pad, 1.0, 1.0, v_pad)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)

    pal = jax.random.uniform(key, (4, 3), minval=-0.2, maxval=1.2)
    lp = LAENeRFLosses.palette(pal, jnp.ones(4, bool), 1.0, 1.0)
    assert np.isfinite(float(lp))

    img = jax.random.uniform(key, (3, 8, 8))
    assert float(LAENeRFLosses.tv(img)) > 0
    dv = jax.random.uniform(key, (3, 7))  # wrong shapes on purpose? no:
    # depth var shapes: v along last dim -> [8, 7]; w along dim1 -> [7, 8]
    dvv = jax.random.uniform(key, (8, 7))
    dww = jax.random.uniform(key, (7, 8))
    assert float(LAENeRFLosses.depth_discontinuity(img, dvv, dww)) <= 0
    assert np.isfinite(float(LAENeRFLosses.tv_depth_weighted(img, dvv, dww)))


def test_prune_palette():
    params, active = laenerf_init(jax.random.PRNGKey(0), LCFG)
    x = [np.random.RandomState(0).uniform(-1, 1, (64, 3)).astype(np.float32)]
    new_active = prune_palette(params, LCFG, active, x, thresh=0.0)
    assert bool(jnp.all(new_active))  # thresh 0 keeps everything
    new_active2 = prune_palette(params, LCFG, active, x, thresh=1.0)
    assert not bool(jnp.all(new_active2))  # thresh 1 prunes


def test_style_network_gram_loss():
    rng = np.random.RandomState(0)
    style_img = rng.rand(3, 64, 64).astype(np.float32)
    sn = StyleNetwork(style_img, style_layers=(1, 3), size=32)
    # loss of the style image against itself (resized) is small-ish and
    # finite; a very different image scores higher
    l_self = float(sn(jnp.asarray(style_img)))
    other = np.zeros((3, 64, 64), np.float32)
    l_other = float(sn(jnp.asarray(other)))
    assert np.isfinite(l_self) and np.isfinite(l_other)
    assert l_other > l_self


def test_match_color_moments():
    rng = np.random.RandomState(0)
    style = rng.rand(3, 32, 32).astype(np.float32) * 0.5
    target = np.clip(rng.rand(3, 32, 32).astype(np.float32) * 0.5 + 0.4, 0, 1)
    matched = match_color(style, target)
    assert matched.shape == style.shape
    # matched mean should be closer to the target's mean than the original
    d_new = abs(matched.mean() - target.mean())
    d_old = abs(style.mean() - target.mean())
    assert d_new < d_old


def test_prune_palette_masks_padded_rows():
    """Padded (all-zero) x_term rows must not bias the pruning means: with a
    valid mask, the result equals pruning on the unpadded rows alone."""
    params, active = laenerf_init(jax.random.PRNGKey(0), LCFG)
    rng = np.random.RandomState(1)
    real = rng.uniform(-1, 1, (48, 3)).astype(np.float32)
    padded = np.concatenate([real, np.zeros((200, 3), np.float32)])
    valid = np.concatenate([np.ones(48, bool), np.zeros(200, bool)])

    ref_w_only_real = prune_palette(params, LCFG, active, [real], thresh=0.1)
    masked = prune_palette(params, LCFG, active, [padded], thresh=0.1,
                           valid_views=[valid])
    assert bool(jnp.all(ref_w_only_real == masked))


def test_laenerf_step_honors_crop_size():
    """--crop_size != 256 must reach the style-loss resize (round-1 bug:
    hardcoded 256 literal)."""
    from laenerf_tpu.editing.style_trainer import (StyleLossWeights,
                                                   laenerf_train_step,
                                                   make_style_optimizer)
    from laenerf_tpu.editing.vgg import vgg_init

    params, active = laenerf_init(jax.random.PRNGKey(0), LCFG)
    opt = make_style_optimizer()
    opt_state = opt.init(params)
    vgg_params, kinds, _ = vgg_init("vgg19", seed=1)
    kinds = tuple(kinds)
    weights = StyleLossWeights(style_weight=1.0, warmup_iterations=0)
    H = W = 16
    n = 32
    rng = np.random.RandomState(0)
    batch = {
        "x_term": jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32)),
        "dirs": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        "targets": jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        "valid": jnp.ones((n,), bool),
        "inds": jnp.asarray(np.arange(n, dtype=np.int32)),
        "crop_origin": jnp.zeros((2,), jnp.int32),
    }
    # gram targets must match the crop_size-resized feature maps' channel
    # dims; build them by running random filters on a crop_size image
    from laenerf_tpu.editing.style import gram_matrices
    from laenerf_tpu.editing.vgg import normalize_imagenet, vgg_features

    cs = 64
    dummy = jnp.zeros((1, 3, cs, cs))
    feats = vgg_features(vgg_params, kinds, dummy, (1, 3))
    gts = [jnp.zeros_like(g) for g in gram_matrices(feats)]

    new_params, _, aux = laenerf_train_step(
        params, opt_state, active, batch, jax.random.PRNGKey(2),
        cfg=LCFG, weights=weights, optimizer=opt, H=H, W=W,
        crop_h=8, crop_w=8, use_style=True, past_warmup=True,
        vgg_params=vgg_params, vgg_kinds=kinds, style_layers=(1, 3),
        gram_targets=gts, crop_size=cs,
    )
    assert np.isfinite(float(aux["loss"]))
