"""Parity of the Pallas march-round kernel against the XLA event-scan round
(models/renderer._march_round) on a random occupancy field, in interpret
mode (CPU). The float paths are algebraically equal but reassociated, so a
boundary ulp may shift WHICH lattice step a skip lands on; both paths
self-correct (re-skip), so parity is asserted exactly on ~all rays and by
invariants (lattice alignment, occupied cells only) on the rest."""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from laenerf_tpu.ops.march_pallas import NR, march_round_pallas
from laenerf_tpu.ops.raymarch import (MarchConfig, build_skip_field,
                                      make_march_event, near_far_from_aabb)


def _setup(seed=0, H=128, occ_frac=0.02):
    rng = np.random.default_rng(seed)
    occ = (rng.random((1, H, H, H)) < occ_frac).astype(np.uint8)
    cfg = MarchConfig(bound=1.0, cascades=1, grid_size=H, max_steps=256,
                      march_iters=256)
    skip = build_skip_field(jnp.asarray(occ), bound=cfg.bound)
    # rays from a ring looking inward (mix of hits and misses)
    th = rng.uniform(0, 2 * np.pi, NR)
    o = np.stack([2.5 * np.cos(th), 2.5 * np.sin(th),
                  rng.uniform(-0.5, 0.5, NR)], 1).astype(np.float32)
    tgt = rng.uniform(-0.7, 0.7, (NR, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1], jnp.float32)
    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb)
    return cfg, skip, jnp.asarray(o), jnp.asarray(d), nears, fars


def test_march_round_pallas_parity():
    from laenerf_tpu.models.renderer import _march_round

    cfg, skip, o, d, nears, fars = _setup()
    Ks, Km = 16, 32
    alive = jnp.ones((NR,), bool)
    t0 = nears

    event = make_march_event(o, d, skip.reshape(-1), None, cfg)
    t_ref, ts_ref, dt_ref, valid_ref, _ = _march_round(
        event, t0, fars, alive, Ks, Km)

    field2d = skip.reshape(cfg.grid_size * cfg.grid_size, cfg.grid_size)
    t_p, ts_p, dt_p, valid_p = march_round_pallas(
        t0, fars, alive, o, d, field2d, H=cfg.grid_size, Km=Km, Ks=Ks,
        dt_min=cfg.dt_min, dt_max=cfg.dt_max, gamma=cfg.dt_gamma,
        bound=cfg.bound, interpret=True)

    valid_ref = np.asarray(valid_ref)
    valid_p = np.asarray(valid_p)
    ts_ref_n, ts_p_n = np.asarray(ts_ref), np.asarray(ts_p)

    # rays where both paths agree exactly on the sample pattern
    same = (valid_ref == valid_p).all(1)
    agree = same.mean()
    assert agree > 0.999, f"sample-pattern agreement {agree:.4f}"
    np.testing.assert_allclose(ts_p_n[same] * valid_p[same],
                               ts_ref_n[same] * valid_ref[same],
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_p)[same],
                               np.asarray(t_ref)[same], rtol=0, atol=1e-5)

    # invariants for every ray: valid samples sit on the dt lattice and in
    # occupied cells (the property the conservative skip field guarantees)
    H = cfg.grid_size
    occ3 = np.asarray(skip.reshape(H, H, H)) == 0
    vi, vs = np.nonzero(valid_p)
    pos = np.asarray(o)[vi] + ts_p_n[vi, vs, None] * np.asarray(d)[vi]
    cell = np.clip(((pos + 1) * (H / 2)).astype(int), 0, H - 1)
    frac_occ = occ3[cell[:, 0], cell[:, 1], cell[:, 2]].mean()
    assert frac_occ > 0.999, frac_occ
    k = (ts_p_n[vi, vs] - np.asarray(t0)[vi]) / cfg.dt_min
    assert np.abs(k - np.round(k)).max() < 1e-3

    # dts in the gamma == 0 config are the constant fine step
    assert np.allclose(np.asarray(dt_p)[valid_p], cfg.dt_min)


def test_march_round_pallas_dead_rays_freeze():
    cfg, skip, o, d, nears, fars = _setup(seed=1)
    Ks, Km = 16, 32
    alive = jnp.zeros((NR,), bool)  # nobody marches
    field2d = skip.reshape(cfg.grid_size * cfg.grid_size, cfg.grid_size)
    t_p, ts_p, _, valid_p = march_round_pallas(
        nears, fars, alive, o, d, field2d, H=cfg.grid_size, Km=Km, Ks=Ks,
        dt_min=cfg.dt_min, dt_max=cfg.dt_max, gamma=cfg.dt_gamma,
        bound=cfg.bound, interpret=True)
    assert not np.asarray(valid_p).any()
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(nears))


def test_render_rays_infer_pallas_parity():
    """render_rays_infer with infer_pallas_march=True must reproduce the
    XLA-round images on a full 16384-ray chunk (interpret mode on CPU)."""
    import dataclasses

    from laenerf_tpu.models import NeRFConfig, RenderConfig
    from laenerf_tpu.models.nerf import nerf_init
    from laenerf_tpu.models.renderer import render_rays_infer

    rng = np.random.default_rng(2)
    H = 128
    occ = (rng.random((1, H, H, H)) < 0.02).astype(np.uint8)
    model_cfg = NeRFConfig(bound=1.0, num_levels=4, log2_hashmap_size=12)
    rc = RenderConfig(bound=1.0, cascades=1, grid_size=H, max_steps=128,
                      march_iters=128, infer_chunk_events=16,
                      infer_march_events=32, infer_compact_factor=4)
    rc_p = dataclasses.replace(rc, infer_pallas_march=True)
    params = nerf_init(jax.random.PRNGKey(0), model_cfg)

    th = rng.uniform(0, 2 * np.pi, NR)
    o = np.stack([2.5 * np.cos(th), 2.5 * np.sin(th),
                  rng.uniform(-0.5, 0.5, NR)], 1).astype(np.float32)
    tgt = rng.uniform(-0.6, 0.6, (NR, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    key = jax.random.PRNGKey(1)

    out_x = render_rays_infer(params, jnp.asarray(occ), jnp.asarray(o),
                              jnp.asarray(d), key, model_cfg=model_cfg,
                              render_cfg=rc)
    out_p = render_rays_infer(params, jnp.asarray(occ), jnp.asarray(o),
                              jnp.asarray(d), key, model_cfg=model_cfg,
                              render_cfg=rc_p)
    img_x, img_p = np.asarray(out_x["image"]), np.asarray(out_p["image"])
    # boundary-ulp skip reassociation may move O(1e-3) of rays' patterns;
    # everything else must match tightly
    close = np.all(np.abs(img_x - img_p) < 1e-3, axis=1)
    assert close.mean() > 0.999, close.mean()
    np.testing.assert_allclose(np.asarray(out_p["weights_sum"])[close],
                               np.asarray(out_x["weights_sum"])[close],
                               atol=1e-3)


def test_sorted_eval_parity():
    """RenderConfig.sorted_eval must be a pure reordering: train-path loss
    outputs and inference images identical to the unsorted eval."""
    import dataclasses

    from laenerf_tpu.models import NeRFConfig, RenderConfig
    from laenerf_tpu.models.nerf import nerf_init
    from laenerf_tpu.models.renderer import (render_rays_infer,
                                             render_rays_train)

    rng = np.random.default_rng(5)
    H = 64
    occ = (rng.random((1, H, H, H)) < 0.05).astype(np.uint8)
    model_cfg = NeRFConfig(bound=1.0, num_levels=4, log2_hashmap_size=12)
    rc = RenderConfig(bound=1.0, cascades=1, grid_size=H, max_steps=128,
                      march_iters=128, m_cap_per_ray=32)
    rc_s = dataclasses.replace(rc, sorted_eval=True)
    params = nerf_init(jax.random.PRNGKey(0), model_cfg)

    n = 2048
    o = np.broadcast_to(np.array([0, 0, -2.5], np.float32), (n, 3)).copy()
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    key = jax.random.PRNGKey(1)

    a = render_rays_train(params, jnp.asarray(occ), jnp.asarray(o),
                          jnp.asarray(d), key, model_cfg=model_cfg,
                          render_cfg=rc)
    b = render_rays_train(params, jnp.asarray(occ), jnp.asarray(o),
                          jnp.asarray(d), key, model_cfg=model_cfg,
                          render_cfg=rc_s)
    np.testing.assert_allclose(np.asarray(b["image"]),
                               np.asarray(a["image"]), atol=1e-5)

    ia = render_rays_infer(params, jnp.asarray(occ), jnp.asarray(o),
                           jnp.asarray(d), key, model_cfg=model_cfg,
                           render_cfg=rc)
    ib = render_rays_infer(params, jnp.asarray(occ), jnp.asarray(o),
                           jnp.asarray(d), key, model_cfg=model_cfg,
                           render_cfg=rc_s)
    np.testing.assert_allclose(np.asarray(ib["image"]),
                               np.asarray(ia["image"]), atol=1e-5)


def test_march_round_pallas_axis_aligned_rays():
    """Rays with exactly-zero direction components (axis-aligned cameras)
    must not NaN-poison the reassociated exit-face math."""
    cfg, skip, _, _, _, _ = _setup(seed=3)
    o = np.zeros((NR, 3), np.float32)
    o[:, 2] = -2.5
    d = np.zeros((NR, 3), np.float32)
    d[:, 2] = 1.0  # dx = dy = 0 exactly
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1], jnp.float32)
    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb)
    field2d = skip.reshape(cfg.grid_size * cfg.grid_size, cfg.grid_size)
    t_p, ts_p, _, valid_p = march_round_pallas(
        nears, fars, jnp.ones((NR,), bool), jnp.asarray(o), jnp.asarray(d),
        field2d, H=cfg.grid_size, Km=32, Ks=16, dt_min=cfg.dt_min,
        dt_max=cfg.dt_max, gamma=cfg.dt_gamma, bound=cfg.bound,
        interpret=True)
    assert np.isfinite(np.asarray(t_p)).all()
    assert np.isfinite(np.asarray(ts_p)).all()
    # all rays share one cell column; the ray either samples it or skips it
    assert np.asarray(t_p).min() > float(np.asarray(nears).min())


def test_sorted_eval_gradients_match():
    """sorted_eval must not change train-step gradients (the permutation
    VJPs are exact inverses)."""
    import dataclasses

    from laenerf_tpu.models import NeRFConfig, RenderConfig
    from laenerf_tpu.models.nerf import nerf_init
    from laenerf_tpu.models.renderer import render_rays_train

    rng = np.random.default_rng(7)
    H = 32
    occ = (rng.random((1, H, H, H)) < 0.1).astype(np.uint8)
    model_cfg = NeRFConfig(bound=1.0, num_levels=3, log2_hashmap_size=10)
    rc = RenderConfig(bound=1.0, cascades=1, grid_size=H, max_steps=64,
                      march_iters=64, m_cap_per_ray=16)
    rc_s = dataclasses.replace(rc, sorted_eval=True)
    params = nerf_init(jax.random.PRNGKey(0), model_cfg)
    n = 256
    o = np.broadcast_to(np.array([0, 0, -2.5], np.float32), (n, 3)).copy()
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    key = jax.random.PRNGKey(1)
    tgt = jnp.asarray(rng.random((n, 3)).astype(np.float32))

    def loss(p, cfg):
        out = render_rays_train(p, jnp.asarray(occ), jnp.asarray(o),
                                jnp.asarray(d), key, model_cfg=model_cfg,
                                render_cfg=cfg)
        return jnp.mean((out["image"] - tgt) ** 2)

    ga = jax.grad(lambda p: loss(p, rc))(params)
    gb = jax.grad(lambda p: loss(p, rc_s))(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3,
                                   atol=2e-6)
