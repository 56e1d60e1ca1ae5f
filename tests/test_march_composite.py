"""March + composite tests against small NumPy references."""

import jax
import jax.numpy as jnp
import numpy as np

from laenerf_tpu.ops.raymarch import (
    MarchConfig,
    march_rays_train,
    near_far_from_aabb,
    sample_positions,
)
from laenerf_tpu.ops.composite import composite_rays_train, composite_chunk
from laenerf_tpu.ops.compaction import compact_samples, gather_flat, scatter_back


def _full_grid(cfg):
    H = cfg.grid_size
    return jnp.ones((cfg.cascades, H, H, H), dtype=jnp.uint8)


def test_march_full_grid_uniform_steps():
    """With a fully-occupied grid and dt_gamma=0, samples advance by dt_min."""
    cfg = MarchConfig(bound=1.0, cascades=1, grid_size=16, dt_gamma=0.0,
                      max_steps=64, march_iters=64)
    rays_o = jnp.array([[0.0, 0.0, -3.0]])
    rays_d = jnp.array([[0.0, 0.0, 1.0]])
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb)
    out = march_rays_train(rays_o, rays_d, _full_grid(cfg), nears, fars,
                           jnp.zeros(1), cfg)
    n = int(out["n_samples"][0])
    assert n > 0
    ts = np.asarray(out["ts"][0, :n])
    np.testing.assert_allclose(ts[0], 2.0, atol=1e-5)
    np.testing.assert_allclose(np.diff(ts), cfg.dt_min, rtol=1e-4)
    # all samples inside [near, far]
    assert ts[-1] < float(fars[0])
    dts = np.asarray(out["dts"][0, :n])
    np.testing.assert_allclose(dts, cfg.dt_min, rtol=1e-5)


def test_march_empty_grid_no_samples():
    cfg = MarchConfig(bound=1.0, cascades=1, grid_size=16, max_steps=64,
                      march_iters=64)
    grid = jnp.zeros((1, 16, 16, 16), dtype=jnp.uint8)
    rays_o = jnp.array([[0.0, 0.0, -3.0]])
    rays_d = jnp.array([[0.0, 0.0, 1.0]])
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb)
    out = march_rays_train(rays_o, rays_d, grid, nears, fars, jnp.zeros(1), cfg)
    assert int(out["n_samples"][0]) == 0


def test_march_skips_empty_voxels():
    """Only the occupied half of the volume should produce samples."""
    cfg = MarchConfig(bound=1.0, cascades=1, grid_size=16, max_steps=128,
                      march_iters=160)
    H = 16
    grid = np.zeros((1, H, H, H), dtype=np.uint8)
    grid[0, :, :, H // 2:] = 1  # occupied for z >= 0
    rays_o = jnp.array([[0.0, 0.0, -3.0]])
    rays_d = jnp.array([[0.0, 0.0, 1.0]])
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb)
    out = march_rays_train(rays_o, rays_d, jnp.array(grid), nears, fars,
                           jnp.zeros(1), cfg)
    n = int(out["n_samples"][0])
    assert n > 0
    xyz = np.asarray(sample_positions(rays_o, rays_d, out["ts"], 1.0))[0]
    mask = np.asarray(out["valid"][0])
    xyz = xyz[mask]
    # samples should be at z >= ~0 (allow one step of slack at the boundary)
    assert xyz[:, 2].min() > -2 * cfg.dt_min


def test_march_miss_ray():
    cfg = MarchConfig(bound=1.0, cascades=1, grid_size=16, max_steps=64,
                      march_iters=64)
    rays_o = jnp.array([[0.0, 5.0, -3.0]])
    rays_d = jnp.array([[0.0, 0.0, 1.0]])
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb)
    out = march_rays_train(rays_o, rays_d, _full_grid(cfg), nears, fars,
                           jnp.zeros(1), cfg)
    assert int(out["n_samples"][0]) == 0


def _np_composite(sigmas, rgbs, dts, ts, valid, t0, T_thresh=1e-4):
    """Literal NumPy transcription of the reference forward loop
    (raymarching.cu:500-576)."""
    N, S = sigmas.shape
    ws = np.zeros(N)
    depth = np.zeros(N)
    image = np.zeros((N, 3))
    for n in range(N):
        T = 1.0
        t_cum = 0.0
        last_t = t0[n]
        for s in range(S):
            if not valid[n, s]:
                continue
            alpha = 1.0 - np.exp(-sigmas[n, s] * dts[n, s])
            w = alpha * T
            image[n] += w * rgbs[n, s]
            t_post = ts[n, s] + dts[n, s]
            t_cum += t_post - last_t
            last_t = t_post
            depth[n] += w * t_cum
            ws[n] += w
            T *= 1.0 - alpha
            if T < T_thresh:
                break
    return ws, depth, image


def test_composite_matches_numpy_reference():
    rng = np.random.RandomState(0)
    N, S = 4, 16
    dts = np.full((N, S), 0.05, dtype=np.float32)
    t0 = np.full(N, 2.0, dtype=np.float32)
    ts = t0[:, None] + np.cumsum(dts, axis=1) - dts
    sigmas = rng.uniform(0.0, 20.0, (N, S)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (N, S, 3)).astype(np.float32)
    valid = np.ones((N, S), dtype=bool)
    valid[1, 8:] = False  # short ray
    valid[2, :] = False  # empty ray

    ws, depth, image = composite_rays_train(
        jnp.array(sigmas), jnp.array(rgbs), jnp.array(dts), jnp.array(ts),
        jnp.array(valid), jnp.array(t0)
    )
    ws_ref, depth_ref, image_ref = _np_composite(sigmas, rgbs, dts, ts, valid, t0)
    np.testing.assert_allclose(np.asarray(ws), ws_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(image), image_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), depth_ref, rtol=1e-3, atol=1e-5)


def test_composite_gradients_finite():
    N, S = 2, 8
    key = jax.random.PRNGKey(0)
    sigmas = jax.random.uniform(key, (N, S), minval=0.0, maxval=50.0)
    rgbs = jax.random.uniform(key, (N, S, 3))
    dts = jnp.full((N, S), 0.1)
    ts = jnp.cumsum(dts, axis=1)
    valid = jnp.ones((N, S), dtype=bool)
    t0 = jnp.zeros(N)

    def loss(sig, rgb):
        ws, d, img = composite_rays_train(sig, rgb, dts, ts, valid, t0)
        return jnp.sum(img ** 2) + jnp.sum(ws) + jnp.sum(d)

    gs, gr = jax.grad(loss, argnums=(0, 1))(sigmas, rgbs)
    assert bool(jnp.all(jnp.isfinite(gs)))
    assert bool(jnp.all(jnp.isfinite(gr)))


def test_composite_early_termination():
    """A huge-sigma first sample should suppress all later contributions."""
    N, S = 1, 4
    sigmas = jnp.array([[1000.0, 5.0, 5.0, 5.0]])
    rgbs = jnp.ones((N, S, 3)) * jnp.array([1.0, 0.0, 0.0])
    rgbs = rgbs.at[0, 1:].set(jnp.array([0.0, 1.0, 0.0]))
    dts = jnp.full((N, S), 0.1)
    ts = jnp.cumsum(dts, axis=1) - 0.1
    valid = jnp.ones((N, S), dtype=bool)
    ws, depth, image = composite_rays_train(sigmas, rgbs, dts, ts, valid,
                                            jnp.zeros(N))
    np.testing.assert_allclose(np.asarray(image[0]), [1.0, 0.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(float(ws[0]), 1.0, atol=1e-4)


def test_chunked_composite_matches_full():
    rng = np.random.RandomState(1)
    N, S = 3, 16
    K = 4
    dts = np.full((N, S), 0.05, dtype=np.float32)
    t0 = np.zeros(N, dtype=np.float32)
    ts = np.cumsum(dts, axis=1) - dts
    sigmas = rng.uniform(0, 10, (N, S)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (N, S, 3)).astype(np.float32)
    valid = np.ones((N, S), dtype=bool)

    ws_full, depth_full, image_full = composite_rays_train(
        jnp.array(sigmas), jnp.array(rgbs), jnp.array(dts), jnp.array(ts),
        jnp.array(valid), jnp.array(t0)
    )
    carry = {"T": jnp.ones(N), "ws": jnp.zeros(N), "depth": jnp.zeros(N),
             "rgb": jnp.zeros((N, 3))}
    for c in range(S // K):
        sl = slice(c * K, (c + 1) * K)
        carry = composite_chunk(
            carry, jnp.array(sigmas[:, sl]), jnp.array(rgbs[:, sl]),
            jnp.array(dts[:, sl]), jnp.array(ts[:, sl]),
            jnp.array(valid[:, sl]), jnp.array(t0)
        )
    np.testing.assert_allclose(np.asarray(carry["ws"]), np.asarray(ws_full),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(carry["rgb"]), np.asarray(image_full),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(carry["depth"]),
                               np.asarray(depth_full), rtol=1e-3, atol=1e-5)


def test_compaction_roundtrip():
    rng = np.random.RandomState(2)
    N, S, M = 4, 8, 16
    valid = jnp.array(rng.rand(N, S) > 0.5)
    vals = jnp.array(rng.randn(N, S, 3).astype(np.float32))

    gather_idx, gather_mask, dest = compact_samples(valid, M)
    flat = vals.reshape(N * S, 3)
    compacted = gather_flat(flat, gather_idx)
    back = scatter_back(compacted, dest, (N, S))
    expect = np.where(np.asarray(valid)[..., None], np.asarray(vals), 0.0)
    np.testing.assert_allclose(np.asarray(back), expect, rtol=1e-6)
    assert int(gather_mask.sum()) == int(valid.sum())


def test_scatter_back_custom_vjp_matches_autodiff():
    """The injective-dest custom VJP (gather at gather_idx) must produce
    the same vals-cotangent as autodiff of the plain gather forward,
    including overflow (dumpster) and padding slots."""
    import jax

    rng = np.random.RandomState(7)
    N, S, M = 6, 8, 12  # M < n_valid possible -> exercises overflow
    valid = jnp.array(rng.rand(N, S) > 0.4)
    vals = jnp.array(rng.randn(N, S, 3).astype(np.float32))
    gather_idx, gather_mask, dest = compact_samples(valid, M)
    compacted = gather_flat(vals.reshape(N * S, 3), gather_idx)
    cot = jnp.array(rng.randn(N, S, 3).astype(np.float32))

    def loss_plain(v):
        return jnp.sum(scatter_back(v, dest, (N, S)) * cot)

    def loss_custom(v):
        return jnp.sum(scatter_back(v, dest, (N, S), gather_idx=gather_idx,
                                    gather_mask=gather_mask) * cot)

    g_plain = jax.grad(loss_plain)(compacted)
    g_custom = jax.grad(loss_custom)(compacted)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                               rtol=1e-6, atol=1e-6)
    # forwards agree too
    np.testing.assert_allclose(
        np.asarray(scatter_back(compacted, dest, (N, S))),
        np.asarray(scatter_back(compacted, dest, (N, S),
                                gather_idx=gather_idx,
                                gather_mask=gather_mask)), rtol=1e-6)


def test_compaction_overflow_drops():
    valid = jnp.ones((2, 8), dtype=bool)
    gather_idx, gather_mask, dest = compact_samples(valid, 10)
    assert int(gather_mask.sum()) == 10
    # dropped samples map to the dumpster row
    assert int(jnp.sum(dest == 10)) == 6


def test_skip_field_safety():
    """build_skip_field's guarantee: field k >= 1 at cell c means no
    occupied cell within chebyshev radius 2^(k-1) - 1 (brute-force check)."""
    from laenerf_tpu.ops.raymarch import build_skip_field

    rng = np.random.RandomState(3)
    occ = (rng.rand(1, 24, 24, 24) > 0.97).astype(np.uint8)
    field = np.asarray(build_skip_field(jnp.asarray(occ)))[0]
    occ3 = occ[0]
    pts = np.argwhere(occ3 > 0)
    assert (field[occ3 > 0] == 0).all()
    # random sample of free cells
    free = np.argwhere(occ3 == 0)
    sel = free[rng.choice(len(free), 200, replace=False)]
    for c in sel:
        k = field[tuple(c)]
        assert k >= 1
        m = (1 << (k - 1)) - 1
        if m > 0 and len(pts):
            cheb = np.max(np.abs(pts - c), axis=1).min()
            assert cheb > m, f"cell {c}: field {k} claims {m} free, " \
                             f"nearest occupied at {cheb}"


def test_skip_field_empty_and_full():
    from laenerf_tpu.ops.raymarch import SKIP_LEVELS, build_skip_field

    empty = jnp.zeros((1, 16, 16, 16), jnp.uint8)
    f = np.asarray(build_skip_field(empty))
    # an empty grid must saturate at the top level everywhere
    assert (f == SKIP_LEVELS).all()
    full = jnp.ones((1, 16, 16, 16), jnp.uint8)
    f = np.asarray(build_skip_field(full))
    assert (f == 0).all()