"""Unit tests for the L0-equivalent ops against tiny NumPy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laenerf_tpu.ops import (
    trunc_exp,
    sh_encode,
    freq_encode,
    freq_output_dim,
    morton3d,
    morton3d_invert,
    packbits,
    unpackbits,
    near_far_from_aabb,
    sph_from_ray,
)


def test_trunc_exp_forward():
    x = jnp.array([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(trunc_exp(x), np.exp([-2.0, 0.0, 3.0]), rtol=1e-5)


def test_trunc_exp_backward_clamps():
    g = jax.grad(lambda x: trunc_exp(x).sum())(jnp.array([20.0, -20.0, 1.0]))
    # gradient uses exp(clip(x, -15, 15))
    np.testing.assert_allclose(
        g, np.exp([15.0, -15.0, 1.0]), rtol=1e-5
    )


def test_sh_degree1_constant():
    d = jnp.array([[0.0, 0.0, 1.0]])
    out = sh_encode(d, degree=1)
    assert out.shape == (1, 1)
    np.testing.assert_allclose(out[0, 0], 0.28209479177387814, rtol=1e-6)


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 8])
def test_sh_shapes(degree):
    d = jax.random.normal(jax.random.PRNGKey(0), (7, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = sh_encode(d, degree=degree)
    assert out.shape == (7, degree * degree)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_sh_degree2_values():
    # against the reference's hardcoded polynomials (shencoder.cu:52-55)
    d = jnp.array([[0.6, -0.48, 0.64]])
    out = np.asarray(sh_encode(d, degree=2))[0]
    c = 0.48860251190291987
    np.testing.assert_allclose(out[1], -c * -0.48, rtol=1e-6)
    np.testing.assert_allclose(out[2], c * 0.64, rtol=1e-6)
    np.testing.assert_allclose(out[3], -c * 0.6, rtol=1e-6)


def test_sh_orthonormality_deg3():
    # Monte-Carlo check: int Y_i Y_j dOmega ~= delta_ij
    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (200000, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    y = sh_encode(d, degree=3)  # [N, 9]
    gram = (y.T @ y) / d.shape[0] * 4 * np.pi
    np.testing.assert_allclose(np.asarray(gram), np.eye(9), atol=0.05)


def test_freq_encode():
    x = jnp.array([[0.5, -0.25]])
    out = freq_encode(x, degree=2)
    assert out.shape == (1, freq_output_dim(2, 2))
    np.testing.assert_allclose(out[0, :2], [0.5, -0.25], rtol=1e-6)
    np.testing.assert_allclose(out[0, 2:4], np.sin([0.5, -0.25]), rtol=1e-6)
    np.testing.assert_allclose(out[0, 4:6], np.cos([0.5, -0.25]), rtol=1e-6)
    np.testing.assert_allclose(out[0, 6:8], np.sin([1.0, -0.5]), rtol=1e-6)


def test_morton_roundtrip():
    key = jax.random.PRNGKey(2)
    coords = jax.random.randint(key, (100, 3), 0, 128, dtype=jnp.int32)
    codes = morton3d(coords)
    back = morton3d_invert(codes)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(coords))


def test_morton_known_values():
    assert int(morton3d(jnp.array([[1, 0, 0]]))[0]) == 1
    assert int(morton3d(jnp.array([[0, 1, 0]]))[0]) == 2
    assert int(morton3d(jnp.array([[0, 0, 1]]))[0]) == 4
    assert int(morton3d(jnp.array([[3, 3, 3]]))[0]) == 63


def test_packbits_roundtrip():
    grid = jnp.array(np.random.RandomState(0).randn(2, 128).astype(np.float32))
    bf = packbits(grid, 0.0)
    bits = unpackbits(bf)
    np.testing.assert_array_equal(
        np.asarray(bits), (np.asarray(grid) > 0.0).astype(np.uint8)
    )


def test_near_far_hit_and_miss():
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    rays_o = jnp.array([[0.0, 0, -3], [0.0, 5, -3]])
    rays_d = jnp.array([[0.0, 0, 1], [0.0, 0, 1]])
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near=0.2)
    np.testing.assert_allclose(nears[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(fars[0], 4.0, rtol=1e-6)
    assert float(nears[1]) > 1e30  # miss


def test_near_far_min_near():
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    rays_o = jnp.array([[0.0, 0, 0]])  # inside the box
    rays_d = jnp.array([[0.0, 0, 1]])
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near=0.2)
    np.testing.assert_allclose(nears[0], 0.2, rtol=1e-6)
    np.testing.assert_allclose(fars[0], 1.0, rtol=1e-6)


def test_sph_from_ray_on_sphere():
    rays_o = jnp.array([[0.0, 0.0, 0.0]])
    rays_d = jnp.array([[0.0, 1.0, 0.0]])  # straight up (+y)
    out = np.asarray(sph_from_ray(rays_o, rays_d, radius=4.0))
    # theta = atan2(0, 4) = 0 -> coord0 = -1
    np.testing.assert_allclose(out[0, 0], -1.0, atol=1e-6)
