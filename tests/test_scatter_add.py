"""Parity tests for the work-list scatter-add kernel (ops/scatter_add.py).

Runs the Pallas kernel in interpreter mode on CPU (conftest forces the cpu
platform) against the plain XLA scatter reference, covering the skew
patterns that break naive fixed-capacity tiling: all-updates-in-one-tile,
empty tiles, block-boundary straddles, and duplicate-heavy streams.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laenerf_tpu.ops.scatter_add import (scatter_add_rows,
                                         scatter_add_rows_xla)


def _check(idx, g, T, precision, tol):
    ref = scatter_add_rows_xla(jnp.asarray(idx), jnp.asarray(g), T)
    got = scatter_add_rows(jnp.asarray(idx), jnp.asarray(g), T,
                           precision=precision, interpret=True)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-8
    err = float(jnp.max(jnp.abs(got - ref))) / scale
    assert err < tol, f"rel err {err:.2e} >= {tol}"


@pytest.mark.parametrize("precision,tol", [("bf16", 1.5e-2), ("f32", 1e-4)])
def test_uniform_random(precision, tol):
    rng = np.random.RandomState(0)
    Q, T, C = 10000, 5000, 8
    idx = rng.randint(0, T, Q).astype(np.int32)
    g = rng.randn(Q, C).astype(np.float32)
    _check(idx, g, T, precision, tol)


def test_bf16_out_matches_f32_out_converted():
    """out_dtype=bf16 (f32 VMEM scratch, one convert per tile) must equal
    the f32 output converted afterwards — same accumulation, fewer passes.
    Covers multi-block tiles and empty tiles (the wlast-flag plumbing)."""
    rng = np.random.RandomState(4)
    Q, T, C = 30000, 16384, 8
    # skew: half the stream in one tile (multiple blocks -> wlast matters)
    idx = np.concatenate([
        rng.randint(0, 2048, Q // 2),
        rng.randint(8192, T, Q - Q // 2),
    ]).astype(np.int32)
    g = rng.randn(Q, C).astype(np.float32)
    f32 = scatter_add_rows(jnp.asarray(idx), jnp.asarray(g), T,
                           precision="bf16", interpret=True)
    bf16 = scatter_add_rows(jnp.asarray(idx), jnp.asarray(g), T,
                            precision="bf16", interpret=True,
                            out_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(f32.astype(jnp.bfloat16), dtype=np.float32),
        np.asarray(bf16, dtype=np.float32))


def test_all_one_row():
    # extreme duplication: every update hits row 17
    Q, T, C = 8192, 4096, 4
    idx = np.full(Q, 17, np.int32)
    g = np.ones((Q, C), np.float32)
    ref = np.zeros((T, C), np.float32)
    ref[17] = Q
    got = scatter_add_rows(jnp.asarray(idx), jnp.asarray(g), T,
                           precision="f32", interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5)


def test_clustered_and_empty_tiles():
    # updates concentrated in a narrow band; most tiles empty
    rng = np.random.RandomState(1)
    Q, T, C = 20000, 40000, 8
    idx = (5000 + rng.randint(0, 300, Q)).astype(np.int32)
    g = rng.randn(Q, C).astype(np.float32)
    _check(idx, g, T, "f32", 1e-4)


def test_block_straddle():
    # exactly hits tile/block boundaries (TILE == MAXU == 2048)
    Q, T, C = 6144, 6144, 2
    idx = np.concatenate([
        np.full(2047, 2047), np.full(2049, 2048), np.full(2048, 4095),
    ]).astype(np.int32)
    g = np.ones((Q, C), np.float32)
    ref = scatter_add_rows_xla(jnp.asarray(idx), jnp.asarray(g), T)
    got = scatter_add_rows(jnp.asarray(idx), jnp.asarray(g), T,
                           precision="f32", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_tiny_table():
    rng = np.random.RandomState(2)
    Q, T, C = 3000, 100, 8
    idx = rng.randint(0, T, Q).astype(np.int32)
    g = rng.randn(Q, C).astype(np.float32)
    _check(idx, g, T, "f32", 1e-4)


def test_grad_parity_through_encoder():
    """The hashgrid custom-vjp backward (XLA path on CPU) matches autodiff
    through a plain take."""
    from laenerf_tpu.ops.hashgrid import (HashGridSpec, hashgrid_encode,
                                          hashgrid_init)

    spec = HashGridSpec(num_levels=4, level_dim=2, base_resolution=4,
                        log2_hashmap_size=8, per_level_scale=1.5)
    key = jax.random.PRNGKey(0)
    table = hashgrid_init(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3), minval=-1,
                           maxval=1)

    def loss(t):
        return jnp.sum(hashgrid_encode(t, x, spec, bound=1.0) ** 2)

    grad = jax.grad(loss)(table)
    # numeric check on a handful of touched rows
    eps = 1e-3
    touched = np.nonzero(np.abs(np.asarray(grad)).sum(-1))[0][:5]
    for t in touched:
        t2 = table.at[t, 0].add(eps)
        t3 = table.at[t, 0].add(-eps)
        num = (loss(t2) - loss(t3)) / (2 * eps)
        assert abs(float(num) - float(grad[t, 0])) < 1e-2 * max(
            1.0, abs(float(num)))
