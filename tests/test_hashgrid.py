"""Hash-grid encoder tests: layout math vs the reference's table-offset
formulas, interpolation vs a NumPy reference, and gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np

from laenerf_tpu.ops.hashgrid import (
    HashGridSpec,
    hashgrid_init,
    hashgrid_encode,
    hashgrid_tv_loss,
)

_PRIMES = (1, 2654435761, 805459861)


def test_offsets_match_reference_formula():
    # mirrors gridencoder/grid.py:117-131
    spec = HashGridSpec.create(
        desired_resolution=2048, num_levels=16, base_resolution=16,
        log2_hashmap_size=19,
    )
    offsets, offset = [], 0
    for i in range(16):
        res = int(np.ceil(16 * spec.per_level_scale ** i))
        n = min(2 ** 19, (res + 1) ** 3)
        n = int(np.ceil(n / 8) * 8)
        offsets.append(offset)
        offset += n
    assert spec.level_offsets == tuple(offsets)
    assert spec.table_rows == offset
    # per_level_scale formula (grid.py:101-102)
    np.testing.assert_allclose(
        spec.per_level_scale, np.exp2(np.log2(2048 / 16) / 15), rtol=1e-12
    )


def test_dense_level_trilinear_interp():
    """On a dense (non-hashed) level, the encoder must do exact trilinear
    interpolation of the table entries."""
    spec = HashGridSpec(num_levels=1, level_dim=2, base_resolution=4,
                        per_level_scale=1.0, log2_hashmap_size=19)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (spec.table_rows, 2))

    # scale = 4 - 1 = 3, res = 4; pos = u*3 + 0.5
    u = np.array([[0.3, 0.6, 0.1]], dtype=np.float32)
    x = u * 2.0 - 1.0  # map to [-1, 1] since bound=1
    out = np.asarray(hashgrid_encode(table, jnp.array(x), spec, bound=1.0))

    # NumPy reference
    tab = np.asarray(table)
    pos = u[0] * 3.0 + 0.5
    pg = np.floor(pos).astype(int)
    fr = pos - pg
    stride = [1, 5, 25]  # res+1 = 5
    expect = np.zeros(2)
    for corner in range(8):
        w = 1.0
        idx = 0
        for d in range(3):
            b = (corner >> d) & 1
            w *= fr[d] if b else (1 - fr[d])
            idx += (pg[d] + b) * stride[d]
        expect += w * tab[idx % spec.level_sizes[0]]
    np.testing.assert_allclose(out[0], expect, rtol=1e-5)


def test_oob_inputs_zero():
    spec = HashGridSpec(num_levels=2, base_resolution=4, per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(0), spec) + 1.0  # nonzero
    x = jnp.array([[2.0, 0.0, 0.0]])  # outside [-1, 1]
    out = hashgrid_encode(table, x, spec, bound=1.0)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_hash_level_uses_fast_hash():
    """A level whose dense size exceeds the hashmap must use the prime hash."""
    spec = HashGridSpec(num_levels=1, level_dim=1, base_resolution=64,
                        per_level_scale=1.0, log2_hashmap_size=10)
    assert spec.level_sizes[0] == 1024
    table = jnp.arange(spec.table_rows, dtype=jnp.float32)[:, None]

    # pick an input exactly on a grid corner so only one corner has weight 1
    # pos = u*63 + 0.5 -> choose u so pos lands mid-cell won't work; instead
    # verify against a python reimplementation of the full interp.
    u = np.array([[0.37, 0.81, 0.22]], dtype=np.float32)
    x = jnp.array(u * 2.0 - 1.0)
    out = float(hashgrid_encode(table, x, spec, bound=1.0)[0, 0])

    pos = u[0] * 63.0 + 0.5
    pg = np.floor(pos).astype(np.uint32)
    fr = pos - pg
    expect = 0.0
    for corner in range(8):
        w, h = 1.0, np.uint32(0)
        for d in range(3):
            b = (corner >> d) & 1
            w *= fr[d] if b else (1 - fr[d])
            h ^= np.uint32((int(pg[d]) + b) * _PRIMES[d] & 0xFFFFFFFF)
        expect += w * float(h % 1024)
    np.testing.assert_allclose(out, expect, rtol=1e-4)


def test_gradients_flow_to_table():
    spec = HashGridSpec.create(desired_resolution=64, num_levels=4,
                               base_resolution=4, log2_hashmap_size=12)
    table = hashgrid_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)

    def loss(t):
        return jnp.sum(hashgrid_encode(t, x, spec) ** 2)

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_gradients_flow_to_inputs():
    spec = HashGridSpec.create(desired_resolution=64, num_levels=4,
                               base_resolution=4, log2_hashmap_size=12)
    table = jax.random.normal(jax.random.PRNGKey(0), (spec.table_rows, 2))
    x = jnp.array([[0.1, -0.2, 0.3]])
    g = jax.grad(lambda p: jnp.sum(hashgrid_encode(table, p, spec)))(x)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_tv_loss_positive_and_differentiable():
    spec = HashGridSpec(num_levels=2, base_resolution=8, per_level_scale=2.0,
                        log2_hashmap_size=12)
    table = jax.random.normal(jax.random.PRNGKey(0), (spec.table_rows, 2))
    loss = hashgrid_tv_loss(table, jax.random.PRNGKey(1), spec, n_points=512)
    assert float(loss) > 0
    g = jax.grad(hashgrid_tv_loss)(table, jax.random.PRNGKey(1), spec, 512)
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_smoothstep_interpolation():
    spec = HashGridSpec(num_levels=1, level_dim=1, base_resolution=4,
                        per_level_scale=1.0, interpolation="smoothstep")
    table = jnp.ones((spec.table_rows, 1))
    # constant table -> output 1 regardless of interpolation
    x = jnp.array([[0.123, -0.456, 0.789]])
    np.testing.assert_allclose(
        np.asarray(hashgrid_encode(table, x, spec)), 1.0, rtol=1e-5
    )


def test_paired_gather_matches_dense_level():
    """On a dense level the paired path must equal exact trilinear interp
    (the unpaired path)."""
    import dataclasses

    spec = HashGridSpec(num_levels=1, level_dim=2, base_resolution=4,
                        per_level_scale=1.0, log2_hashmap_size=19)
    spec_p = dataclasses.replace(spec, paired_gather=True)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (spec.table_rows, 2))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1,
                           maxval=1)
    a = hashgrid_encode(table, x, spec)
    b = hashgrid_encode(table, x, spec_p)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_paired_gather_trains_equivalently():
    """On hashed levels the layouts differ (additive-x hash), but gradient
    flow and continuity must hold: nearby inputs give nearby outputs."""
    import dataclasses

    spec = HashGridSpec.create(desired_resolution=128, num_levels=4,
                               base_resolution=4, log2_hashmap_size=8,
                               paired_gather=True)
    table = jax.random.normal(jax.random.PRNGKey(0), (spec.table_rows, 2))
    x = jnp.array([[0.1, 0.2, 0.3]])
    eps = 1e-4
    a = hashgrid_encode(table, x, spec)
    b = hashgrid_encode(table, x + eps, spec)
    assert float(jnp.abs(a - b).max()) < 0.1  # continuous
    g = jax.grad(lambda t: jnp.sum(hashgrid_encode(t, x, spec) ** 2))(table)
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_octo_gather_matches_dense_levels():
    """Dense levels under the octo layout keep exact strided indexing, so
    the encoding must be bit-identical to the plain path."""
    import dataclasses

    spec = HashGridSpec.create(desired_resolution=16, num_levels=3,
                               level_dim=2, base_resolution=4,
                               log2_hashmap_size=19)
    spec_o = dataclasses.replace(spec, octo_gather=True)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (spec.table_rows, 2))
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), minval=-1,
                           maxval=1)
    a = hashgrid_encode(table, x, spec)
    b = hashgrid_encode(table, x, spec_o)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-7)


def test_octo_gather_grads_and_continuity():
    """Hashed levels use the additive lattice hash: outputs must stay
    continuous in the input and gradients must reach the base table
    (through the 8-wide overlapped view's roll/concat transpose)."""
    spec = HashGridSpec.create(desired_resolution=256, num_levels=5,
                               level_dim=2, base_resolution=8,
                               log2_hashmap_size=10, octo_gather=True)
    table = jax.random.normal(jax.random.PRNGKey(0), (spec.table_rows, 2))
    x = jnp.array([[0.1, 0.2, 0.3], [-0.4, 0.5, -0.6]])
    eps = 1e-4
    a = hashgrid_encode(table, x, spec)
    b = hashgrid_encode(table, x + eps, spec)
    assert float(jnp.abs(a - b).max()) < 0.1  # continuous
    g = jax.grad(lambda t: jnp.sum(hashgrid_encode(t, x, spec) ** 2))(table)
    assert float(jnp.sum(jnp.abs(g))) > 0
    # numeric gradient check against the analytic one on touched rows
    f = lambda t: float(jnp.sum(hashgrid_encode(t, x, spec) ** 2))
    r = int(np.argmax(np.abs(np.asarray(g[:, 0]))))
    e = 1e-3
    fd = (f(table.at[r, 0].add(e)) - f(table.at[r, 0].add(-e))) / (2 * e)
    np.testing.assert_allclose(fd, float(g[r, 0]), rtol=1e-2, atol=1e-5)


def test_octo_corner_offsets_additive():
    """idx(x+dx, y+dy, z+dz) == (base + offset_c) mod size for every level
    type (the property the 8-wide overlapped view relies on)."""
    from laenerf_tpu.ops.hashgrid import (_octo_base_indices,
                                          _octo_corner_offsets)

    spec = HashGridSpec.create(desired_resolution=512, num_levels=6,
                               level_dim=2, base_resolution=4,
                               log2_hashmap_size=12, octo_gather=True)
    rng = np.random.RandomState(0)
    for level in range(spec.num_levels):
        res = spec.level_resolutions[level]
        size = spec.level_sizes[level]
        off = spec.level_offsets[level]
        coords = jnp.asarray(rng.randint(0, max(res - 1, 1), (32, 3)))
        base = np.asarray(_octo_base_indices(spec, level, coords)) - off
        offs = _octo_corner_offsets(spec, level)
        for c in range(8):
            d = jnp.array([(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1])
            idx_c = np.asarray(
                _octo_base_indices(spec, level, coords + d)) - off
            np.testing.assert_array_equal(idx_c, (base + offs[c]) % size)


def test_octo_view_f8_close():
    """The fp8 inference view must reproduce bf16-view features to fp8
    rounding (~6% relative), with identical zero/oob handling."""
    import jax
    import jax.numpy as jnp
    from laenerf_tpu.ops.hashgrid import (HashGridSpec, hashgrid_encode,
                                          hashgrid_init, octo_view)

    spec = HashGridSpec(num_levels=4, level_dim=4, log2_hashmap_size=12,
                        octo_gather=True, gather_dtype="bf16")
    key = jax.random.PRNGKey(3)
    # realistic magnitude spread (trained tables span ~1e-3..1e0)
    table = hashgrid_init(key, spec) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(5), (512, 3),
                           minval=-1.2, maxval=1.2)  # includes oob
    ref = hashgrid_encode(table, x, spec, bound=1.0,
                          view=octo_view(table, spec))
    f8 = hashgrid_encode(table, x, spec, bound=1.0,
                         view=octo_view(table, spec, dtype="f8"))
    ref, f8 = jnp.asarray(ref, jnp.float32), jnp.asarray(f8, jnp.float32)
    # corner interpolation cancels zero-mean features, so RELATIVE error is
    # unbounded; the fp8 guarantee is absolute error ~<= 2*eps_e4m3 * the
    # corner magnitude scale (here ~1.0). Quality on a trained model is
    # judged by the render PSNR A/B in perf/profile_render.py --view_f8.
    scale = float(jnp.max(jnp.abs(table)))
    err = float(jnp.max(jnp.abs(ref - f8)))
    assert err < 0.15 * scale, (err, scale)
    # oob rows stay exactly zero
    import numpy as np
    oob = np.any(np.abs(np.asarray(x)) > 1.0, axis=-1)
    assert np.all(np.asarray(f8)[oob] == 0)


def test_octo_view_custom_fold_matches_autodiff():
    """The transposed-space view-grad fold (custom VJP, added after the
    autodiff fold's 64x tile-padded temps OOM'd the L16C2 quality gate)
    must match plain autodiff through the roll/concat forward exactly."""
    from laenerf_tpu.ops.hashgrid import _octo_view_impl, octo_view

    spec = HashGridSpec.create(desired_resolution=128, num_levels=6,
                               level_dim=2, base_resolution=8,
                               log2_hashmap_size=11, octo_gather=True)
    table = jax.random.normal(jax.random.PRNGKey(3), (spec.table_rows, 2))
    # a fixed nontrivial cotangent on every view element
    def loss(fn, t):
        views = fn(t, spec, "")
        return sum(jnp.sum(jnp.sin(v.astype(jnp.float32)) * (i + 1))
                   for i, v in enumerate(views))

    g_auto = jax.grad(lambda t: loss(_octo_view_impl, t))(table)
    g_cust = jax.grad(lambda t: loss(octo_view, t))(table)
    np.testing.assert_allclose(np.asarray(g_cust), np.asarray(g_auto),
                               rtol=1e-6, atol=1e-6)

    # bf16 view mode (the training configuration): the custom fold sums the
    # 8 corner contributions in f32 while autodiff's roll-transpose sums in
    # bf16, so they agree only to bf16 accumulation noise. The custom fold
    # is verified EXACTLY against an f32 NumPy fold of the quantized
    # cotangents below.
    g_auto16 = jax.grad(lambda t: loss(
        lambda t_, s, d: _octo_view_impl(t_, s, "bf16"), t))(table)
    g_cust16 = jax.grad(lambda t: loss(
        lambda t_, s, d: octo_view(t_, s, "bf16"), t))(table)
    np.testing.assert_allclose(np.asarray(g_cust16), np.asarray(g_auto16),
                               rtol=0.05, atol=0.5)

    from laenerf_tpu.ops.hashgrid import _octo_corner_offsets

    views = [np.asarray(v).astype(np.float32)
             for v in _octo_view_impl(table, spec, "bf16")]
    C = spec.level_dim
    g_ref = np.zeros((spec.table_rows, C), np.float32)
    for lvl, v in enumerate(views):
        ct = (np.cos(v) * (lvl + 1)).astype(jnp.bfloat16).astype(np.float32)
        offs = _octo_corner_offsets(spec, lvl)
        base, size = spec.level_offsets[lvl], spec.level_sizes[lvl]
        for c in range(8):
            g_ref[base:base + size] += np.roll(ct[:, c * C:(c + 1) * C],
                                               offs[c], axis=0)
    np.testing.assert_allclose(np.asarray(g_cust16), g_ref, rtol=1e-6,
                               atol=1e-6)
