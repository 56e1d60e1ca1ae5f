"""Multi-resolution hash/tiled grid encoding (instant-ngp style).

TPU-native equivalent of the reference's gridencoder CUDA extension
(/root/reference/gridencoder/src/gridencoder.cu:51-370,
/root/reference/gridencoder/grid.py:96-161). Matches its semantics exactly:

  * per-level scale  = exp2(level * log2(per_level_scale)) * base_res - 1
  * resolution       = ceil(scale) + 1
  * table size/level = min(2**log2_hashmap_size, (res [+1])**D) rounded up to 8
  * dense indexing below the hashmap threshold, xor-multiply "fast hash" with
    primes {1, 2654435761, 805459861, ...} above it
  * corner lerp (optionally smoothstep), out-of-[0,1] inputs produce zeros
  * embeddings initialised U(-1e-4, 1e-4), output layout [B, L*C]

Design: instead of the reference's one-thread-per-(point,level) CUDA kernel
with half-precision atomicAdd backward, all (level, corner) gathers are
batched into a single [B, L*2^D] gather from one flat parameter table and the
interpolation is one einsum — XLA keeps everything fused, the backward pass
becomes one scatter-add, and accumulation stays fp32 (no half atomics).
"""

import dataclasses
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static configuration of a multi-resolution grid encoder."""

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    per_level_scale: float = 2.0
    gridtype: str = "hash"  # "hash" | "tiled"
    align_corners: bool = False
    interpolation: str = "linear"  # "linear" | "smoothstep"
    # TPU optimization: fetch the two x-adjacent corners of each cell as ONE
    # row from an overlapped [T, 2C] view of the table (XLA row gathers are
    # latency-bound per row — measured ~2x). Requires an additive-x hash so
    # corner (x+1, y, z) lands at row (x, y, z) + 1; dense levels already
    # have x-stride 1. Quality-neutral in practice (instant-ngp notes the
    # exact hash barely matters, gridencoder.cu:77-78).
    paired_gather: bool = False
    # Stronger variant: ALL 8 corners of a cell in ONE [8C] row from an
    # 8-wide overlapped view. Requires a fully additive per-level layout
    # idx = (x + sy*y + sz*z) mod size, so hashed levels become a linear
    # lattice hash with large odd strides (a pseudo-random variant of the
    # reference's "tiled" gridtype, gridencoder.cu:66-84). Dense levels keep
    # their exact strided indexing. 4x fewer gather rows than paired in the
    # forward AND 4x fewer scatter rows in the backward. Hashed level sizes
    # must be a power of two (true for gridtype="hash": min(2^H, ...)).
    octo_gather: bool = False
    # Cast the gathered source (table/overlapped view) to this dtype before
    # the gather. XLA's TPU row gather is byte-throughput-bound (~5.5 GB/s
    # effective, measured perf/microbench row sweep), so "bf16" nearly
    # halves encoder gather time; interpolation stays in f32/compute_dtype.
    gather_dtype: str = "f32"  # "f32" | "bf16"

    @staticmethod
    def create(desired_resolution=None, **kwargs) -> "HashGridSpec":
        """Build a spec, optionally deriving per_level_scale from the desired
        finest resolution (reference: gridencoder/grid.py:100-102)."""
        spec = HashGridSpec(**kwargs)
        if desired_resolution is not None:
            s = math.exp2(
                math.log2(desired_resolution / spec.base_resolution)
                / (spec.num_levels - 1)
            )
            spec = dataclasses.replace(spec, per_level_scale=s)
        return spec

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @property
    def level_scales(self) -> Tuple[float, ...]:
        s = math.log2(self.per_level_scale)
        return tuple(
            math.exp2(l * s) * self.base_resolution - 1.0
            for l in range(self.num_levels)
        )

    @property
    def level_resolutions(self) -> Tuple[int, ...]:
        return tuple(int(math.ceil(sc)) + 1 for sc in self.level_scales)

    @property
    def level_sizes(self) -> Tuple[int, ...]:
        """Number of table rows per level (padded to a multiple of 8)."""
        max_params = 2 ** self.log2_hashmap_size
        sizes = []
        for l in range(self.num_levels):
            res = int(math.ceil(self.base_resolution * self.per_level_scale ** l))
            n = min(max_params, (res if self.align_corners else res + 1) ** self.input_dim)
            sizes.append(int(math.ceil(n / 8) * 8))
        return tuple(sizes)

    @property
    def level_offsets(self) -> Tuple[int, ...]:
        offs, o = [], 0
        for s in self.level_sizes:
            offs.append(o)
            o += s
        return tuple(offs)

    @property
    def table_rows(self) -> int:
        return sum(self.level_sizes)


def hashgrid_init(key, spec: HashGridSpec, dtype=jnp.float32):
    """Initialise the embedding table U(-1e-4, 1e-4) (grid.py:138-140)."""
    return jax.random.uniform(
        key, (spec.table_rows, spec.level_dim), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


# Below this many update rows the XLA flat scatter wins (kernel launch +
# sort overheads dominate); above it the Pallas work-list kernel is ~4.7x
# faster (48 vs 227 ms at the 2M-row training shape, see ops/scatter_add.py).
_PALLAS_SCATTER_MIN_ROWS = 1 << 16


@jax.custom_vjp
def _gather_rows(table, idx):
    """Row gather with a custom scatter-add backward.

    The reference accumulates with half-precision atomicAdd
    (gridencoder.cu:323-338). Here the backward is either a flat-scalar XLA
    scatter (CPU / small batches) or the sorted work-list MXU kernel in
    ops/scatter_add.py (TPU training shapes) — both accumulate in fp32,
    strictly more precise than fp16 atomics.
    """
    return jnp.take(table, idx, axis=0)


def _gather_rows_fwd(table, idx):
    return jnp.take(table, idx, axis=0), (idx, table.shape)


def _scatter_rows_dispatch(q, g2, T, out_dtype=None):
    """Route a row scatter-add to the Pallas work-list kernel (TPU, big
    batches) or the XLA flat scatter (CPU / small batches).

    LAENERF_FORCE_PALLAS_SCATTER routes through the Pallas kernel regardless
    of backend/size (interpret mode off-TPU): used by the multichip dryrun
    and mesh tests so the code path that runs on real TPU meshes is the one
    exercised, not the XLA fallback.
    """
    import os

    from .scatter_add import scatter_add_rows, scatter_add_rows_xla

    force = os.environ.get("LAENERF_FORCE_PALLAS_SCATTER") == "1"
    if force or (jax.default_backend() == "tpu"
                 and q.shape[0] >= _PALLAS_SCATTER_MIN_ROWS):
        # the r4 "v2" narrow-window variant measured 2.6x SLOWER end-to-end
        # on v5e (248 vs 95 ms/train-step, perf/profile_step2.py r5 A/B):
        # its per-128-update grid steps serialize window flushes that the
        # work-list kernel amortizes over 2048-update blocks. Deleted.
        return scatter_add_rows(q, g2, T, out_dtype=out_dtype)
    out = scatter_add_rows_xla(q, g2, T)
    return out.astype(out_dtype) if out_dtype is not None else out


def _gather_rows_bwd(res, g):
    idx, (T, C) = res
    q = idx.reshape(-1).astype(jnp.int32)
    g2 = g.reshape(-1, C)
    grad = _scatter_rows_dispatch(q, g2, T, out_dtype=g.dtype)
    return grad, None


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_rows_multi(sizes, views, idx):
    """Per-level row gather with a SINGLE combined scatter-add backward.

    Args:
      sizes: static tuple of per-level row counts (== v.shape[0] per view).
      views: tuple of L [size_l, W] arrays (the per-level octo views).
      idx: [B, L] int32 LOCAL row index into each level's view.
    Returns:
      [B, L, W] gathered rows.

    Forward gathers level-by-level (operand-footprint-bound: ~4x faster
    than one gather from the concatenated view). Backward concatenates the
    levels back into one scatter-add over the stacked view space — one
    Pallas work-list launch instead of L (launch + sort overheads made L
    separate scatters ~2x slower at training shapes, measured r3).
    """
    return jnp.stack([jnp.take(views[l], idx[:, l], axis=0)
                      for l in range(len(views))], axis=1)


def _gather_rows_multi_fwd(sizes, views, idx):
    return _gather_rows_multi(sizes, views, idx), idx


def _gather_rows_multi_bwd(sizes, idx, g):
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)
    W = g.shape[-1]
    q = (idx + jnp.asarray(offs)[None, :]).reshape(-1).astype(jnp.int32)
    g2 = g.reshape(-1, W)
    grad = _scatter_rows_dispatch(q, g2, int(sum(sizes)), out_dtype=g.dtype)
    out = tuple(
        jax.lax.dynamic_slice_in_dim(grad, int(o), int(s), axis=0)
        for o, s in zip(offs, sizes))
    return out, None


_gather_rows_multi.defvjp(_gather_rows_multi_fwd, _gather_rows_multi_bwd)


def _fast_hash(coords):
    """XOR-multiply hash over the last axis of uint32 coords [..., D]."""
    D = coords.shape[-1]
    result = jnp.zeros(coords.shape[:-1], dtype=jnp.uint32)
    for d in range(D):
        result = result ^ (coords[..., d] * jnp.uint32(_PRIMES[d]))
    return result


def _pair_base_indices(spec: HashGridSpec, level: int, coords):
    """Row index of corner (x, y, z) under the additive-x layout, such that
    corner (x+1, y, z) is at the next row (mod table size).

    Dense levels already have x-stride 1; hashed levels use
    (x + fast_hash(0, y, z)) instead of xoring x in.
    """
    D = spec.input_dim
    res = spec.level_resolutions[level]
    size = spec.level_sizes[level]
    stride_base = res if spec.align_corners else res + 1

    c = coords.astype(jnp.uint32)
    if stride_base ** D <= size or spec.gridtype != "hash":
        index = jnp.zeros(c.shape[:-1], dtype=jnp.uint32)
        stride = 1
        for d in range(D):
            if stride <= size:
                index = index + c[..., d] * jnp.uint32(stride)
            stride *= stride_base
    else:
        rest = c.at[..., 0].set(0)
        index = c[..., 0] + _fast_hash(rest)
    index = index % jnp.uint32(size)
    return index.astype(jnp.int32) + spec.level_offsets[level]


def _octo_strides(spec: HashGridSpec, level: int):
    """Per-level (sy, sz) row strides for the fully additive octo layout.

    Dense levels keep the exact strided indexing of _corner_indices
    (x-major: 1, stride_base, stride_base^2). Hashed levels use large odd
    strides reduced mod the (power-of-two) level size — a linear lattice
    hash. Additivity survives uint32 overflow because the level size
    divides 2^32.
    """
    D = spec.input_dim
    res = spec.level_resolutions[level]
    size = spec.level_sizes[level]
    stride_base = res if spec.align_corners else res + 1
    if stride_base ** D <= size or spec.gridtype != "hash":
        return stride_base, stride_base * stride_base
    assert size & (size - 1) == 0, (
        "octo_gather requires power-of-two hashed level sizes")
    return int(_PRIMES[1] % size) | 1, int(_PRIMES[2] % size) | 1


def _octo_corner_offsets(spec: HashGridSpec, level: int):
    """Row offsets of the 8 cell corners relative to the (0,0,0) corner,
    in corner order c = dx + 2*dy + 4*dz."""
    sy, sz = _octo_strides(spec, level)
    size = spec.level_sizes[level]
    return [((c & 1) + sy * ((c >> 1) & 1) + sz * ((c >> 2) & 1)) % size
            for c in range(8)]


def _octo_view_impl(table, spec: HashGridSpec, dtype: str):
    eff = dtype or spec.gather_dtype
    if eff == "bf16":
        table = table.astype(jnp.bfloat16)
    elif eff == "f8":
        # inference-only quantized view: fp8 rows halve the per-level
        # operand footprint again vs bf16 (the gather cost knee sits at
        # ~16 MB/level on v5e, docs/PERF.md r3 microbench table); the
        # interpolation upcasts after the gather. Never used in training —
        # Trainer.render_image opts in via RenderConfig.infer_view_dtype.
        table = table.astype(jnp.float8_e4m3fn)
    parts = []
    for level in range(spec.num_levels):
        off = spec.level_offsets[level]
        size = spec.level_sizes[level]
        tbl_l = jax.lax.dynamic_slice_in_dim(table, off, size, axis=0)
        offs = _octo_corner_offsets(spec, level)
        parts.append(jnp.concatenate(
            [jnp.roll(tbl_l, -o, axis=0) for o in offs], axis=1))
    return tuple(parts)


def _octo_fold_level(g_l, offs, C):
    """Fold a view cotangent [size, 8C] onto the level table: [size, C].

    Done in TRANSPOSED [8C, size] space: the naive roll-transpose that
    autodiff emits materializes eight [size, C] temps per level whose
    C (=2 or 4) lanes tile-pad to 128 on TPU — a 32-64x memory expansion
    that OOM'd the 16 GB chip at L16C2 (119 MB per temp, r5 quality-gate
    compile dump). Transposed, the narrow axis is the sublane axis (<=4x
    pad) and the 8 shifted adds run on full 489k-wide lanes.
    """
    gT = g_l.astype(jnp.float32).T  # [8C, size]
    acc = gT[0:C]  # corner 0 has offset 0 (_octo_corner_offsets)
    for c in range(1, 8):
        # forward: view_c[i] = table[(i + o_c) % size]  =>
        # d table[r] += g_c[(r - o_c) % size] == roll(g_c, +o_c)[r]
        acc = acc + jnp.roll(gT[c * C:(c + 1) * C], offs[c], axis=1)
    return acc.T


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _octo_view_cvjp(table, spec, dtype):
    return _octo_view_impl(table, spec, dtype)


def _octo_view_cvjp_fwd(table, spec, dtype):
    return _octo_view_impl(table, spec, dtype), None


def _octo_view_cvjp_bwd(spec, dtype, _, g):
    import os

    C = spec.level_dim
    if os.environ.get("LAENERF_OCTO_FOLD", "transposed") == "xla":
        # the pre-r5 autodiff-equivalent fold (narrow [size, C] roll temps;
        # tile-pads 64x at C=2 — OOMs big configs, kept for runtime A/Bs)
        parts = []
        for level, g_l in enumerate(g):
            offs = _octo_corner_offsets(spec, level)
            gf = g_l.astype(jnp.float32)
            acc = gf[:, 0:C]
            for c in range(1, 8):
                acc = acc + jnp.roll(gf[:, c * C:(c + 1) * C], offs[c],
                                     axis=0)
            parts.append(acc)
        return (jnp.concatenate(parts, axis=0),)
    parts = [
        _octo_fold_level(g_l, _octo_corner_offsets(spec, level), C)
        for level, g_l in enumerate(g)
    ]
    return (jnp.concatenate(parts, axis=0),)


_octo_view_cvjp.defvjp(_octo_view_cvjp_fwd, _octo_view_cvjp_bwd)


def octo_view(table, spec: HashGridSpec, dtype: str = ""):
    """Build PER-LEVEL overlapped views: a tuple of [size_l, 8C] arrays
    where row i of level l holds the features of all 8 corners of the cell
    whose base corner is row i.

    Pure rolls + concats (bandwidth-bound, ~1 ms at the 2.9M-row training
    table); the custom VJP folds the view gradient back onto the base
    table as 8 shifted adds in transposed space (_octo_fold_level — the
    autodiff fold tile-padded 64x and OOM'd at L16C2). Views are emitted
    in spec.gather_dtype (XLA row gathers are byte-bound, so bf16 views
    halve encoder gather bytes).

    Per-level (instead of one concatenated [T, 8C] view) because XLA TPU
    gather throughput depends on the *operand working set*: gathers from a
    33 MB per-level view run ~4x faster than from the 188 MB concatenated
    view (66 vs 268 ns/sample measured at the L8C4/lg19 render spec).

    Inference callers should build this ONCE per frame/step and pass it to
    hashgrid_encode(view=...) so per-chunk calls skip the rebuild.
    """
    return _octo_view_cvjp(table, spec, dtype)


# jitted entry for per-frame callers (Trainer.render_image etc.); spec is
# hashable (frozen dataclass) so it compiles once per grid configuration
octo_view_jit = jax.jit(octo_view, static_argnames=("spec", "dtype"))


def _octo_base_indices(spec: HashGridSpec, level: int, coords):
    """Row of the (0,0,0) corner under the additive octo layout."""
    size = spec.level_sizes[level]
    sy, sz = _octo_strides(spec, level)
    c = coords.astype(jnp.uint32)
    index = c[..., 0] + c[..., 1] * jnp.uint32(sy) + c[..., 2] * jnp.uint32(sz)
    index = index % jnp.uint32(size)
    return index.astype(jnp.int32) + spec.level_offsets[level]


def _corner_indices(spec: HashGridSpec, level: int, corner_coords):
    """Map integer corner coords [..., D] to table row indices for a level.

    Replicates get_grid_index (gridencoder.cu:66-84): dense strided index while
    the running stride fits the hashmap, fast_hash for hash-type levels that
    overflow, final modulo by the level's (padded) table size.
    """
    D = spec.input_dim
    res = spec.level_resolutions[level]
    size = spec.level_sizes[level]
    stride_base = res if spec.align_corners else res + 1

    c = corner_coords.astype(jnp.uint32)
    index = jnp.zeros(c.shape[:-1], dtype=jnp.uint32)
    stride = 1
    overflowed = False
    for d in range(D):
        if stride <= size:
            index = index + c[..., d] * jnp.uint32(stride)
        stride *= stride_base
        if stride > size:
            overflowed = True
    if spec.gridtype == "hash" and overflowed:
        index = _fast_hash(c)
    index = index % jnp.uint32(size)
    return index.astype(jnp.int32) + spec.level_offsets[level]


def hashgrid_encode(table, x, spec: HashGridSpec, bound: float = 1.0,
                    compute_dtype=None, view=None):
    """Encode positions with the multi-resolution grid.

    Args:
      table: [table_rows, level_dim] embedding table.
      x: [..., input_dim] positions in [-bound, bound].
      spec: static grid configuration.
      bound: half side length of the domain.
      compute_dtype: optional dtype for the interpolation math (e.g. bf16).
      view: optional prebuilt octo_view(table, spec) — lets render chunks
        skip the per-call view rebuild (octo_gather only).

    Returns:
      [..., num_levels * level_dim] features, dtype = compute_dtype or table's.
    """
    D = spec.input_dim
    L = spec.num_levels
    C = spec.level_dim
    n_corners = 1 << D

    prefix = x.shape[:-1]
    x = x.reshape(-1, D)
    B = x.shape[0]

    u = (x.astype(jnp.float32) + bound) / (2.0 * bound)  # [B, D] in [0, 1]
    oob = jnp.any((u < 0.0) | (u > 1.0), axis=-1)  # [B]

    if spec.octo_gather and D == 3:
        return _encode_octo(table, u, oob, spec, prefix, compute_dtype, view)
    if spec.paired_gather and D == 3:
        return _encode_paired(table, u, oob, spec, prefix, compute_dtype)

    all_idx = []
    all_w = []
    for level in range(L):
        scale = spec.level_scales[level]
        pos = u * scale + (0.0 if spec.align_corners else 0.5)
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        if spec.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        pos_grid = pos_grid.astype(jnp.int32)

        for corner in range(n_corners):
            bits = [(corner >> d) & 1 for d in range(D)]
            offset = jnp.array(bits, dtype=jnp.int32)
            cc = pos_grid + offset  # [B, D]
            w = jnp.ones((B,), dtype=jnp.float32)
            for d in range(D):
                w = w * (frac[:, d] if bits[d] else (1.0 - frac[:, d]))
            all_idx.append(_corner_indices(spec, level, cc))
            all_w.append(w)

    idx = jnp.stack(all_idx, axis=1)  # [B, L*2^D]
    w = jnp.stack(all_w, axis=1)  # [B, L*2^D]

    src = (table.astype(jnp.bfloat16) if spec.gather_dtype == "bf16"
           else table)
    # flat 1-D index gather (2-D-index gathers compile pathologically
    # slowly on this toolchain's remote AOT compiler)
    vals = _gather_rows(src, idx.reshape(-1)).reshape(
        B, L * n_corners, C)  # [B, L*2^D, C]
    out_dtype = compute_dtype if compute_dtype is not None else table.dtype
    if vals.dtype != out_dtype:
        vals = vals.astype(out_dtype)
    w = w.astype(out_dtype)
    out = jnp.einsum("bk,bkc->bkc", w, vals)
    out = out.reshape(B, L, n_corners, C).sum(axis=2)  # [B, L, C]
    out = jnp.where(oob[:, None, None], 0.0, out)
    return out.reshape(prefix + (L * C,))


def _encode_paired(table, u, oob, spec: HashGridSpec, prefix, compute_dtype):
    """Paired-corner path: gather 4 rows of 2C per (sample, level) from an
    overlapped view where row i = [table[i], table[i+1]]."""
    B = u.shape[0]
    L, C = spec.num_levels, spec.level_dim
    out_dtype = compute_dtype if compute_dtype is not None else table.dtype
    # overlapped view (one roll + concat per call; autodiff folds the
    # gradient back onto the base table)
    if spec.gather_dtype == "bf16":
        table = table.astype(jnp.bfloat16)
    table2 = jnp.concatenate([table, jnp.roll(table, -1, axis=0)], axis=1)

    all_idx, all_w0, all_w1 = [], [], []
    for level in range(L):
        scale = spec.level_scales[level]
        pos = u * scale + (0.0 if spec.align_corners else 0.5)
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        if spec.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        pos_grid = pos_grid.astype(jnp.int32)

        for corner in range(4):  # bits over (y, z); x handled by the pair
            by, bz = corner & 1, (corner >> 1) & 1
            cc = pos_grid + jnp.array([0, by, bz], dtype=jnp.int32)
            wyz = ((frac[:, 1] if by else 1.0 - frac[:, 1])
                   * (frac[:, 2] if bz else 1.0 - frac[:, 2]))
            all_idx.append(_pair_base_indices(spec, level, cc))
            all_w0.append(wyz * (1.0 - frac[:, 0]))
            all_w1.append(wyz * frac[:, 0])

    idx = jnp.stack(all_idx, axis=1)  # [B, L*4]
    w0 = jnp.stack(all_w0, axis=1)
    w1 = jnp.stack(all_w1, axis=1)

    vals = _gather_rows(table2, idx.reshape(-1)).reshape(
        B, L * 4, 2 * C)  # [B, L*4, 2C]
    if vals.dtype != out_dtype:
        vals = vals.astype(out_dtype)
    w0 = w0.astype(out_dtype)
    w1 = w1.astype(out_dtype)
    out = (w0[..., None] * vals[..., :C] + w1[..., None] * vals[..., C:])
    out = out.reshape(B, L, 4, C).sum(axis=2)
    out = jnp.where(oob[:, None, None], 0.0, out)
    return out.reshape(prefix + (L * C,))


def _encode_octo(table, u, oob, spec: HashGridSpec, prefix, compute_dtype,
                 view=None):
    """Octo-corner path: ONE gather of an [8C] row per (sample, level) from
    the 8-wide overlapped view (octo_view). XLA row gathers are
    byte-throughput-bound, so the win comes from spec.gather_dtype="bf16"
    (half the bytes) plus 4x fewer scatter rows in the backward.

    Fully vectorized over levels: every level uses the same additive index
    formula idx = (x + sy*y + sz*z) mod size (+ offset), so level constants
    become [L] arrays and the whole index/weight computation is a handful
    of wide VPU ops instead of L unrolled subgraphs (compiles ~L times
    faster on the remote AOT compiler, same math)."""
    B = u.shape[0]
    L, C = spec.num_levels, spec.level_dim
    if view is None:
        view = octo_view(table, spec)  # tuple of [size_l, 8C]

    scales = jnp.asarray(spec.level_scales, jnp.float32)  # [L]
    strides = np.array([_octo_strides(spec, l) for l in range(L)],
                       np.uint32)  # [L, 2]
    sizes = np.array(spec.level_sizes, np.uint32)

    pos = (u[:, None, :] * scales[None, :, None]
           + (0.0 if spec.align_corners else 0.5))  # [B, L, 3]
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    if spec.interpolation == "smoothstep":
        frac = frac * frac * (3.0 - 2.0 * frac)

    c = pos_grid.astype(jnp.int32).astype(jnp.uint32)  # [B, L, 3]
    idx = (c[..., 0]
           + c[..., 1] * jnp.asarray(strides[:, 0])[None, :]
           + c[..., 2] * jnp.asarray(strides[:, 1])[None, :])
    idx = (idx % jnp.asarray(sizes)[None, :]).astype(jnp.int32)  # [B, L]

    # corner weights, order c = dx + 2*dy + 4*dz (_octo_corner_offsets):
    # w[c] = prod_d (frac_d if bit else 1-frac_d)
    f01 = jnp.stack([1.0 - frac, frac], axis=-1)  # [B, L, 3, 2]
    bits = np.array([[(cc >> d) & 1 for d in range(3)]
                     for cc in range(8)])  # [8, 3]
    w = (f01[:, :, 0, bits[:, 0]] * f01[:, :, 1, bits[:, 1]]
         * f01[:, :, 2, bits[:, 2]])  # [B, L, 8]

    out_dtype = compute_dtype if compute_dtype is not None else table.dtype
    w = w.astype(out_dtype)
    # one gather PER LEVEL from its own view (~4x faster than one gather
    # from the concatenated view — operand-footprint-bound, see octo_view),
    # with a single combined scatter-add backward (_gather_rows_multi)
    vals = _gather_rows_multi(tuple(v.shape[0] for v in view),
                              tuple(view), idx)  # [B, L, 8C]
    import os as _os
    interp = _os.environ.get("LAENERF_INTERP", "wsum")
    vals = vals.astype(out_dtype)
    if interp == "slices":
        out = 0.0
        for corner in range(8):
            out = out + (w[:, :, corner, None]
                         * vals[:, :, corner * C:(corner + 1) * C])
    elif interp == "einsum":
        out = jnp.einsum("blk,blkc->blc", w, vals.reshape(B, L, 8, C))
    else:
        # elementwise multiply-reduce, NOT an einsum: a [B]-batched
        # [1,8]@[8,C] dot_general is pathological for the TPU compiler at
        # render batch sizes
        out = jnp.sum(w[..., None] * vals.reshape(B, L, 8, C), axis=2)
    out = jnp.where(oob[:, None, None], 0.0, out)
    return out.reshape(prefix + (L * C,))


def hashgrid_tv_loss(table, key, spec: HashGridSpec, n_points: int = 65536,
                     bound: float = 1.0, inputs=None):
    """Total-variation regulariser on the grid.

    Differentiable analogue of the reference's grad_total_variation
    (gridencoder.cu:506-610, grid.py:163-185), which injects the TV gradient
    straight into embeddings.grad. Here it is an actual scalar loss: for
    random (or given) points, sum over levels/dims of the squared difference
    between the anchor cell's embedding and its +1 neighbour.
    """
    D = spec.input_dim
    if inputs is None:
        u = jax.random.uniform(key, (n_points, D), dtype=jnp.float32)
    else:
        u = (inputs.reshape(-1, D).astype(jnp.float32) + bound) / (2.0 * bound)

    loss = 0.0
    for level in range(spec.num_levels):
        scale = spec.level_scales[level]
        pos = u * scale + (0.0 if spec.align_corners else 0.5)
        anchor = jnp.floor(pos).astype(jnp.int32)
        idx0 = _corner_indices(spec, level, anchor)
        v0 = jnp.take(table, idx0, axis=0)
        for d in range(D):
            nb = anchor.at[:, d].add(1)
            idx1 = _corner_indices(spec, level, nb)
            v1 = jnp.take(table, idx1, axis=0)
            loss = loss + jnp.mean(jnp.sum((v0 - v1) ** 2, axis=-1))
    return loss / spec.num_levels
