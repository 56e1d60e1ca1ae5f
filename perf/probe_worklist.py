"""Probe: work-list scatter-add kernel (scalar-prefetched index_maps,
revisited output blocks, one-hot MXU accumulation). Correctness vs XLA
scatter + timing at production size.

Usage: python -u perf/probe_worklist.py [--platform cpu --interpret]
"""

import argparse
import sys
import time

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None)
parser.add_argument("--interpret", action="store_true")
parser.add_argument("--small", action="store_true")
args = parser.parse_args()

import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from laenerf_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

if args.small:
    TILE, MAXU, C = 256, 256, 8
    LEVEL_SIZES = [1024, 4096, 8192]
    B, LK = 2048, 6
else:
    TILE, MAXU, C = 1024, 1024, 8
    LEVEL_SIZES = [4920, 35944, 274632] + [524288] * 5
    B, LK = 65536, 32

T = sum(LEVEL_SIZES)
T_PAD = ((T + TILE - 1) // TILE) * TILE
N_TILES = T_PAD // TILE
Q = B * LK
W_CAP = N_TILES + (Q + MAXU - 1) // MAXU + 8

rng = np.random.RandomState(0)
level_offs = np.cumsum([0] + LEVEL_SIZES)[:-1]
idx_np = np.zeros((B, LK), np.int32)
blob = np.clip(rng.randn(B, 3) * 0.15 + 0.5, 0, 1)
for l, (sz, off) in enumerate(zip(LEVEL_SIZES, level_offs)):
    for k in range(LK // len(LEVEL_SIZES) if args.small else 4):
        kk = l * (LK // len(LEVEL_SIZES) if args.small else 4) + k
        if sz < 500000:
            res = max(2, round(sz ** (1 / 3)))
            cell = np.minimum((blob * res).astype(np.int64), res - 1)
            flat = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2] + k
            idx_np[:, kk] = off + np.minimum(flat, sz - 1)
        else:
            idx_np[:, kk] = off + rng.randint(0, sz, B)
idx = jnp.asarray(idx_np.reshape(-1))
g = jnp.asarray(rng.randn(Q, C).astype(np.float32))

Q_BLKS = (Q + MAXU - 1) // MAXU + 1  # + slack block of padding


N_GRP = MAXU // 128  # update groups of 128 lanes each


def _kernel(wt_ref, wb_ref, wfirst_ref, wreal_ref, qs_ref, gs_ref, out_ref):
    w = pl.program_id(0)
    base = wt_ref[w] * TILE

    @pl.when(wfirst_ref[w] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(wreal_ref[w] == 1)
    def _():
        local = qs_ref[:] - base  # [N_GRP, 128]
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 0)
        acc = jnp.zeros((TILE, C), jnp.float32)
        for grp in range(N_GRP):
            oh = (row_iota == local[grp, :][None, :]).astype(jnp.float32)
            acc = acc + jnp.dot(oh, gs_ref[grp * 128:(grp + 1) * 128, :],
                                preferred_element_type=jnp.float32)
        out_ref[:] += acc


grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=4,
    grid=(W_CAP,),
    in_specs=[
        pl.BlockSpec((N_GRP, 128), lambda w, wt, wb, wf, wr: (wb[w], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((MAXU, C), lambda w, wt, wb, wf, wr: (wb[w], 0),
                     memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((TILE, C), lambda w, wt, wb, wf, wr: (wt[w], 0),
                           memory_space=pltpu.VMEM),
)

scatter_call = pl.pallas_call(
    _kernel,
    grid_spec=grid_spec,
    out_shape=jax.ShapeDtypeStruct((T_PAD, C), jnp.float32),
    interpret=args.interpret,
)


@jax.jit
def scatter_pallas(idx_in, g_in):
    order = jnp.argsort(idx_in)
    qs = jnp.take(idx_in, order)
    gs = jnp.take(g_in, order, axis=0)
    # pad to whole blocks; padding rows target nothing (index T_PAD+7)
    pad = Q_BLKS * MAXU - Q
    qs_p = jnp.concatenate([qs, jnp.full((pad,), T_PAD + 7, jnp.int32)])
    gs_p = jnp.concatenate([gs, jnp.zeros((pad, C), jnp.float32)])

    bounds = jnp.arange(N_TILES + 1, dtype=jnp.int32) * TILE
    lo = jnp.searchsorted(qs, bounds).astype(jnp.int32)
    cnt = lo[1:] - lo[:-1]
    blk_lo = lo[:-1] // MAXU
    blk_hi = (jnp.maximum(lo[1:], 1) - 1) // MAXU  # inclusive; dummy if cnt=0
    n_work = jnp.where(cnt > 0, blk_hi - blk_lo + 1, 1)
    cum = jnp.cumsum(n_work)
    total = cum[-1]
    # expand: work item w -> tile via searchsorted, block via offset
    w_ids = jnp.arange(W_CAP, dtype=jnp.int32)
    wt = jnp.searchsorted(cum, w_ids, side="right").astype(jnp.int32)
    wt_c = jnp.minimum(wt, N_TILES - 1)
    w_off = w_ids - jnp.where(wt_c > 0, cum[wt_c - 1], 0)
    wreal = ((w_ids < total) & (jnp.take(cnt, wt_c) > 0)).astype(jnp.int32)
    wfirst = ((w_off == 0) & (w_ids < total)).astype(jnp.int32)
    wb = jnp.where(wreal == 1, jnp.take(blk_lo, wt_c) + w_off, Q_BLKS - 1)
    wb = jnp.clip(wb, 0, Q_BLKS - 1).astype(jnp.int32)
    wt_final = jnp.minimum(wt, N_TILES - 1).astype(jnp.int32)

    return scatter_call(wt_final, wb, wfirst, wreal,
                        qs_p.reshape(Q_BLKS * N_GRP, 128), gs_p)


@jax.jit
def scatter_xla(idx_in, g_in):
    flat = (idx_in[:, None] * C + jnp.arange(C, dtype=jnp.int32)).reshape(-1)
    z = jnp.zeros((T_PAD * C,), jnp.float32).at[flat].add(g_in.reshape(-1))
    return z.reshape(T_PAD, C)


print(f"device={jax.devices()[0].device_kind} Q={Q} T={T} "
      f"N_TILES={N_TILES} W_CAP={W_CAP}", flush=True)

ref = scatter_xla(idx, g)
got = scatter_pallas(idx, g)
err = float(jnp.max(jnp.abs(got - ref)))
rel = err / (float(jnp.max(jnp.abs(ref))) + 1e-9)
print(f"correctness: max abs err {err:.3e} (rel {rel:.3e})", flush=True)


def timeit(fn, label, n=12):
    jax.block_until_ready(fn(idx, g))
    t0 = time.time()
    for i in range(n):
        r = fn(idx + (i % 2), g)
    jax.block_until_ready(r)
    per = (time.time() - t0) / n
    print(f"{label:40s} {per * 1e3:9.2f} ms ({per / (Q * C) * 1e9:5.2f} "
          f"ns/scalar)", flush=True)


timeit(scatter_xla, "XLA scatter")
timeit(scatter_pallas, "pallas work-list scatter")


# decompose the sort stage
@jax.jit
def sort_stage_only(idx_in, g_in):
    order = jnp.argsort(idx_in)
    qs = jnp.take(idx_in, order)
    gs = jnp.take(g_in, order, axis=0)
    return qs[:1], gs[:1]

timeit(sort_stage_only, "  sort+reorder only")


@jax.jit
def argsort_only(idx_in, g_in):
    return jnp.argsort(idx_in)[:1], g_in[:1]

timeit(argsort_only, "  argsort only")


@jax.jit
def take_g_only(idx_in, g_in):
    return jnp.take(g_in, idx_in % Q, axis=0)[:1]

timeit(take_g_only, "  take g f32 only")


@jax.jit
def take_g_bf16(idx_in, g_in):
    return jnp.take(g_in.astype(jnp.bfloat16), idx_in % Q, axis=0)[:1]

timeit(take_g_bf16, "  take g bf16 only")

print("done", flush=True)
