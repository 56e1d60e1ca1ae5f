"""Round-2 microbenchmarks: can we beat XLA's gather/scatter on TPU?

Round-1 measurements (docs/PERF.md) put the hash-grid table gather at
~7-20 ns/row and the scatter-add backward at ~13 ns/scalar — 60-75% of the
train step. This suite probes the candidate structural fixes:

  A. plain row gather (baseline)
  B. gather with indices_are_sorted (data presorted on host)
  C. sort cost itself (argsort on device)
  D. flat scalar scatter-add (round-1 baseline)
  E. scatter-add with sorted+unique flags on presorted unique indices
  F. sorted-duplicate scatter (sorted, NOT unique)
  G. Pallas probe: take_along_axis sublane gather from a VMEM-resident
     [R, 128] table (the lane-bucketed design from docs/DESIGN.md §6)
  H. one-hot matmul gather for a small (4k-row) table (MXU route)

Timing per the tunnel protocol (memory: axon fake sync): chain n dependent
calls on device, then one d2h fetch; report (t_total - t_1call) / (n - 1).

Usage: python -u perf/microbench_gather.py [--platform tpu]
"""

import argparse
import functools
import sys
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None)
parser.add_argument("--n", type=int, default=16, help="chained reps")
parser.add_argument("--big", type=int, default=1 << 20, help="query count")
args = parser.parse_args()

import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from laenerf_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

T = 1 << 19  # table rows (2^19, the big hash level)
C = 8  # channels per row (L8C4-paired layout)
B = args.big
N_REP = args.n

key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (T, C), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, T, jnp.int32)
idx_sorted = jnp.sort(idx)
vals = jax.random.normal(jax.random.PRNGKey(2), (B, C), jnp.float32)
flat_scalar_idx = (
    idx[:, None].astype(jnp.int32) * C + jnp.arange(C, dtype=jnp.int32)
).reshape(-1)
flat_sorted = jnp.sort(flat_scalar_idx)
flat_unique = (jnp.arange(min(T * C, B), dtype=jnp.int32)
               * max(1, (T * C) // min(T * C, B)))
vals_flat = vals.reshape(-1)


def chain_time(fn, x0, n=N_REP, label=""):
    """Time n chained dependent applications of fn; d2h sync at the end."""
    r = fn(x0)
    float(jnp.sum(r))  # warm + sync
    t0 = time.time()
    r = fn(x0)
    float(jnp.sum(r))
    t1 = time.time() - t0  # single dispatch (incl. round-trip)
    t0 = time.time()
    r = x0
    for _ in range(n):
        r = fn(r)
    float(jnp.sum(r))
    tn = time.time() - t0
    per = (tn - t1) / (n - 1)
    print(f"{label:44s} {per * 1e3:9.3f} ms/call "
          f"({per / B * 1e9:7.2f} ns/query)  [1call {t1 * 1e3:.1f} ms]",
          flush=True)
    return per


print(f"device={jax.devices()[0].device_kind}  T={T} C={C} B={B}", flush=True)

# --- A: plain gather ------------------------------------------------------
@jax.jit
def gather_plain(x):
    j = idx + x[:1].astype(jnp.int32)[0]  # defeat constant folding
    g = jnp.take(table, j, axis=0)
    return x + jnp.sum(g, axis=0)  # reduce to keep the chain small

chain_time(gather_plain, jnp.zeros((C,)), label="A plain row gather [B,C]")


# --- B: sorted gather with flag ------------------------------------------
@jax.jit
def gather_sorted_flag(x):
    j = idx_sorted + x[:1].astype(jnp.int32)[0]
    g = table.at[j].get(indices_are_sorted=True)
    return x + jnp.sum(g, axis=0)

chain_time(gather_sorted_flag, jnp.zeros((C,)),
           label="B sorted gather (indices_are_sorted)")


# --- B2: sorted data, no flag (locality only) ----------------------------
@jax.jit
def gather_sorted_noflag(x):
    j = idx_sorted + x[:1].astype(jnp.int32)[0]
    g = jnp.take(table, j, axis=0)
    return x + jnp.sum(g, axis=0)

chain_time(gather_sorted_noflag, jnp.zeros((C,)),
           label="B2 sorted gather (no flag; locality)")


# --- C: argsort cost ------------------------------------------------------
@jax.jit
def sort_cost(x):
    order = jnp.argsort(idx + x.astype(jnp.int32))
    return order[:1]

chain_time(sort_cost, jnp.zeros((1,), jnp.int32), label="C argsort [B]")


# --- D: flat scalar scatter-add (round-1 backward) -----------------------
@jax.jit
def scatter_flat(x):
    z = jnp.zeros((T * C,), jnp.float32).at[flat_scalar_idx].add(vals_flat + x[0])
    return z[:1]

chain_time(scatter_flat, jnp.zeros((1,)), label="D flat scalar scatter-add")


# --- E: scatter with sorted+unique flags ---------------------------------
@jax.jit
def scatter_sorted_unique(x):
    nu = flat_unique.shape[0]
    z = jnp.zeros((T * C,), jnp.float32).at[flat_unique].add(
        vals_flat[:nu] + x[0], indices_are_sorted=True, unique_indices=True)
    return z[:1]

chain_time(scatter_sorted_unique, jnp.zeros((1,)),
           label="E scatter sorted+unique flags")


# --- F: sorted (duplicate) scatter ---------------------------------------
@jax.jit
def scatter_sorted_dup(x):
    z = jnp.zeros((T * C,), jnp.float32).at[flat_sorted].add(
        vals_flat + x[0], indices_are_sorted=True)
    return z[:1]

chain_time(scatter_sorted_dup, jnp.zeros((1,)),
           label="F scatter sorted dup flags")


# --- G: Pallas sublane take_along_axis probe -----------------------------
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = T // 128  # 4096 sublanes
    tbl128 = jax.random.normal(key, (R, 128), jnp.float32)
    Q = B // 128
    rows = jax.random.randint(jax.random.PRNGKey(3), (Q, 128), 0, R,
                              jnp.int32)

    def _kernel(tbl_ref, rows_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], rows_ref[:], axis=0)

    @jax.jit
    def pallas_gather(x):
        r2 = rows + x[:1].astype(jnp.int32)[0]
        out = pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((Q, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl128, r2)
        return x + jnp.sum(out, axis=0)[:C]

    chain_time(pallas_gather, jnp.zeros((C,)),
               label=f"G pallas take_along_axis [{Q}x128 of {R}x128]")
except Exception as e:  # noqa: BLE001
    print(f"G pallas take_along_axis: FAILED ({type(e).__name__}: {e})",
          flush=True)


# --- G2: Pallas gather, blocked over queries (table resident) -------------
try:
    QB = 2048

    def _kernel2(tbl_ref, rows_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], rows_ref[:], axis=0)

    @jax.jit
    def pallas_gather_blocked(x):
        r2 = rows + x[:1].astype(jnp.int32)[0]
        out = pl.pallas_call(
            _kernel2,
            grid=(Q // QB,),
            out_shape=jax.ShapeDtypeStruct((Q, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec((R, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((QB, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((QB, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(tbl128, r2)
        return x + jnp.sum(out, axis=0)[:C]

    chain_time(pallas_gather_blocked, jnp.zeros((C,)),
               label="G2 pallas take_along_axis blocked")
except Exception as e:  # noqa: BLE001
    print(f"G2 pallas blocked: FAILED ({type(e).__name__}: {e})", flush=True)


# --- H: one-hot matmul gather from a small table -------------------------
Ts = 4096
small_table = jax.random.normal(key, (Ts, C), jnp.float32)
idx_small = jnp.asarray(np.random.RandomState(0).randint(0, Ts, B), jnp.int32)


@jax.jit
def gather_small_baseline(x):
    j = idx_small + x[:1].astype(jnp.int32)[0]
    g = jnp.take(small_table, j, axis=0)
    return x + jnp.sum(g, axis=0)

chain_time(gather_small_baseline, jnp.zeros((C,)),
           label="H0 small-table (4k) plain gather")


@jax.jit
def gather_onehot(x):
    # blocked one-hot: [B, Ts] bf16 @ [Ts, C] — XLA materializes the one-hot,
    # so restrict B per block
    BB = 1 << 15

    def blk(i):
        sl = jax.lax.dynamic_slice(idx_small, (i * BB,), (BB,)) + x[:1].astype(jnp.int32)[0]
        oh = jax.nn.one_hot(sl, Ts, dtype=jnp.bfloat16)
        return oh @ small_table.astype(jnp.bfloat16)

    outs = jax.lax.map(blk, jnp.arange(B // BB))
    return x + jnp.sum(outs, axis=(0, 1)).astype(jnp.float32)

chain_time(gather_onehot, jnp.zeros((C,)),
           label="H one-hot matmul gather (4k table)")

print("done", flush=True)
