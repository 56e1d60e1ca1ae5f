"""Round-2 Pallas probes: tpu.dynamic_gather via jnp.take_along_axis.

Mosaic lowers jnp.take_along_axis(x, idx, axis=0|1) on 2D VMEM arrays to
tpu.dynamic_gather, REQUIRING idx.shape == x.shape (lowering.py:2493 in the
installed jax). These probes measure its throughput for the two access
patterns we need:

  P1  axis=0 same-shape sublane gather (hash-table style), f32
  P2  same, int8 table (occupancy-grid style)
  P3  axis=1 same-shape lane gather (per-row lane select)
  P4  march-style occupancy lookup: broadcast-row gather [16384,128] i8
      then lane-select == one occupancy probe per ray for 16384 rays
  P5  XLA baseline for P4 (flat 1-byte gather per ray)

Usage: python -u perf/microbench_pallas.py [--platform cpu]
"""

import argparse
import sys
import time

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None)
parser.add_argument("--n", type=int, default=16)
args = parser.parse_args()

import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from laenerf_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

N_REP = args.n
key = jax.random.PRNGKey(0)


def chain_time(fn, x0, n_queries, n=N_REP, label=""):
    try:
        r = fn(x0)
        float(jnp.sum(r))
        t0 = time.time()
        r = fn(x0)
        float(jnp.sum(r))
        t1 = time.time() - t0
        t0 = time.time()
        r = x0
        for _ in range(n):
            r = fn(r)
        float(jnp.sum(r))
        tn = time.time() - t0
        per = (tn - t1) / (n - 1)
        print(f"{label:52s} {per * 1e3:9.3f} ms/call "
              f"({per / n_queries * 1e9:7.3f} ns/query)", flush=True)
        return per
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:120]
        print(f"{label:52s} FAILED ({type(e).__name__}: {msg})", flush=True)
        return None


print(f"device={jax.devices()[0].device_kind}", flush=True)

# --- P1: axis=0 same-shape sublane gather, f32 -----------------------------
R = 4096  # table sublanes (a 2^19-entry hash level as [4096, 128])
tbl = jax.random.normal(key, (R, 128), jnp.float32)
rows0 = jax.random.randint(jax.random.PRNGKey(1), (R, 128), 0, R, jnp.int32)


def _k_ax0(tbl_ref, rows_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tbl_ref[:], rows_ref[:], axis=0,
                                     mode="promise_in_bounds")


@jax.jit
def p1(x):
    r2 = (rows0 + x[0].astype(jnp.int32)) % R
    out = pl.pallas_call(
        _k_ax0,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, r2)
    return x + jnp.sum(out, axis=0)[:1]

chain_time(p1, jnp.zeros((1,)), R * 128, label=f"P1 dyn_gather ax0 f32 [{R}x128]")

# --- P2: int8 table --------------------------------------------------------
tbl_i8 = jax.random.randint(key, (R, 128), 0, 2, jnp.int8)


def _k_ax0_i8(tbl_ref, rows_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tbl_ref[:], rows_ref[:], axis=0,
                                     mode="promise_in_bounds")


@jax.jit
def p2(x):
    r2 = (rows0 + x[0].astype(jnp.int32)) % R
    out = pl.pallas_call(
        _k_ax0_i8,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl_i8, r2)
    return x + jnp.sum(out.astype(jnp.int32), axis=0)[:1].astype(jnp.float32)

chain_time(p2, jnp.zeros((1,)), R * 128, label="P2 dyn_gather ax0 int8")

# --- P2b: int32 table ------------------------------------------------------
tbl_i32 = jax.random.randint(key, (R, 128), 0, 2, jnp.int32)


@jax.jit
def p2b(x):
    r2 = (rows0 + x[0].astype(jnp.int32)) % R
    out = pl.pallas_call(
        _k_ax0,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl_i32, r2)
    return x + jnp.sum(out, axis=0)[:1].astype(jnp.float32)

chain_time(p2b, jnp.zeros((1,)), R * 128, label="P2b dyn_gather ax0 int32")

# --- P3: axis=1 lane gather -------------------------------------------------
lanes = jax.random.randint(jax.random.PRNGKey(2), (R, 128), 0, 128, jnp.int32)


def _k_ax1(tbl_ref, lanes_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tbl_ref[:], lanes_ref[:], axis=1,
                                     mode="promise_in_bounds")


@jax.jit
def p3(x):
    l2 = (lanes + x[0].astype(jnp.int32)) % 128
    out = pl.pallas_call(
        _k_ax1,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, l2)
    return x + jnp.sum(out, axis=0)[:1]

chain_time(p3, jnp.zeros((1,)), R * 128, label="P3 dyn_gather ax1 f32")

# --- P4: march-style occupancy probe ---------------------------------------
# grid [H*H, H] = [16384, 128] (x*H+y rows, z lanes); 16384 rays each probe
# one cell: broadcast-row gather then lane select.
H = 128
NR = H * H  # rays per op == table sublanes (same-shape constraint)
grid_i8 = jax.random.randint(key, (NR, H), 0, 2, jnp.int8)
grid_i32 = grid_i8.astype(jnp.int32)
ray_rows = jax.random.randint(jax.random.PRNGKey(3), (NR, 1), 0, NR, jnp.int32)
ray_z = jax.random.randint(jax.random.PRNGKey(4), (NR, 1), 0, H, jnp.int32)


def _k_march_probe(grid_ref, rows_ref, z_ref, out_ref):
    rows_b = jnp.broadcast_to(rows_ref[:], (NR, H))
    cols = jnp.take_along_axis(grid_ref[:], rows_b, axis=0,
                               mode="promise_in_bounds")
    z_b = jnp.broadcast_to(z_ref[:], (NR, H))
    out_ref[:] = jnp.take_along_axis(cols, z_b, axis=1,
                                     mode="promise_in_bounds")


@jax.jit
def p4(x):
    r2 = (ray_rows + x[0].astype(jnp.int32)) % NR
    out = pl.pallas_call(
        _k_march_probe,
        out_shape=jax.ShapeDtypeStruct((NR, H), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(grid_i32, r2, ray_z)
    return x + jnp.sum(out[:, :1], axis=0).astype(jnp.float32)

chain_time(p4, jnp.zeros((1,)), NR, label="P4 pallas occupancy probe i32 (16k rays)")

# --- P4b: same with int8 grid ----------------------------------------------
@jax.jit
def p4b(x):
    r2 = (ray_rows + x[0].astype(jnp.int32)) % NR
    out = pl.pallas_call(
        _k_march_probe,
        out_shape=jax.ShapeDtypeStruct((NR, H), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(grid_i8, r2, ray_z)
    return x + jnp.sum(out[:, :1].astype(jnp.int32), axis=0).astype(jnp.float32)

chain_time(p4b, jnp.zeros((1,)), NR, label="P4b pallas occupancy probe i8")

# --- P5: XLA baseline: flat byte gather per ray ----------------------------
grid_flat = grid_i8.reshape(-1).astype(jnp.uint8)
flat_idx = (ray_rows[:, 0] * H + ray_z[:, 0]).astype(jnp.int32)


@jax.jit
def p5(x):
    j = (flat_idx + x[0].astype(jnp.int32)) % (NR * H)
    out = jnp.take(grid_flat, j, axis=0)
    return x + jnp.sum(out.astype(jnp.int32)).astype(jnp.float32)[None]

chain_time(p5, jnp.zeros((1,)), NR, label="P5 XLA flat byte gather (16k rays)")

print("done", flush=True)

# --- P3b/c/d: WIDE-LANE gather (rows few, lanes many) -----------------------
# The march kernel's only Mosaic-viable formulation on this toolchain:
# field as [8, 262144] (x-octant rows, x1*yz lanes), per-event lane gather
# of 16384 ray columns per row + a one-hot sublane reduce. These probes
# measure whether take_along_axis(axis=1) survives (and at what cost) when
# rows span many lane-tiles.
for rows, lanes in ((8, 262144), (16, 131072), (64, 32768), (128, 16384)):
    tbl_w = jax.random.randint(key, (rows, lanes), 0, 8, jnp.int8)
    NRAY = 16384
    li = jax.random.randint(jax.random.PRNGKey(7), (1, NRAY), 0, lanes,
                            jnp.int32)

    def _k_wide(tbl_ref, idx_ref, out_ref, rows=rows, lanes=lanes):
        idx_b = jnp.broadcast_to(idx_ref[:], (rows, NRAY))
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_b, axis=1,
                                         mode="promise_in_bounds")

    def mk(rows=rows, lanes=lanes, tbl_w=tbl_w, li=li, k=_k_wide):
        @jax.jit
        def f(x):
            i2 = (li + x[0].astype(jnp.int32)) % lanes
            out = pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((rows, NRAY), jnp.int8),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tbl_w, i2)
            return x + jnp.sum(out[:, :1].astype(jnp.int32), axis=0).astype(
                jnp.float32)
        return f

    chain_time(mk(), jnp.zeros((1,)), NRAY,
               label=f"P3x wide-lane gather [{rows}x{lanes}] i8 (16k rays)")

# --- P6: full two-step march probe: wide gather + one-hot x-select ----------
R8, L8 = 8, 262144
tbl8 = jax.random.randint(key, (R8, L8), 0, 8, jnp.int8)
lane_i = jax.random.randint(jax.random.PRNGKey(8), (1, 16384), 0, L8,
                            jnp.int32)
row_i = jax.random.randint(jax.random.PRNGKey(9), (1, 16384), 0, R8,
                           jnp.int32)


def _k_two_step(tbl_ref, lane_ref, row_ref, out_ref):
    idx_b = jnp.broadcast_to(lane_ref[:], (R8, 16384))
    got = jnp.take_along_axis(tbl_ref[:], idx_b, axis=1,
                              mode="promise_in_bounds")  # [8, 16384]
    sub = jax.lax.broadcasted_iota(jnp.int32, (R8, 16384), 0)
    sel = jnp.where(sub == jnp.broadcast_to(row_ref[:], (R8, 16384)),
                    got.astype(jnp.int32), 0)
    out_ref[:] = jnp.sum(sel, axis=0, keepdims=True)  # [1, 16384]


@jax.jit
def p6(x):
    l2 = (lane_i + x[0].astype(jnp.int32)) % L8
    out = pl.pallas_call(
        _k_two_step,
        out_shape=jax.ShapeDtypeStruct((1, 16384), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl8, l2, row_i)
    return x + jnp.sum(out[:, :1], axis=0).astype(jnp.float32)

chain_time(p6, jnp.zeros((1,)), 16384,
           label="P6 two-step march probe [8x262144] (16k rays)")
print("wide-lane probes done", flush=True)
