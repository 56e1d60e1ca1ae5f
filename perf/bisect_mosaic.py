"""Bisect which Pallas construct crashes the tunnel's Mosaic compiler."""

import sys
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE, MAXU, C = 1024, 1024, 8
N_TILES = 8
T_PAD = N_TILES * TILE
Q = 4096


def run(name, fn):
    try:
        r = fn()
        jax.block_until_ready(r)
        print(f"{name:44s} OK", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAIL {type(e).__name__}: {str(e)[:100]}",
              flush=True)


# k1: PrefetchScalarGridSpec + scalar read + write
def k1():
    def kern(lo_ref, out_ref):
        out_ref[:] = jnp.full((TILE, C), lo_ref[pl.program_id(0)],
                              jnp.float32)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N_TILES,), in_specs=[],
        out_specs=pl.BlockSpec((TILE, C), lambda k, lo: (k, 0),
                               memory_space=pltpu.VMEM))
    lo = jnp.arange(N_TILES + 1, dtype=jnp.int32)
    return pl.pallas_call(kern, grid_spec=gs,
                          out_shape=jax.ShapeDtypeStruct((T_PAD, C),
                                                         jnp.float32))(lo)

run("k1 prefetch+write", k1)


# k2: + static DMA from ANY 2D
def k2():
    def kern(lo_ref, gs_hbm, out_ref, scr, sem):
        cp = pltpu.make_async_copy(gs_hbm.at[pl.ds(0, MAXU), :], scr, sem)
        cp.start()
        cp.wait()
        out_ref[:] = scr[:TILE] * 1.0

    gs_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N_TILES,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE, C), lambda k, lo: (k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((MAXU, C), jnp.float32),
                        pltpu.SemaphoreType.DMA])
    lo = jnp.arange(N_TILES + 1, dtype=jnp.int32)
    g = jnp.ones((Q + MAXU, C), jnp.float32)
    return pl.pallas_call(kern, grid_spec=gs_spec,
                          out_shape=jax.ShapeDtypeStruct((T_PAD, C),
                                                         jnp.float32))(lo, g)

run("k2 +static DMA 2d", k2)


# k3: + dynamic-offset DMA
def k3():
    def kern(lo_ref, gs_hbm, out_ref, scr, sem):
        k = pl.program_id(0)
        start = lo_ref[k]
        cp = pltpu.make_async_copy(gs_hbm.at[pl.ds(start, MAXU), :], scr,
                                   sem)
        cp.start()
        cp.wait()
        out_ref[:] = scr[:TILE] * 1.0

    gs_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N_TILES,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE, C), lambda k, lo: (k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((MAXU, C), jnp.float32),
                        pltpu.SemaphoreType.DMA])
    lo = jnp.zeros((N_TILES + 1,), jnp.int32)
    g = jnp.ones((Q + MAXU, C), jnp.float32)
    return pl.pallas_call(kern, grid_spec=gs_spec,
                          out_shape=jax.ShapeDtypeStruct((T_PAD, C),
                                                         jnp.float32))(lo, g)

run("k3 +dynamic DMA offset", k3)


# k4: + 1D int32 scratch DMA
def k4():
    def kern(lo_ref, qs_hbm, out_ref, scr_q, sem):
        k = pl.program_id(0)
        start = lo_ref[k]
        cp = pltpu.make_async_copy(qs_hbm.at[pl.ds(start, MAXU)], scr_q, sem)
        cp.start()
        cp.wait()
        out_ref[:] = jnp.broadcast_to(
            scr_q[:TILE].astype(jnp.float32)[:, None], (TILE, C))

    gs_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N_TILES,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE, C), lambda k, lo: (k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((MAXU,), jnp.int32),
                        pltpu.SemaphoreType.DMA])
    lo = jnp.zeros((N_TILES + 1,), jnp.int32)
    q = jnp.ones((Q + MAXU,), jnp.int32)
    return pl.pallas_call(kern, grid_spec=gs_spec,
                          out_shape=jax.ShapeDtypeStruct((T_PAD, C),
                                                         jnp.float32))(lo, q)

run("k4 +1D int scratch DMA", k4)


# k5: dynamic-trip fori_loop
def k5():
    def kern(lo_ref, out_ref):
        k = pl.program_id(0)
        n = lo_ref[k]

        def body(j, acc):
            return acc + 1.0

        acc = jax.lax.fori_loop(0, n, body,
                                jnp.zeros((TILE, C), jnp.float32))
        out_ref[:] = acc

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N_TILES,), in_specs=[],
        out_specs=pl.BlockSpec((TILE, C), lambda k, lo: (k, 0),
                               memory_space=pltpu.VMEM))
    lo = jnp.full((N_TILES + 1,), 3, jnp.int32)
    return pl.pallas_call(kern, grid_spec=gs,
                          out_shape=jax.ShapeDtypeStruct((T_PAD, C),
                                                         jnp.float32))(lo)

run("k5 dynamic fori_loop", k5)


# k6: one-hot iota compare + dot [TILE,MAXU]@[MAXU,C]
def k6():
    def kern(lo_ref, out_ref):
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, MAXU), 0)
        local = jax.lax.broadcasted_iota(jnp.int32, (MAXU,), 0)
        oh = (row_iota == local[None, :]).astype(jnp.float32)
        g = jnp.full((MAXU, C), 2.0, jnp.float32)
        out_ref[:] = jnp.dot(oh, g, preferred_element_type=jnp.float32)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N_TILES,), in_specs=[],
        out_specs=pl.BlockSpec((TILE, C), lambda k, lo: (k, 0),
                               memory_space=pltpu.VMEM))
    lo = jnp.zeros((N_TILES + 1,), jnp.int32)
    return pl.pallas_call(kern, grid_spec=gs,
                          out_shape=jax.ShapeDtypeStruct((T_PAD, C),
                                                         jnp.float32))(lo)

run("k6 onehot+dot C=8", k6)


# k6b: dot with 128-lane output
def k6b():
    def kern(lo_ref, out_ref):
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, MAXU), 0)
        local = jax.lax.broadcasted_iota(jnp.int32, (MAXU,), 0)
        oh = (row_iota == local[None, :]).astype(jnp.float32)
        g = jnp.full((MAXU, 128), 2.0, jnp.float32)
        out_ref[:] = jnp.dot(oh, g, preferred_element_type=jnp.float32)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N_TILES,), in_specs=[],
        out_specs=pl.BlockSpec((TILE, 128), lambda k, lo: (k, 0),
                               memory_space=pltpu.VMEM))
    lo = jnp.zeros((N_TILES + 1,), jnp.int32)
    return pl.pallas_call(kern, grid_spec=gs,
                          out_shape=jax.ShapeDtypeStruct((T_PAD, 128),
                                                         jnp.float32))(lo)

run("k6b onehot+dot C=128", k6b)

# k7: 1D iota (MAXU,) via broadcasted_iota
def k7():
    def kern(lo_ref, out_ref):
        v = jax.lax.broadcasted_iota(jnp.int32, (MAXU,), 0)
        out_ref[:] = jnp.broadcast_to(
            v[:TILE].astype(jnp.float32)[:, None], (TILE, C))

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N_TILES,), in_specs=[],
        out_specs=pl.BlockSpec((TILE, C), lambda k, lo: (k, 0),
                               memory_space=pltpu.VMEM))
    lo = jnp.zeros((N_TILES + 1,), jnp.int32)
    return pl.pallas_call(kern, grid_spec=gs,
                          out_shape=jax.ShapeDtypeStruct((T_PAD, C),
                                                         jnp.float32))(lo)

run("k7 1D iota", k7)

print("bisect done", flush=True)
