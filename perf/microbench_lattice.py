"""Measure: batched lattice skip-field gather vs serialized event gathers.

The march event loop gathers the 2MB int8 skip field once per event, and
events are serialized (the next position depends on the gathered jump).
If all jump targets live on the dt lattice (dt_gamma == 0), a round can
instead gather ALL Km lattice positions in one batched lookup and walk the
jump chain with pure VPU math. This benchmark quantifies both sides.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

N = 32768
H = 128
KM = 32


def timeit(fn, *a, n=50, label=""):
    r = fn(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*a)
    jax.block_until_ready(r)
    per = (time.time() - t0) / n
    print(f"{label:52s} {per * 1e3:9.3f} ms", flush=True)
    return per


key = jax.random.PRNGKey(0)
field = jax.random.randint(key, (H * H * H,), 0, 7, jnp.int32).astype(jnp.int8)
# ray state: origin cell + per-step stride (simulates a lattice walk's
# spatial locality: consecutive lattice cells are adjacent in space)
base = jax.random.randint(key, (N,), 0, H * H * H, jnp.int32)
stride = jax.random.randint(jax.random.PRNGKey(1), (N,), 1, 130, jnp.int32)


@jax.jit
def serialized(base, stride):
    def step(idx, _):
        f = jnp.take(field, idx, axis=0).astype(jnp.int32)
        idx = (idx + stride + f) % (H * H * H)  # data-dependent chain
        return idx, f
    _, fs = jax.lax.scan(step, base, None, length=KM, unroll=2)
    return fs


@jax.jit
def batched32(base, stride):
    i = jnp.arange(KM, dtype=jnp.int32)
    idx = (base[:, None] + i[None, :] * stride[:, None]) % (H * H * H)
    return jnp.take(field, idx.reshape(-1), axis=0).reshape(N, KM)


@jax.jit
def batched64(base, stride):
    i = jnp.arange(2 * KM, dtype=jnp.int32)
    idx = (base[:, None] + i[None, :] * stride[:, None]) % (H * H * H)
    return jnp.take(field, idx.reshape(-1), axis=0).reshape(N, 2 * KM)


@jax.jit
def batched128(base, stride):
    i = jnp.arange(4 * KM, dtype=jnp.int32)
    idx = (base[:, None] + i[None, :] * stride[:, None]) % (H * H * H)
    return jnp.take(field, idx.reshape(-1), axis=0).reshape(N, 4 * KM)


@jax.jit
def batched_walk(base, stride):
    """Batched gather + the full lattice chain walk (the real round shape)."""
    i = jnp.arange(KM, dtype=jnp.int32)
    idx = (base[:, None] + i[None, :] * stride[:, None]) % (H * H * H)
    f = jnp.take(field, idx.reshape(-1), axis=0).reshape(N, KM).astype(
        jnp.int32)
    occ = f == 0
    n = jnp.where(occ, 1, jnp.left_shift(1, jnp.maximum(f - 1, 0)))
    slots = jnp.arange(16, dtype=jnp.int32)

    def step(carry, xs):
        nv, cnt, buf = carry
        occ_i, n_i, i_i = xs
        visit = nv == i_i
        samp = visit & occ_i & (cnt < 16)
        oh = (slots[None, :] == cnt[:, None]) & samp[:, None]
        buf = jnp.where(oh, i_i.astype(jnp.float32), buf)
        cnt = cnt + samp.astype(jnp.int32)
        nv = jnp.where(visit, i_i + n_i, nv)
        return (nv, cnt, buf), None

    init = (jnp.zeros((N,), jnp.int32), jnp.zeros((N,), jnp.int32),
            jnp.zeros((N, 16), jnp.float32))
    (nv, cnt, buf), _ = jax.lax.scan(
        step, init,
        (occ.T, n.T, jnp.arange(KM, dtype=jnp.int32)), unroll=2)
    return nv, cnt, buf


print(f"# backend {jax.default_backend()}, N={N}, KM={KM}, "
      f"field {H}^3 int8 = {H**3/1e6:.1f} MB", flush=True)
timeit(serialized, base, stride, label=f"serialized {KM} dependent gathers")
timeit(batched32, base, stride, label=f"one batched gather [N,{KM}]")
timeit(batched64, base, stride, label=f"one batched gather [N,{2*KM}]")
timeit(batched128, base, stride, label=f"one batched gather [N,{4*KM}]")
timeit(batched_walk, base, stride,
       label=f"batched gather [N,{KM}] + chain walk scan")
