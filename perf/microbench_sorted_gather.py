"""Does index ORDER change XLA TPU row-gather cost at render-eval shapes?

Round-3 measured encoder eval gathers at 12-19 ns/row with ray-major
(natural march) index order and concluded "gather-latency floor". But the
r2 microbenches also measured a 2x speedup from smaller operands — i.e.
the gather engine is locality-sensitive. If SORTED indices gather
materially faster, the render eval can feed the encoder in cell-sorted
order for free: compaction already permutes samples arbitrarily and
scatter_back (injective) puts results straight back to (ray, slot), so
the only added cost is one [M] argsort.

Measures, per level layout (hashed octo [524288, 16|32] bf16 and a dense
level), a REALISTIC index stream (coherent ray samples through a box,
like a march emits) in three orders:
  natural   ray-major (what the renderer does today)
  sorted    ascending table row (per-level ideal)
  morton    one shared spatial order for all levels (sort once, not L times)
plus the argsort / injective-scatter side costs that a sorted eval adds.

Usage: python -u perf/microbench_sorted_gather.py [--platform cpu] [--m 8]
"""

import argparse
import sys
import time

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None)
parser.add_argument("--m", type=int, default=8, help="samples, millions")
parser.add_argument("--n", type=int, default=12)
args = parser.parse_args()

import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from laenerf_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

N_REP = args.n
M = args.m * (1 << 20)


def timeit(fn, label, queries):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(N_REP):
        r = fn()
    jax.block_until_ready(r)
    per = (time.time() - t0) / N_REP
    print(f"{label:56s} {per * 1e3:9.3f} ms ({per / queries * 1e9:7.2f} ns/row)",
          flush=True)
    return per


print(f"device={jax.devices()[0].device_kind} M={M}", flush=True)

# --- coherent ray-sample positions (march-like stream) ----------------------
rng = np.random.default_rng(0)
n_rays = M // 16  # 16 samples/ray
o = rng.uniform(-1, 1, (n_rays, 3)).astype(np.float32)
d = rng.normal(size=(n_rays, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
t = np.linspace(0.05, 0.8, 16, dtype=np.float32)
pos = (o[:, None, :] + t[None, :, None] * d[:, None, :]).reshape(-1, 3)
u = np.clip((pos + 1.0) * 0.5, 0.0, 1.0 - 1e-6)  # [M, 3] in [0,1)

SIZE = 1 << 19  # hashed octo level
SY, SZ = (2654435761 % SIZE) | 1, (805459861 % SIZE) | 1


def octo_idx(res):
    c = np.minimum((u * res).astype(np.uint32), res - 1)
    return ((c[:, 0] + c[:, 1] * SY + c[:, 2] * SZ) % SIZE).astype(np.int32)


def dense_idx(res):
    c = np.minimum((u * res).astype(np.uint32), res - 1)
    sb = res + 1
    return ((c[:, 0] + c[:, 1] * sb + c[:, 2] * sb * sb)
            % SIZE).astype(np.int32)


def morton_key(res=256):
    c = np.minimum((u * res).astype(np.uint64), res - 1)
    k = np.zeros(len(c), np.uint64)
    for b in range(8):
        for a in range(3):
            k |= ((c[:, a] >> b) & 1) << (3 * b + a)
    return k


morton_order = np.argsort(morton_key(), kind="stable").astype(np.int32)

key = jax.random.PRNGKey(0)
for ch in (16, 32):
    view = jax.random.normal(key, (SIZE, ch), jnp.bfloat16)
    for name, res in (("hashed r=362", 362), ("hashed r=128", 128),
                      ("dense-mod r=64", 64)):
        idx_np = octo_idx(res) if "hashed" in name else dense_idx(res)
        orders = {
            "natural": idx_np,
            "sorted": np.sort(idx_np, kind="stable"),
            "morton": idx_np[morton_order],
        }
        for oname, arr in orders.items():
            idx = jnp.asarray(arr)
            jax.block_until_ready(idx)
            f = jax.jit(lambda i, v=view: jnp.take(v, i, axis=0))
            timeit(lambda f=f, i=idx: f(i),
                   f"gather [{SIZE}x{ch}]bf16 {name:14s} {oname}", M)

# --- side costs a sorted eval adds ------------------------------------------
idx = jnp.asarray(octo_idx(362))
asort = jax.jit(lambda i: jnp.argsort(i))
timeit(lambda: asort(idx), "argsort [M] int32", M)
perm = jnp.asarray(morton_order)
vals = jax.random.normal(key, (M, 16), jnp.bfloat16)
tgt = jax.jit(lambda v, p: jnp.zeros((M, 16), jnp.bfloat16).at[p].set(v))
timeit(lambda: tgt(vals, perm), "injective scatter [M,16] permuted", M)
ident = jnp.arange(M, dtype=jnp.int32)
timeit(lambda: tgt(vals, ident), "injective scatter [M,16] identity", M)
# per-level two-stage variant: sorted big-table gather + permuted unsort
# gather from the SMALL [M,16] intermediate (operand fits cache-friendly)
unsort = jax.jit(lambda v, p: jnp.take(v, p, axis=0))
timeit(lambda: unsort(vals, perm), "unsort gather [M,16] from [M,16]", M)
print("done", flush=True)
