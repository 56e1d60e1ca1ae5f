"""A/B: RenderConfig.sorted_eval on the train step (warm bench state).

The train forward's encoder gather (~12 ms of the 71 ms step, r5 trace)
and the work-list scatter backward both consume the compacted sample
stream; Morton-sorting it costs one argsort + unsort gather and makes the
table gathers cell-contiguous. Measures train_one_batch both ways.

Usage: python -u perf/r5_train_sorted_ab.py
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/perf")
from warmstate import get_warm_trainer  # noqa: E402

tr, ds = get_warm_trainer()
batch = ds.get_batch(0)
base = tr.render_cfg


def timeit(label, n=48):
    r = tr.train_one_batch(batch, has_alpha=True)
    jax.block_until_ready(tr.state.params)
    t0 = time.time()
    for _ in range(n):
        r = tr.train_one_batch(batch, has_alpha=True)
    jax.block_until_ready(tr.state.params)
    per = (time.time() - t0) / n
    print(f"{label:28s} {per * 1e3:8.2f} ms/step "
          f"({1 / per:6.2f} it/s)  loss={float(r['loss']):.5f}", flush=True)
    return per


a = timeit("train unsorted")
tr.render_cfg = dataclasses.replace(base, sorted_eval=True)
b = timeit("train sorted_eval")
print(f"delta: {1000 * (a - b):+.2f} ms ({100 * (a - b) / a:+.1f}%)",
      flush=True)
