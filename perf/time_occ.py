"""Time occ_update (partial + full) on the warm bench state."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/perf")
from warmstate import get_warm_trainer  # noqa: E402

from laenerf_tpu.train.trainer import occ_update  # noqa: E402

tr, ds = get_warm_trainer()


def timeit(fn, n=16, label=""):
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    print(f"{label:32s} {(time.time() - t0) / n * 1e3:9.2f} ms", flush=True)


k = jax.random.PRNGKey(3)
for full in (False, True):
    timeit(lambda: occ_update(
        tr.state.params, tr.occ_state, k, model_cfg=tr.model_cfg,
        bound=tr.render_cfg.bound, full=full,
        density_scale=tr.render_cfg.density_scale,
        density_thresh=tr.render_cfg.density_thresh).iter_density,
        label=f"occ_update full={full}")
print("done", flush=True)
