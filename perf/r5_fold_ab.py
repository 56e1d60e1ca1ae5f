"""A/B the octo-view backward fold variants IN ONE PROCESS (tunnel
session-to-session variance measured at +-20%, so cross-process A/Bs are
unreliable): transposed-space fold (memory-safe, r5 custom VJP) vs the
autodiff-equivalent roll fold (narrow temps). Both through the full
train_step on the warm bench state.

LAENERF_OCTO_FOLD is read at trace time, so each arm jits its own step
via a distinct static seed argument.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/perf")
from warmstate import get_warm_trainer  # noqa: E402

tr, ds = get_warm_trainer()
batch = ds.get_batch(0)


def measure(label, n=48):
    r = tr.train_one_batch(batch, has_alpha=True)
    jax.block_until_ready(tr.state.params)
    t0 = time.time()
    for _ in range(n):
        r = tr.train_one_batch(batch, has_alpha=True)
    jax.block_until_ready(tr.state.params)
    per = (time.time() - t0) / n
    print(f"{label:24s} {per * 1e3:8.2f} ms/step ({1 / per:6.2f} it/s) "
          f"loss={float(r['loss']):.5f}", flush=True)
    return per


# interleave arms twice to expose drift within the session
for rep in range(2):
    for mode in ("transposed", "xla"):
        os.environ["LAENERF_OCTO_FOLD"] = mode
        # new trace per mode: clear the jit cache of the step
        from laenerf_tpu.train import trainer as _t

        _t.train_step.clear_cache()
        measure(f"fold={mode} rep{rep}")
print("done", flush=True)
