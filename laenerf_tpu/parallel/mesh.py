"""Data-parallel device mesh.

TPU-native equivalent of the reference's (vestigial) DDP/NCCL wiring
(/root/reference/nerf/utils.py:379-383,1555-1570 — all_reduce of grads via
DDP, all_gather at eval). See SURVEY.md §2.3: the reference has *only* data
parallelism and no attention/TP/PP; one mesh axis "data" covers every
capability it exercises.

Design: rays (the batch dimension) are sharded over the "data" axis; model
parameters and the occupancy grid are replicated. Gradients are averaged by
GSPMD-inserted psums over ICI when jit sees the sharded inputs — no explicit
collectives needed (the XLA analogue of DDP's NCCL all_reduce). Eval images
are gathered simply by device_get of the sharded output.
"""

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, devices=None):
    """A 1-D mesh over the 'data' axis (generalizes to 1 device)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


def shard_batch(mesh, x):
    """Place an array sharded along its leading (ray) axis."""
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def replicate(mesh, tree):
    """Replicate a pytree (params, occupancy) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def dp_train_step(mesh, train_step_fn, state, occupancy, pose, intrinsics,
                  inds, pixels, key, **kw):
    """Run a train step with rays sharded over the mesh.

    Equivalent of DDP's forward/backward + gradient all-reduce: `inds` and
    `pixels` are sharded on the 'data' axis, everything else replicated.
    The loss/gradient computation inside train_step is shard_mapped over the
    mesh (`mesh=` static arg): each device renders and backprops its ray
    shard — including the Pallas scatter-add kernel, which GSPMD has no
    partitioning rule for — and gradients are pmean'd over ICI (the explicit
    analogue of DDP's NCCL all_reduce, nerf/utils.py:379-383). The optimizer
    and EMA updates then run on replicated gradients under plain GSPMD.
    """
    rep = NamedSharding(mesh, P())
    state = jax.tree.map(lambda x: jax.device_put(x, rep), state)
    occupancy = jax.device_put(occupancy, rep)
    inds = shard_batch(mesh, inds)
    pixels = shard_batch(mesh, pixels)
    return train_step_fn(state, occupancy, pose, intrinsics, inds, pixels,
                         key, mesh=mesh, **kw)
