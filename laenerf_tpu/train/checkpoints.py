"""Checkpoint save/load.

Equivalent of the reference Trainer's checkpointing
(/root/reference/nerf/utils.py:1626-1753): saves model / optimizer / EMA /
occupancy state + scalars, rolling max_keep, best-by-metric, and load modes
scratch/latest/best/path. Deliberate deviation (docs/DESIGN.md §8): "best"
checkpoints keep the occupancy state — npz makes it cheap, whereas the
reference strips density_grid to shrink torch pickles.
Storage is a single .npz per checkpoint with
flattened pytree paths (portable, no pickle, no framework churn).
"""

import glob
import json
import os
import re

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        key = prefix + jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out


def save_pytree(path, tree, meta=None):
    """Save a pytree of arrays to an .npz (+ sidecar json for meta)."""
    arrs = _flatten(tree)
    np.savez(path, **arrs)
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f)


def load_pytree(path, like):
    """Load an .npz into the structure of `like` (same treedef).

    Leaves are device_put eagerly: returning host numpy arrays would make
    every subsequent jitted call re-upload the full tree (measured 10-20x
    slowdown of post-load rendering through the TPU tunnel).

    Keys under opt_state that are absent from the file keep `like`'s
    (freshly initialized) leaves — optimizer-state STRUCTURE may evolve
    across versions (e.g. the r5 optax.flatten change) and model weights,
    not Adam moments, are what a checkpoint must preserve. Any other
    missing key still raises.
    """
    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    stale_opt = []
    for p, leaf in flat:
        key = jax.tree_util.keystr(p)
        if key not in data:
            if "opt_state" in key:
                stale_opt.append(key)
                leaves.append(leaf)
                continue
            raise KeyError(f"checkpoint missing {key}")
        leaves.append(jax.device_put(data[key]))
    if stale_opt:
        print(f"[ckpt] {path}: optimizer-state layout changed; "
              f"{len(stale_opt)} opt_state leaves reinitialized "
              "(weights/EMA loaded normally)", flush=True)
    return jax.tree_util.tree_unflatten(treedef, leaves), _load_meta(path)


def _load_meta(path):
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            return json.load(f)
    return {}


class CheckpointManager:
    """Rolling checkpoints under <workspace>/checkpoints (utils.py:1626-1691)."""

    def __init__(self, workspace, name="ngp", max_keep=2):
        self.dir = os.path.join(workspace, "checkpoints")
        os.makedirs(self.dir, exist_ok=True)
        self.name = name
        self.max_keep = max_keep
        self.best_metric = None

    def save(self, step, tree, meta=None):
        path = os.path.join(self.dir, f"{self.name}_step{step:08d}.npz")
        save_pytree(path, tree, meta)
        ckpts = sorted(glob.glob(os.path.join(self.dir, f"{self.name}_step*.npz")))
        for old in ckpts[: -self.max_keep]:
            os.remove(old)
            if os.path.exists(old + ".json"):
                os.remove(old + ".json")
        return path

    def save_best(self, metric, tree, meta=None, higher_better=True):
        if self.best_metric is None or (
            metric > self.best_metric if higher_better else metric < self.best_metric
        ):
            self.best_metric = metric
            meta = dict(meta or {}, best_metric=metric)
            save_pytree(os.path.join(self.dir, f"{self.name}_best.npz"), tree,
                        meta)
            return True
        return False

    def latest(self):
        ckpts = sorted(glob.glob(os.path.join(self.dir, f"{self.name}_step*.npz")))
        return ckpts[-1] if ckpts else None

    def best(self):
        p = os.path.join(self.dir, f"{self.name}_best.npz")
        return p if os.path.exists(p) else None

    def resolve(self, mode="latest"):
        """scratch/latest/best/<path> -> path or None (utils.py:444-462)."""
        if mode == "scratch":
            return None
        if mode == "latest":
            return self.latest() or self.best()
        if mode == "best":
            return self.best() or self.latest()
        return mode if os.path.exists(mode) else None
