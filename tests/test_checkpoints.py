"""Checkpoint layout-evolution tests.

The reference tolerates optimizer-state drift on load by simply not
restoring what torch can't match (nerf/utils.py:1694-1753 try/except per
section); our equivalent is load_pytree's opt_state-only key tolerance:
model/EMA weights must always round-trip, Adam moments may reinitialize
when the optimizer pytree layout changes (e.g. the optax.flatten switch).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laenerf_tpu.train.checkpoints import load_pytree, save_pytree


def _tree(with_nested_opt):
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    if with_nested_opt:
        opt = {"mu": {"w": jnp.full((2, 3), 0.5), "b": jnp.zeros((3,))},
               "count": jnp.int32(7)}
    else:
        opt = {"mu_flat": jnp.full((9,), 0.5), "count": jnp.int32(7)}
    return {"state": {"params": params, "opt_state": opt}}


def test_opt_state_layout_change_reinits_moments(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, _tree(with_nested_opt=True), {"global_step": 7})

    like = _tree(with_nested_opt=False)
    like["state"]["params"]["w"] = jnp.zeros((2, 3))  # must be overwritten
    like["state"]["opt_state"]["mu_flat"] = jnp.zeros((9,))  # must be kept
    tree, meta = load_pytree(path, like)

    np.testing.assert_array_equal(tree["state"]["params"]["w"],
                                  np.arange(6.0).reshape(2, 3))
    # layout-changed moment kept `like`'s fresh value, not an error
    np.testing.assert_array_equal(tree["state"]["opt_state"]["mu_flat"],
                                  np.zeros((9,)))
    # identically-pathed opt leaves (count) still load from the file
    assert int(tree["state"]["opt_state"]["count"]) == 7
    assert meta["global_step"] == 7


def test_missing_param_key_still_raises(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, _tree(with_nested_opt=True))
    like = _tree(with_nested_opt=True)
    like["state"]["params"]["extra"] = jnp.zeros((2,))
    with pytest.raises(KeyError):
        load_pytree(path, like)


def test_trainer_cross_opt_layout_roundtrip(tmp_path, monkeypatch):
    """An r4-layout (unflattened adam) checkpoint loads into the r5
    flattened-optimizer trainer with weights/EMA intact, and vice versa."""
    from laenerf_tpu.models import NeRFConfig, RenderConfig
    from laenerf_tpu.train import Trainer

    model_cfg = NeRFConfig(bound=1.0, num_levels=4, log2_hashmap_size=12)
    render_cfg = RenderConfig(bound=1.0, cascades=1, grid_size=16,
                              max_steps=64, march_iters=32, m_cap_per_ray=8)

    def make(ws, flat):
        monkeypatch.setenv("LAENERF_FLAT_OPT", "1" if flat else "0")
        return Trainer(str(ws), model_cfg, render_cfg, lr=1e-2, iters=100)

    for src_flat in (False, True):
        ws = tmp_path / f"ws_{src_flat}"
        tr = make(ws, flat=src_flat)
        tr.save_checkpoint()
        tr2 = make(ws, flat=not src_flat)
        # perturb so a successful load is observable
        tr2.state = dataclasses_replace_params(tr2.state)
        assert tr2.load_checkpoint("latest")
        for a, b in zip(jax.tree.leaves(tr.state.params),
                        jax.tree.leaves(tr2.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(tr.state.ema_params),
                        jax.tree.leaves(tr2.state.ema_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the cross-layout opt state must be usable: one update step runs
        upd, _ = tr2.optimizer.update(
            jax.tree.map(jnp.zeros_like, tr2.state.params),
            tr2.state.opt_state, tr2.state.params)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree.leaves(upd))


def dataclasses_replace_params(state):
    import dataclasses

    return dataclasses.replace(
        state, params=jax.tree.map(lambda a: a + 1.0, state.params))
