"""The pretrained-VGG drop-in path, exercised with a synthetic npz.

This environment ships no torchvision weights (editing/vgg.py docstring), so
style/NPR/LPIPS run on random filters with a warning. These tests prove the
weighted path works end-to-end the moment a real npz appears: vgg_init loads
it, LPIPSMeter activates, the Trainer's patch-LPIPS hook wires up, and the
degraded path stays warned-but-functional.
"""

import os

import numpy as np
import pytest

from laenerf_tpu.editing.vgg import (VGG16_LAYOUT, VGG19_LAYOUT,
                                     _layer_indices, vgg_init)


def _write_synthetic_npz(path, layout, seed=0):
    """Build an npz with torchvision `features.state_dict()` key layout."""
    rng = np.random.RandomState(seed)
    kinds = _layer_indices(layout)
    arrays = {}
    cin = 3
    for i, (kind, cout) in enumerate(kinds):
        if kind != "conv":
            continue
        arrays[f"{i}.weight"] = rng.randn(cout, cin, 3, 3).astype(
            np.float32) * 0.05
        arrays[f"{i}.bias"] = rng.randn(cout).astype(np.float32) * 0.01
        cin = cout
    np.savez(path, **arrays)
    return arrays


@pytest.fixture
def synthetic_vgg16(tmp_path, monkeypatch):
    p = str(tmp_path / "vgg16_features.npz")
    arrays = _write_synthetic_npz(p, VGG16_LAYOUT)
    monkeypatch.setenv("LAENERF_VGG16_NPZ", p)
    return p, arrays


@pytest.fixture
def synthetic_vgg19(tmp_path, monkeypatch):
    p = str(tmp_path / "vgg19_features.npz")
    arrays = _write_synthetic_npz(p, VGG19_LAYOUT)
    monkeypatch.setenv("LAENERF_VGG19_NPZ", p)
    return p, arrays


def test_vgg_init_loads_npz(synthetic_vgg19):
    path, arrays = synthetic_vgg19
    params, kinds, pretrained = vgg_init("vgg19")
    assert pretrained
    # first conv matches the npz content (transposed to HWIO)
    w0 = np.asarray(params[0][0])
    np.testing.assert_allclose(
        w0, np.transpose(arrays["0.weight"], (2, 3, 1, 0)), rtol=1e-6)
    # without the env var the loader degrades with a warning
    del os.environ["LAENERF_VGG19_NPZ"]
    with pytest.warns(UserWarning, match="random filters"):
        _, _, pre2 = vgg_init("vgg19")
    assert not pre2


def test_weighted_vs_random_features_differ(synthetic_vgg19):
    import jax.numpy as jnp

    from laenerf_tpu.editing.vgg import vgg_features

    params_w, kinds, _ = vgg_init("vgg19")
    del os.environ["LAENERF_VGG19_NPZ"]
    with pytest.warns(UserWarning):
        params_r, _, _ = vgg_init("vgg19")
    x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 32, 32),
                    jnp.float32)
    fw = vgg_features(params_w, kinds, x, (3,))[0]
    fr = vgg_features(params_r, kinds, x, (3,))[0]
    assert float(jnp.max(jnp.abs(fw - fr))) > 1e-3


def test_lpips_meter_activates(synthetic_vgg16):
    from laenerf_tpu.train.metrics import LPIPSMeter

    m = LPIPSMeter()
    assert m.available
    a = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
    b = np.clip(a + 0.2 * np.random.RandomState(1).rand(32, 32, 3), 0,
                1).astype(np.float32)
    m.update(a, a)
    same = m.measure()
    m.clear()
    m.update(a, b)
    diff = m.measure()
    assert same < 1e-6
    assert diff > same
    assert "LPIPS" in m.report() and "n/a" not in m.report()


def test_lpips_meter_degrades_without_weights():
    from laenerf_tpu.train.metrics import LPIPSMeter

    assert "LAENERF_VGG16_NPZ" not in os.environ
    m = LPIPSMeter()
    if m.available:  # a real cache exists on this machine
        pytest.skip("local VGG weights present")
    m.update(np.zeros((8, 8, 3)), np.ones((8, 8, 3)))
    assert m.measure() == 0.0
    assert "n/a" in m.report()


def test_trainer_patch_lpips_hook(synthetic_vgg16, tmp_path):
    """With weights present and patch_size > 1, the Trainer builds the
    patch-LPIPS hook and a patch-mode train step runs through it."""
    from laenerf_tpu.data import NeRFDataset, generate_synthetic_scene
    from laenerf_tpu.models import NeRFConfig, RenderConfig
    from laenerf_tpu.train import Trainer

    root = str(tmp_path / "scene")
    generate_synthetic_scene(root, n_train=2, n_val=1, n_test=1, H=32, W=32)
    ds = NeRFDataset(root, "train", num_rays=64, patch_size=8)
    mc = NeRFConfig(bound=1.0, num_levels=2, level_dim=2,
                    log2_hashmap_size=8)
    rc = RenderConfig(bound=1.0, cascades=1, grid_size=32, max_steps=64,
                      march_iters=64, m_cap_per_ray=8)
    tr = Trainer(str(tmp_path / "ws"), mc, rc, lr=1e-2, iters=10,
                 patch_size=8)
    assert tr.patch_lpips_fn is not None
    tr.mark_untrained(ds)
    aux = tr.train_one_batch(ds.get_batch(0), has_alpha=True)
    assert np.isfinite(float(aux["loss"]))
