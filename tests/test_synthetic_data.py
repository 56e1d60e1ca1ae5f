"""Synthetic GT scene generator: correctness + compile-count regression.

The generator volume-renders an analytic scene with a jitted chunk
renderer. Round 4 hoisted that jit to module level after a per-view
closure recompiled for EVERY view and aa offset (800^2 scene generation
took hours through the TPU tunnel instead of minutes)."""

import json
import os
import tempfile

import numpy as np

from laenerf_tpu.data import generate_synthetic_scene
from laenerf_tpu.data import synthetic as syn


def test_scene_generator_shapes_and_alpha():
    try:
        import imageio.v2 as imageio
    except ImportError:
        import imageio

    with tempfile.TemporaryDirectory() as d:
        generate_synthetic_scene(d, n_train=2, n_val=1, n_test=1,
                                 H=48, W=48, aa=2)
        meta = json.load(open(os.path.join(d, "transforms_train.json")))
        assert len(meta["frames"]) == 2
        img = imageio.imread(os.path.join(d, "train", "r_0.png"))
        assert img.shape == (48, 48, 4)
        alpha = img[..., 3] / 255.0
        # the default spheres cover part of the frame, not all of it
        assert 0.02 < alpha.mean() < 0.9
        # background pixels are fully transparent, object core opaque
        assert alpha.min() == 0.0 and alpha.max() > 0.95


def test_scene_generator_compiles_once_per_shape():
    """All views and aa offsets of one resolution must share ONE compiled
    chunk renderer (rays are padded to a chunk multiple)."""
    with tempfile.TemporaryDirectory() as d:
        # force a fresh jit wrapper so the count below is this scene's
        syn._RENDER_CHUNK = None
        generate_synthetic_scene(d, n_train=3, n_val=1, n_test=1,
                                 H=40, W=40, aa=2)
        assert syn._RENDER_CHUNK is not None
        assert syn._RENDER_CHUNK._cache_size() == 1


def test_scene_generator_aa_reduces_silhouette_noise():
    """aa=2 supersampling must agree with aa=1 in the interior but smooth
    the binary inside-test edges (mean abs difference small, max at
    silhouettes nonzero)."""
    from laenerf_tpu.data.synthetic import (_look_at_pose, _render_view)

    pose = _look_at_pose((2.5, 1.2, 1.8))
    img1, acc1 = _render_view(pose, 40, 40, 40.0, None, n_steps=128, aa=1)
    img2, acc2 = _render_view(pose, 40, 40, 40.0, None, n_steps=128, aa=2)
    assert np.abs(img1 - img2).mean() < 0.02
    assert np.abs(acc1 - acc2).max() > 0.0
