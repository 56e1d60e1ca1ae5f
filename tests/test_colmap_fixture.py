"""End-to-end colmap-layout coverage (VERDICT r4 #9).

The environment ships no real COLMAP datasets, so this fixture converts a
procedural blender-layout scene into the colmap layout the reference's
provider consumes (single transforms.json, RGB frames): val = frame 0,
train = the rest, test = a slerp trajectory between two random poses with
no GT (reference: nerf/provider.py:117-193). The test then drives
training and both eval splits through the colmap branch.
"""

import json
import os
import tempfile

import imageio.v2 as imageio
import numpy as np
import pytest

from laenerf_tpu.data import NeRFDataset, generate_synthetic_scene
from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.train import Trainer


def _make_colmap_fixture(root, n_train=6, H=64):
    """Blender-layout synthetic scene -> colmap layout (transforms.json,
    RGB images, no split files)."""
    src = os.path.join(root, "blender")
    generate_synthetic_scene(src, n_train=n_train, n_val=1, n_test=1,
                             H=H, W=H)
    dst = os.path.join(root, "colmap")
    os.makedirs(os.path.join(dst, "images"), exist_ok=True)
    with open(os.path.join(src, "transforms_train.json")) as f:
        tf = json.load(f)
    frames = []
    for i, fr in enumerate(tf["frames"]):
        fp = os.path.join(src, fr["file_path"])
        if "." not in os.path.basename(fp):
            fp += ".png"
        rgba = np.asarray(imageio.imread(fp)).astype(np.float32) / 255.0
        # colmap captures have no alpha: composite over white like a photo
        rgb = rgba[..., :3] * rgba[..., 3:] + (1.0 - rgba[..., 3:])
        name = f"images/frame_{i:03d}.png"
        imageio.imwrite(os.path.join(dst, name),
                        (rgb * 255).astype(np.uint8))
        frames.append({"file_path": name,
                       "transform_matrix": fr["transform_matrix"]})
    out = {"camera_angle_x": tf["camera_angle_x"], "frames": frames}
    with open(os.path.join(dst, "transforms.json"), "w") as f:
        json.dump(out, f)
    return dst


@pytest.mark.slow
def test_colmap_layout_end_to_end(tmp_path):
    root = str(tmp_path)
    path = _make_colmap_fixture(root, n_train=6, H=64)

    train_ds = NeRFDataset(path, "train", num_rays=512)
    val_ds = NeRFDataset(path, "val")
    test_ds = NeRFDataset(path, "test", n_test=4)

    # split contract (provider.py:117-193): val = frame 0, train = rest,
    # test = slerp trajectory with no GT
    assert train_ds.mode == "colmap"
    assert len(train_ds.poses) == 5
    assert len(val_ds.poses) == 1
    assert len(test_ds.poses) == 5  # n_test + 1
    assert test_ds.images is None and not test_ds.has_gt
    assert train_ds.images.shape[-1] == 3  # RGB, no alpha channel

    # slerp poses are valid rigid transforms
    for p in test_ds.poses:
        R = np.asarray(p)[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)

    model_cfg = NeRFConfig(bound=1.0, num_levels=4, level_dim=2,
                           log2_hashmap_size=12)
    render_cfg = RenderConfig(bound=1.0, cascades=1, grid_size=32,
                              max_steps=128, march_iters=128,
                              m_cap_per_ray=16, density_thresh=10.0)
    tr = Trainer(os.path.join(root, "ws"), model_cfg, render_cfg,
                 lr=1e-2, iters=200, eval_chunk=4096)
    tr.mark_untrained(train_ds)
    losses = []
    for step in range(40):
        aux = tr.train_one_batch(train_ds.get_batch(step % len(train_ds)),
                                 has_alpha=False)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # val render against GT frame 0
    img, _ = tr.render_image(val_ds.poses[0], val_ds.intrinsics,
                             val_ds.H, val_ds.W)
    assert img.shape == (64, 64, 3) and np.isfinite(img).all()

    # test-split (slerp, no GT) render
    img_t, depth_t = tr.render_image(test_ds.poses[2], test_ds.intrinsics,
                                     test_ds.H, test_ds.W)
    assert np.isfinite(img_t).all() and np.isfinite(depth_t).all()
