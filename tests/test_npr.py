"""NPR (single-view reference stylization) subsystem tests."""

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from laenerf_tpu.data import NeRFDataset, generate_synthetic_scene
from laenerf_tpu.editing import SemanticEncoder, StyleLossWeights
from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.train import Trainer

MODEL_CFG = NeRFConfig(bound=1.0, num_levels=8, log2_hashmap_size=15)
RENDER_CFG = RenderConfig(bound=1.0, cascades=1, grid_size=32, max_steps=256,
                          march_iters=192, m_cap_per_ray=48,
                          infer_chunk_events=16)


def test_semantic_encoder_shapes():
    sem = SemanticEncoder()
    img = np.random.RandomState(0).rand(3, 64, 64).astype(np.float32)
    feats = sem.encode_feats(img, layers=(11, 13, 15), size=(64, 64))
    assert feats.shape[0] == 3  # three layers, same channel count (256)
    assert feats.shape[1] == 256


def test_nn_feat_replace():
    sem = SemanticEncoder()
    key = jax.random.PRNGKey(0)
    content = jax.random.normal(key, (2, 8, 4, 4))
    style = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4, 4))
    # content_style == content -> each location matches itself, so the
    # replaced features are exactly the style features
    out = sem.nn_feat_replace(content, content, style)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(style.reshape(2, 8, -1)),
                               rtol=1e-4)


def test_cos_loss_zero_for_identical():
    a = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    assert float(SemanticEncoder.cos_loss(a, a)) < 1e-5
    b = -a
    assert float(SemanticEncoder.cos_loss(a, b)) > 1.9


def test_match_colors_for_image_set():
    rng = np.random.RandomState(0)
    img = rng.rand(16, 16, 3).astype(np.float32) * 0.3
    sty = np.clip(rng.rand(16, 16, 3).astype(np.float32) * 0.3 + 0.6, 0, 1)
    matched, tf = SemanticEncoder.match_colors_for_image_set(img, sty)
    assert tf.shape == (4, 4)
    assert abs(matched.mean() - sty.mean()) < abs(img.mean() - sty.mean())


@pytest.mark.slow
def test_npr_pipeline_end_to_end():
    """Miniature -m npr flow: stylize from one edited reference view."""
    from laenerf_tpu.pipeline import run_npr_pipeline

    tmp = tempfile.mkdtemp(prefix="laenerf_npr_")
    spheres = [((0.0, 0.0, 0.0), 0.45, (0.8, 0.3, 0.2), 60.0)]
    generate_synthetic_scene(tmp, n_train=6, n_val=1, n_test=1, H=40, W=40,
                             spheres=spheres)
    ds = NeRFDataset(tmp, "train", num_rays=256)
    tr = Trainer(tmp + "/ws", MODEL_CFG, RENDER_CFG, lr=1e-2, iters=1000)
    tr.mark_untrained(ds)
    for step in range(150):
        tr.train_one_batch(ds.get_batch(step % len(ds)), has_alpha=True)

    # fabricate a "user stylized" reference view: recolor view 0 to green
    cfg_dir = os.path.join(tmp, "npr_ref")
    os.makedirs(cfg_dir, exist_ok=True)
    ref = ds.images[0].copy()
    ref[..., 1] = np.clip(ref[..., 1] * 2.0, 0, 1)  # boost green
    import imageio.v2 as imageio

    imageio.imwrite(os.path.join(cfg_dir, "ref.png"),
                    (ref * 255).astype(np.uint8))
    with open(os.path.join(cfg_dir, "data_config.json"), "w") as f:
        json.dump({"tmpl_idx_train": 0}, f)

    weights = StyleLossWeights(offset_loss=1e-4, weight_loss_uniform=1e-6,
                               weight_loss_non_uniform=1e-6,
                               palette_loss_valid=1e-4, tv_weight=1e-5,
                               tv_depth_guide=True, warmup_iterations=0)
    npr_tr = run_npr_pipeline(
        tr, ds, cfg_dir, tmp + "/npr_ws", weights, train_steps_style=30,
        train_steps_distill=20, num_palette_bases=4, feature_size=64,
        num_rays=256, log_fn=lambda *a: None,
    )
    assert npr_tr.step == 30
    assert os.path.exists(os.path.join(tmp, "npr_ws", "style_enc.npz"))
    assert os.path.exists(os.path.join(tmp, "npr_ws", "timings.json"))
