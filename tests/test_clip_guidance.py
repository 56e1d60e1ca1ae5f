"""CLIP-guided training: gradients must flow from the text-image
similarity through the JAX ViT-B/16 vision tower into NeRF parameters
(reference: nerf/utils.py:543-557 backprops the frozen-CLIP loss; here the
tower is models/clip_vit.py and the weights are synthetic — the plumbing,
not the semantics, is under test)."""

import jax
import jax.numpy as jnp
import numpy as np

from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.models.clip_vit import (clip_preprocess, clip_similarity_loss,
                                         clip_vision_forward,
                                         clip_vision_init, load_clip_vision)


def test_clip_vision_forward_shapes_and_norm():
    params = clip_vision_init(seed=0)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))
    z = clip_vision_forward(params, imgs)
    assert z.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1),
                               1.0, rtol=1e-5)


def test_load_clip_vision_gated():
    params, pretrained = load_clip_vision()
    # no weights drop in this environment -> deterministic random init
    assert isinstance(pretrained, bool)
    assert params["blocks"]["qkv_w"].shape[0] == 12


def test_clip_gradient_flows_to_nerf_params():
    """A gradient must reach the hash-encoder table from the CLIP loss
    through render -> resize -> ViT (the reference's utils.py:553 loss)."""
    from laenerf_tpu.models.nerf import nerf_init
    from laenerf_tpu.models.renderer import render_rays_train
    from laenerf_tpu.data.rays import get_rays

    model_cfg = NeRFConfig(bound=1.0, num_levels=4, level_dim=2,
                           log2_hashmap_size=12)
    render_cfg = RenderConfig(bound=1.0, cascades=1, grid_size=32,
                              max_steps=64, march_iters=64,
                              m_cap_per_ray=8, density_thresh=0.01)
    params = nerf_init(jax.random.PRNGKey(0), model_cfg)
    occupancy = jnp.ones((1, 32, 32, 32), jnp.uint8)
    clip_params = clip_vision_init(seed=1)
    text_z = jax.random.normal(jax.random.PRNGKey(2), (512,))

    H = W = 32
    pose = jnp.array([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.0],
                      [0, 0, 0, 1.0]])
    intr = jnp.array([32.0, 32.0, 16.0, 16.0])
    inds = jnp.arange(H * W, dtype=jnp.int32)
    rays_o, rays_d = get_rays(pose, intr, inds, H, W)

    def loss_fn(p):
        out = render_rays_train(p, occupancy, rays_o, rays_d,
                                jax.random.PRNGKey(3), model_cfg=model_cfg,
                                render_cfg=render_cfg, bg_color=None,
                                perturb=False)
        img = out["image"].reshape(1, H, W, 3)
        return clip_similarity_loss(clip_params, img, text_z)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    g_enc = np.asarray(jnp.abs(grads["encoder"]).sum())
    g_sigma = sum(float(jnp.abs(g).sum())
                  for g in jax.tree.leaves(grads["sigma_mlp"])) \
        if "sigma_mlp" in grads else None
    assert g_enc > 0, "no gradient reached the hash encoder from CLIP"


def test_train_one_batch_clip_runs(tmp_path):
    """End-to-end: Trainer.train_one_batch_clip updates parameters."""
    from laenerf_tpu.train import Trainer

    model_cfg = NeRFConfig(bound=1.0, num_levels=4, level_dim=2,
                           log2_hashmap_size=12)
    render_cfg = RenderConfig(bound=1.0, cascades=1, grid_size=32,
                              max_steps=64, march_iters=64,
                              m_cap_per_ray=8, density_thresh=0.01)
    tr = Trainer(str(tmp_path / "ws"), model_cfg, render_cfg, lr=1e-2,
                 iters=100)
    clip_params = clip_vision_init(seed=1)
    text_z = np.random.RandomState(0).randn(512).astype(np.float32)
    pose = np.array([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.0],
                     [0, 0, 0, 1.0]], np.float32)
    intr = np.array([32.0, 32.0, 16.0, 16.0], np.float32)
    before = np.asarray(tr.state.params["encoder"]).copy()
    aux = tr.train_one_batch_clip(clip_params, text_z, pose, intr, 32, 32)
    assert np.isfinite(float(aux["loss"]))
    after = np.asarray(tr.state.params["encoder"])
    assert not np.allclose(before, after), "CLIP step did not update params"
