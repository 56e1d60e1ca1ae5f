"""End-to-end integration: train a tiny NeRF on a procedural scene and check
the quality improves, plus the data-parallel path over the 8-device CPU mesh."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from laenerf_tpu.data import NeRFDataset, generate_synthetic_scene
from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.parallel import dp_train_step, make_mesh
from laenerf_tpu.train import Trainer, train_step


@pytest.fixture(scope="module")
def scene_dir():
    tmp = tempfile.mkdtemp(prefix="laenerf_scene_")
    generate_synthetic_scene(tmp, n_train=12, n_val=1, n_test=1, H=64, W=64)
    return tmp


MODEL_CFG = NeRFConfig(bound=1.0, num_levels=8, log2_hashmap_size=15)
RENDER_CFG = RenderConfig(bound=1.0, cascades=1, grid_size=32, max_steps=256,
                          march_iters=192, m_cap_per_ray=48)


def test_dataset_loading(scene_dir):
    ds = NeRFDataset(scene_dir, "train", num_rays=256)
    assert ds.mode == "blender"
    assert ds.poses.shape == (12, 4, 4)
    assert ds.images.shape == (12, 64, 64, 4)
    assert ds.H == ds.W == 64
    batch = ds.get_batch(0)
    assert batch["inds"].shape == (256,)
    assert batch["pixels"].shape == (256, 4)


def test_error_map_sampling(scene_dir):
    ds = NeRFDataset(scene_dir, "train", num_rays=128, error_map=True)
    batch = ds.get_batch(0)
    assert "inds_coarse" in batch
    before = ds.error_map[0].copy()
    ds.update_error_map(0, batch["inds_coarse"],
                        np.random.rand(128).astype(np.float32))
    assert not np.allclose(ds.error_map[0], before)


def test_training_improves_psnr(scene_dir):
    ds = NeRFDataset(scene_dir, "train", num_rays=512)
    with tempfile.TemporaryDirectory() as ws:
        tr = Trainer(ws, MODEL_CFG, RENDER_CFG, lr=1e-2, iters=2000)
        tr.mark_untrained(ds)
        losses = []
        for step in range(180):
            aux = tr.train_one_batch(ds.get_batch(step % len(ds)),
                                     has_alpha=True)
            losses.append(float(aux["loss"]))
        first = np.mean(losses[:10])
        last = np.mean(losses[-10:])
        assert last < first * 0.5, (first, last)
        # held-out style render on a train view
        img, depth = tr.render_image(ds.poses[0], ds.intrinsics, 64, 64)
        gt = ds.images[0]
        gt = gt[..., :3] * gt[..., 3:] + (1 - gt[..., 3:])
        psnr = -10 * np.log10(np.mean((img - gt) ** 2))
        assert psnr > 16.0, psnr
        assert np.isfinite(depth).all()

        # checkpoint roundtrip
        path = tr.save_checkpoint()
        tr2 = Trainer(ws, MODEL_CFG, RENDER_CFG, lr=1e-2, iters=2000)
        assert tr2.load_checkpoint("latest")
        img2, _ = tr2.render_image(ds.poses[0], ds.intrinsics, 64, 64)
        np.testing.assert_allclose(img2, img, atol=1e-5)


def test_dp_train_step_8devices(scene_dir):
    """The DDP-equivalent: rays sharded over an 8-device mesh must produce
    the same loss/updates as single-device execution."""
    assert jax.device_count() >= 8
    ds = NeRFDataset(scene_dir, "train", num_rays=512)
    with tempfile.TemporaryDirectory() as ws:
        tr = Trainer(ws, MODEL_CFG, RENDER_CFG, lr=1e-2, iters=2000)
        batch = ds.get_batch(0)
        args = (
            tr.state, tr.occ_state.occupancy, jnp.asarray(batch["pose"]),
            jnp.asarray(batch["intrinsics"]), jnp.asarray(batch["inds"]),
            jnp.asarray(batch["pixels"]), jax.random.PRNGKey(7),
        )
        kw = dict(model_cfg=MODEL_CFG, render_cfg=RENDER_CFG,
                  optimizer=tr.optimizer, ema_decay=0.95, has_alpha=True,
                  bg_white=True, H=64, W=64)
        # train_step donates its state buffers; give each call its own copy
        state_copy = jax.tree.map(jnp.array, args[0])
        state_1d, aux_1d = train_step(state_copy, *args[1:], **kw)

        mesh = make_mesh(8)
        state_dp, aux_dp = dp_train_step(mesh, train_step, *args, **kw)
        np.testing.assert_allclose(float(aux_dp["loss"]),
                                   float(aux_1d["loss"]), rtol=1e-4)
        l1 = jax.tree.leaves(state_1d.params)
        l2 = jax.tree.leaves(state_dp.params)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


def test_dp_render_image_8devices(scene_dir):
    """Sharded full-image rendering must match single-device rendering."""
    from laenerf_tpu.parallel import dp_render_image, make_mesh

    ds = NeRFDataset(scene_dir, "train", num_rays=256)
    with tempfile.TemporaryDirectory() as ws:
        tr = Trainer(ws, MODEL_CFG, RENDER_CFG, lr=1e-2, iters=500)
        tr.mark_untrained(ds)
        for step in range(30):
            tr.train_one_batch(ds.get_batch(step % len(ds)), has_alpha=True)

        img1, d1 = tr.render_image(ds.poses[0], ds.intrinsics, 32, 32)
        mesh = make_mesh(8)
        img8, d8 = dp_render_image(
            mesh, tr.state.ema_params, tr.occ_state.occupancy, ds.poses[0],
            ds.intrinsics, 32, 32, model_cfg=MODEL_CFG,
            render_cfg=RENDER_CFG,
        )
        np.testing.assert_allclose(img8, img1, atol=2e-3)
        np.testing.assert_allclose(d8, d1, atol=2e-3)


def test_render_image_repack_matches_plain(scene_dir):
    """Phased inference with global ray repacking must reproduce the plain
    per-chunk while_loop render exactly (same rounds semantics, same
    composite order — repacking only changes WHICH rays share a dispatch)."""
    import dataclasses

    ds = NeRFDataset(scene_dir, "train", num_rays=512)
    with tempfile.TemporaryDirectory() as ws:
        tr = Trainer(ws, MODEL_CFG, RENDER_CFG, lr=1e-2, iters=2000,
                     eval_chunk=1024)
        tr.mark_untrained(ds)
        for step in range(60):
            tr.train_one_batch(ds.get_batch(step % len(ds)), has_alpha=True)
        img, depth = tr.render_image(ds.poses[0], ds.intrinsics, 64, 64)

        # per-frame hoisted skip field must be exact parity with the
        # field built inside the chunk jit (render_image passes it)
        from laenerf_tpu.models.renderer import (build_march_tables,
                                                 render_rays_infer)
        from laenerf_tpu.data.rays import pixel_rays
        import jax.numpy as jnp
        skip_flat = build_march_tables(tr.occ_state.occupancy,
                                       render_cfg=tr.render_cfg)
        rays_o, rays_d = pixel_rays(jnp.asarray(ds.poses[0]),
                                    jnp.asarray(ds.intrinsics), 64, 64)
        import jax
        params = dict(tr.state.ema_params)
        out_a = render_rays_infer(params, tr.occ_state.occupancy,
                                  rays_o, rays_d, jax.random.PRNGKey(0),
                                  model_cfg=tr.model_cfg,
                                  render_cfg=tr.render_cfg, bg_color=1.0)
        out_b = render_rays_infer(params, tr.occ_state.occupancy,
                                  rays_o, rays_d, jax.random.PRNGKey(0),
                                  model_cfg=tr.model_cfg,
                                  render_cfg=tr.render_cfg, bg_color=1.0,
                                  skip_flat=skip_flat)
        np.testing.assert_allclose(np.asarray(out_b["image"]),
                                   np.asarray(out_a["image"]), atol=1e-6)
