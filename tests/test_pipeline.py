"""End-to-end recolor pipeline integration on a tiny synthetic scene.

Mirrors the reference's -m recolor flow (scripts/run_llff.sh:29-66): train a
NeRF, select a region, grow it, train LAENeRF, distill with a modified
palette, fine-tune the NeRF, and check the edit landed inside the region.
"""

import tempfile

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from laenerf_tpu.data import NeRFDataset, generate_synthetic_scene
from laenerf_tpu.editing import EditGrid, StyleLossWeights
from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.pipeline import EditPipeline, PipelineConfig, project_points
from laenerf_tpu.train import Trainer

MODEL_CFG = NeRFConfig(bound=1.0, num_levels=8, log2_hashmap_size=15)
RENDER_CFG = RenderConfig(bound=1.0, cascades=1, grid_size=32, max_steps=256,
                          march_iters=192, m_cap_per_ray=48,
                          infer_chunk_events=16)


@pytest.fixture(scope="module")
def trained():
    tmp = tempfile.mkdtemp(prefix="laenerf_pipe_")
    # single-sphere scene so region selection is trivial
    spheres = [((0.0, 0.0, 0.0), 0.45, (0.8, 0.3, 0.2), 60.0)]
    generate_synthetic_scene(tmp, n_train=8, n_val=1, n_test=1, H=48, W=48,
                             spheres=spheres)
    ds = NeRFDataset(tmp, "train", num_rays=512)
    tr = Trainer(tmp + "/ws", MODEL_CFG, RENDER_CFG, lr=1e-2, iters=1000)
    tr.mark_untrained(ds)
    for step in range(250):
        tr.train_one_batch(ds.get_batch(step % len(ds)), has_alpha=True)
    return tmp, ds, tr


def test_project_points(trained):
    tmp, ds, tr = trained
    pts = project_points(tr, ds.poses[0], ds.intrinsics,
                         [[24, 24]], ds.H, ds.W)
    assert pts.shape == (1, 3)
    # the center pixel should terminate on the sphere (|x| < ~0.5)
    assert np.linalg.norm(pts[0]) < 0.6


def test_recolor_pipeline(trained):
    tmp, ds, tr = trained
    H, W = ds.H, ds.W

    # region selection: project the center pixel, voxelize + grow
    pts = project_points(tr, ds.poses[0], ds.intrinsics, [[24, 24]], H, W)
    eg = EditGrid(cascades=RENDER_CFG.cascades,
                  grid_size=RENDER_CFG.grid_size)
    eg.new_from_points(pts, bound=1.0)
    density = np.asarray(tr.occ_state.density_grid)
    thresh = min(float(tr.occ_state.mean_density), 0.01)
    eg.grow_region_queue(density, thresh, grow_iterations=100000)
    assert eg.grid.sum() > 10

    grow = EditGrid(RENDER_CFG.cascades, RENDER_CFG.grid_size)
    grow.grid_from_growing_queue(eg, density, thresh)

    before = ds.images[0].copy()

    cfg = PipelineConfig(
        mode="recolor",
        train_steps_style=60,
        train_steps_distill=40,
        distill_palette_steps=20,
        num_palette_bases=4,
        depth_diff=0.5,
        weights=StyleLossWeights(
            offset_loss=1e-4, weight_loss_uniform=1e-5,
            weight_loss_non_uniform=1e-5, palette_loss_valid=1e-4,
            palette_loss_distinct=1e-4, warmup_iterations=10,
        ),
    )
    pipe = EditPipeline(tr, ds, cfg, tmp + "/edit_ws", eg, grow)
    pipe.init_phase()
    assert len(pipe.edit_dataset) > 0
    pipe.train_laenerf_phase(log_every=30, log_fn=lambda *a: None)

    # user recolor: shift the palette toward green
    pal = np.asarray(pipe.style_trainer.params["palette"])
    cfg.palette_mod = np.clip(pal * np.array([0.1, 1.5, 0.1]), 0, 1)
    stats = pipe.distill_phase(log_fn=lambda *a: None)
    assert np.isfinite(stats["sparsity_loss"])

    # distillation must have changed pixels inside the region of some view
    changed = any(
        not np.allclose(ds.images[v["view_index"]], before)
        for v in pipe.edit_dataset.views[:1]
    ) or not np.allclose(ds.images[0], before)
    assert changed

    pipe.finetune_phase(log_fn=lambda *a: None)
    results = pipe.eval_phase(test_dataset=ds, log_fn=lambda *a: None)
    assert np.isfinite(results["psnr_train"])

    # edit-region masks are exported for bg-MSE (VERDICT item 5); the
    # region was grown around the object, so masks must have positives
    import os
    mask0 = os.path.join(tmp, "edit_ws", "masks", "test", "000.png")
    assert os.path.exists(mask0)
    import imageio.v2 as iio
    marr = np.asarray(iio.imread(mask0))
    assert marr[..., 1].sum() > 0  # G-channel convention

    # the bg-MSE eval script consumes the exported renders + masks
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "mse_background", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "eval", "mse_background.py"))
    mseb = ilu.module_from_spec(spec)
    spec.loader.exec_module(mseb)
    res = mseb.evaluate(
        results_dir=os.path.join(tmp, "edit_ws", "render_test"),
        scene=os.path.basename(tmp), datatype=os.path.basename(
            os.path.dirname(tmp)),
        data_root=os.path.dirname(os.path.dirname(tmp)),
        masks_root=os.path.join(tmp, "edit_ws", "masks", "test"))
    assert np.isfinite(res["mean"])

    # artifact contract (SURVEY.md §4: pipeline artifacts as oracles)
    import os
    ws = tmp + "/edit_ws"
    for f in ("hparams.json", "opt.json", "edit_grid.npz", "grow_grid.npz",
              "style_enc.npz", "palet_og.npz", "palet_mod.npz",
              "palette_eval.json", "timings.json",
              "results_psnr_train.json"):
        assert os.path.exists(os.path.join(ws, f)), f


def test_recolorable_reload(trained):
    """BASELINE config 5: reload a trained LAENeRF (+ palette) and skip the
    style-encoder training phase (gui.py:165-180)."""
    import os

    import numpy as np

    from laenerf_tpu.editing import EditGrid, StyleLossWeights
    from laenerf_tpu.pipeline import EditPipeline, PipelineConfig, project_points

    tmp, ds, tr = trained
    ws1 = tmp + "/edit_ws"  # produced by test_recolor_pipeline
    enc_path = os.path.join(ws1, "style_enc.npz")
    if not os.path.exists(enc_path):
        pytest.skip("needs test_recolor_pipeline's workspace (file order)")
    assert os.path.exists(enc_path)

    # modified palette file
    pal = np.load(os.path.join(ws1, "palet_og.npz"))["palette"]
    pal_path = tmp + "/pal_mod.npz"
    np.savez(pal_path, palette=np.clip(pal * [1.5, 0.2, 0.2], 0, 1))

    eg = EditGrid.load(os.path.join(ws1, "edit_grid.npz"))
    grow = EditGrid.load(os.path.join(ws1, "grow_grid.npz"))
    cfg = PipelineConfig(
        mode="recolor", train_steps_style=50, train_steps_distill=10,
        distill_palette_steps=0, num_palette_bases=4, depth_diff=0.5,
        weights=StyleLossWeights(warmup_iterations=10),
        style_enc_path=enc_path, palette_path=pal_path,
        load_edit_dataset=os.path.join(ws1, "edataset.npz"),
    )
    pipe = EditPipeline(tr, ds, cfg, tmp + "/edit_ws2", eg, grow)
    pipe.init_phase()
    # reload path: training is skipped entirely
    pipe.train_laenerf_phase(log_fn=lambda *a: None)
    assert pipe.style_trainer.step == 0
    # the palette file overrode the learned palette
    np.testing.assert_allclose(
        np.asarray(pipe.style_trainer.params["palette"]),
        np.load(pal_path)["palette"], atol=1e-6,
    )
    stats = pipe.distill_phase(log_fn=lambda *a: None)
    assert np.isfinite(stats["tv_loss"])


def test_style_pipeline(trained, tmp_path):
    """-m style flow with Gram/TV/depth-disc losses active (run_llff.sh:68-97
    hyperparameter shape, miniature budgets)."""
    import os

    import numpy as np

    from laenerf_tpu.editing import EditGrid, StyleLossWeights
    from laenerf_tpu.pipeline import EditPipeline, PipelineConfig

    tmp, ds, tr = trained
    ws1 = tmp + "/edit_ws"
    if not os.path.exists(os.path.join(ws1, "edit_grid.npz")):
        pytest.skip("needs test_recolor_pipeline's workspace (file order)")
    eg = EditGrid.load(os.path.join(ws1, "edit_grid.npz"))
    grow = EditGrid.load(os.path.join(ws1, "grow_grid.npz"))

    # style image
    rng = np.random.RandomState(0)
    style_path = str(tmp_path / "style.png")
    import imageio.v2 as imageio

    imageio.imwrite(style_path, (rng.rand(64, 64, 3) * 255).astype(np.uint8))

    cfg = PipelineConfig(
        mode="style", train_steps_style=25, train_steps_distill=10,
        distill_palette_steps=5, num_palette_bases=4, depth_diff=0.5,
        style_image=style_path, crop_size=32,
        load_edit_dataset=os.path.join(ws1, "edataset.npz"),
        weights=StyleLossWeights(
            offset_loss=5e-5, weight_loss_non_uniform=1e-7,
            palette_loss_valid=1.0, smooth_trans_weight=1e-3,
            tv_weight=1e-4, tv_depth_guide=True, depth_disc_weight=5e-4,
            style_weight=130.0, warmup_iterations=5,
        ),
    )
    pipe = EditPipeline(tr, ds, cfg, str(tmp_path / "style_ws"), eg, grow)
    pipe.init_phase()
    assert pipe.style_trainer.style_network is not None
    pipe.train_laenerf_phase(log_every=25, log_fn=lambda *a: None)
    assert pipe.style_trainer.step == 25
    stats = pipe.distill_phase(log_fn=lambda *a: None)
    assert np.isfinite(stats["tv_loss"])
    assert os.path.exists(str(tmp_path / "style_ws" / "style_image.png"))
