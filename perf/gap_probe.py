"""Bench train/test PSNR gap experiment (VERDICT r2/r3 carried item).

BENCH_r03 recorded train 35.9 / val 30.6 / test 21.2 dB on the bench's
16-view 100x100 warmup. Hypothesis: few-view overfit on an extrapolated
test pose (generate_synthetic_scene draws a random elevation per view),
not an eval-path bug. Experiment: train the exact bench config at
n_train in {16, 64} and report all three split PSNRs + per-test-view
spread. If the gap closes with views, it's overfit; if it persists, the
eval path is suspect.

Usage: python -u perf/gap_probe.py [--steps 1024]
"""

import argparse
import sys
import tempfile

parser = argparse.ArgumentParser()
parser.add_argument("--steps", type=int, default=1024)
parser.add_argument("--views", type=int, nargs="+", default=[16, 64])
args = parser.parse_args()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from laenerf_tpu.data import NeRFDataset, generate_synthetic_scene
from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.train import Trainer
from laenerf_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def run(n_train):
    tmp = tempfile.mkdtemp(prefix=f"laenerf_gap{n_train}_")
    # n_test=4 to see the per-view spread (the bench's single test view
    # could simply be an unlucky elevation draw)
    generate_synthetic_scene(tmp, n_train=n_train, n_val=2, n_test=4,
                             H=100, W=100)
    ds = NeRFDataset(tmp, "train", num_rays=4096)
    model_cfg = NeRFConfig(bound=1.0, num_levels=8, level_dim=4,
                           log2_hashmap_size=19)
    render_cfg = RenderConfig(bound=1.0, cascades=1, grid_size=128,
                              max_steps=256, march_iters=256,
                              m_cap_per_ray=16, density_thresh=10.0,
                              infer_chunk_events=16, infer_compact_factor=4)
    tr = Trainer(tmp + "/ws", model_cfg, render_cfg, lr=1e-2, iters=2000,
                 eval_chunk=32768)
    tr.mark_untrained(ds)
    for step in range(args.steps):
        tr.train_one_batch(ds.get_batch(step % len(ds)), has_alpha=True)
    jax.block_until_ready(tr.state.params)

    def view_psnr(split, i):
        sd = NeRFDataset(tmp, split)
        img, _ = tr.render_image(sd.poses[i], sd.intrinsics, sd.H, sd.W)
        gt = sd.images[i]
        gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])
        return float(-10 * np.log10(max(np.mean((img - gt) ** 2), 1e-10)))

    train_p = view_psnr("train", 0)
    val_p = [view_psnr("val", i) for i in range(2)]
    test_p = [view_psnr("test", i) for i in range(4)]
    occ = float(jnp.mean(tr.occ_state.occupancy))
    print(f"n_train={n_train:3d} steps={args.steps} occ={occ:.4f} | "
          f"train {train_p:.2f} | val {np.mean(val_p):.2f} "
          f"(views {['%.1f' % p for p in val_p]}) | "
          f"test {np.mean(test_p):.2f} "
          f"(views {['%.1f' % p for p in test_p]})", flush=True)
    return train_p, np.mean(val_p), np.mean(test_p)


results = {n: run(n) for n in args.views}
gap16 = results[args.views[0]][0] - results[args.views[0]][2]
gapN = results[args.views[-1]][0] - results[args.views[-1]][2]
print(f"# train-test gap: {gap16:.1f} dB at {args.views[0]} views -> "
      f"{gapN:.1f} dB at {args.views[-1]} views "
      f"({'OVERFIT confirmed' if gapN < gap16 - 3 else 'NOT explained by views'})",
      flush=True)
