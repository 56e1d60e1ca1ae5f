"""Where does the last dB live? Train-view PSNR of the finished r5 gate
model at full 800^2.

If the model cannot reproduce its own TRAIN views much above the test
number (~29.9), the gap to the instant-ngp-class 33-36 is fit capacity /
optimization / GT-rendering mismatch — not view generalization. If train
views sit at 33+, the gap is generalization (more views / regularization).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from laenerf_tpu.data import NeRFDataset
from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.train import Trainer
from laenerf_tpu.utils import enable_compilation_cache

enable_compilation_cache()

ws = "/tmp/qgate_r5"
model_cfg = NeRFConfig(bound=1.0, num_levels=16, level_dim=2,
                       log2_hashmap_size=19)
render_cfg = RenderConfig(bound=1.0, cascades=1, grid_size=128,
                          max_steps=1024, march_iters=512,
                          m_cap_per_ray=40, density_thresh=10.0,
                          infer_chunk_events=16, infer_compact_factor=4)
tr = Trainer(ws + "/ws", model_cfg, render_cfg, lr=1e-2, iters=30000,
             eval_chunk=16384)
assert tr.load_checkpoint("latest")
ds = NeRFDataset(ws + "/scene", "train")

mses = []
for i in range(0, 8):
    img, _ = tr.render_image(ds.poses[i], ds.intrinsics, ds.H, ds.W)
    gt = ds.images[i]
    if gt.shape[-1] == 4:
        gt = gt[..., :3] * gt[..., 3:] + (1 - gt[..., 3:])
    mse = float(np.mean((np.asarray(img) - gt) ** 2))
    mses.append(mse)
    print(f"# train view {i}: psnr {-10 * np.log10(mse):.2f}", flush=True)
p = -10 * np.log10(np.mean(mses))
print(f"train-view PSNR (8 views, 800x800): {p:.2f}", flush=True)
