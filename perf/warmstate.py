"""Shared warm-model loader for perf probes.

First call trains the bench scene to a pruned occupancy grid and caches
checkpoint + grid under /tmp/laenerf_warm*; later calls reload in seconds.
Same protocol as perf/profile_render.py (kept separate because that script
does its work at module scope).
"""

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from laenerf_tpu.data import NeRFDataset, generate_synthetic_scene
from laenerf_tpu.models import NeRFConfig, RenderConfig
from laenerf_tpu.train import Trainer
from laenerf_tpu.utils import enable_compilation_cache


def get_warm_trainer(chunk=32768, K=16, Km=0, factor=4, model_kw=None,
                     render_kw=None):
    enable_compilation_cache()
    model_cfg = NeRFConfig(bound=1.0, num_levels=8, level_dim=4,
                           log2_hashmap_size=19, **(model_kw or {}))
    cache = ("/tmp/laenerf_warm_octo" if model_cfg.octo_gather
             else "/tmp/laenerf_warm")
    rkw = dict(bound=1.0, cascades=1, grid_size=128, max_steps=256,
               march_iters=256, m_cap_per_ray=16, density_thresh=10.0,
               infer_chunk_events=K, infer_compact_factor=factor)
    if Km:
        rkw["infer_march_events"] = Km
    rkw.update(render_kw or {})
    render_cfg = RenderConfig(**rkw)

    if not os.path.exists(cache + "/scene/transforms_train.json"):
        os.makedirs(cache, exist_ok=True)
        generate_synthetic_scene(cache + "/scene", n_train=16, n_val=1,
                                 n_test=1, H=100, W=100)
    ds = NeRFDataset(cache + "/scene", "train", num_rays=4096)
    tr = Trainer(cache + "/ws", model_cfg, render_cfg, lr=1e-2, iters=2000,
                 eval_chunk=chunk)
    occ_path = cache + "/occ.npz"
    if os.path.exists(occ_path) and tr.ckpt.latest() is not None:
        tr.load_checkpoint("latest")
        d = np.load(occ_path)
        tr.occ_state = dataclasses.replace(
            tr.occ_state, occupancy=jnp.asarray(d["occupancy"]),
            density_grid=jnp.asarray(d["density_grid"]),
            iter_density=jnp.asarray(d["iter_density"]))
        print(f"# loaded warm state (occ "
              f"{float(jnp.mean(tr.occ_state.occupancy)):.4f})", flush=True)
    else:
        tr.mark_untrained(ds)
        step = 0
        while step < 1536:
            tr.train_one_batch(ds.get_batch(step % len(ds)), has_alpha=True)
            step += 1
            if step % 256 == 0:
                occ = float(jnp.mean(tr.occ_state.occupancy))
                print(f"# warm {step}: occ {occ:.3f}", flush=True)
                if occ < 0.05 and step >= 768:
                    break
        jax.block_until_ready(tr.state.params)
        tr.save_checkpoint()
        np.savez(occ_path,
                 occupancy=np.asarray(tr.occ_state.occupancy),
                 density_grid=np.asarray(tr.occ_state.density_grid),
                 iter_density=np.asarray(tr.occ_state.iter_density))
    return tr, ds
