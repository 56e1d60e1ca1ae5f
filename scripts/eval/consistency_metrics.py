#!/usr/bin/env python
"""Short/long-range view-consistency metrics.

Equivalent of the reference's scripts/eval/consistency_metrics.py, which
warps rendered video frame t to t+step with RAFT optical flow (run inside a
RAFT checkout, README.md:131-140) and reports occlusion-masked MSE + LPIPS.

RAFT and its pretrained weights are not available in this environment (zero
egress), so this script implements the same protocol with a pluggable flow
backend:
  * --flow_dir: precomputed flow .npy files ([H, W, 2] per frame pair) from
    any external RAFT run — exact reference protocol.
  * --flow farneback-like: a pure-NumPy coarse-to-fine block-matching flow
    as a built-in fallback (weaker flow; documented deviation).

Occlusion mask: forward-backward consistency < 1px, as in the protocol.
"""

import argparse
import json
import os

import numpy as np

try:
    import imageio.v2 as imageio
except ImportError:
    import imageio


def _load(path):
    img = np.asarray(imageio.imread(path), np.float32)[..., :3] / 255.0
    return img


def block_flow(a, b, radius=8, patch=8, stride=4):
    """Coarse block-matching flow a->b (fallback; RAFT preferred)."""
    H, W, _ = a.shape
    gy = np.arange(0, H - patch, stride)
    gx = np.arange(0, W - patch, stride)
    flow = np.zeros((len(gy), len(gx), 2), np.float32)
    for iy, y in enumerate(gy):
        for ix, x in enumerate(gx):
            pa = a[y:y + patch, x:x + patch]
            best, bd = (0, 0), np.inf
            for dy in range(-radius, radius + 1, 2):
                for dx in range(-radius, radius + 1, 2):
                    yy, xx = y + dy, x + dx
                    if yy < 0 or xx < 0 or yy + patch > H or xx + patch > W:
                        continue
                    d = np.mean((pa - b[yy:yy + patch, xx:xx + patch]) ** 2)
                    if d < bd:
                        bd, best = d, (dx, dy)
            flow[iy, ix] = best
    # upsample to full res
    from PIL import Image

    fx = np.asarray(Image.fromarray(flow[..., 0]).resize((W, H),
                                                         Image.BILINEAR))
    fy = np.asarray(Image.fromarray(flow[..., 1]).resize((W, H),
                                                         Image.BILINEAR))
    return np.stack([fx, fy], -1)


def warp(img, flow):
    """Backward-warp img by flow (bilinear)."""
    H, W, _ = img.shape
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    x = np.clip(gx + flow[..., 0], 0, W - 1)
    y = np.clip(gy + flow[..., 1], 0, H - 1)
    x0, y0 = np.floor(x).astype(int), np.floor(y).astype(int)
    x1, y1 = np.minimum(x0 + 1, W - 1), np.minimum(y0 + 1, H - 1)
    wx, wy = (x - x0)[..., None], (y - y0)[..., None]
    return (img[y0, x0] * (1 - wx) * (1 - wy) + img[y0, x1] * wx * (1 - wy)
            + img[y1, x0] * (1 - wx) * wy + img[y1, x1] * wx * wy)


def evaluate(frames_dir, step=1, flow_dir=None, save_json=None):
    files = sorted(f for f in os.listdir(frames_dir)
                   if f.lower().endswith((".png", ".jpg")))
    mses, lpipss = [], []
    lpips = None
    try:
        from laenerf_tpu.editing.vgg import lpips_fn

        lpips = lpips_fn()
    except Exception:
        pass

    for i in range(len(files) - step):
        a = _load(os.path.join(frames_dir, files[i]))
        b = _load(os.path.join(frames_dir, files[i + step]))
        if flow_dir:
            fwd = np.load(os.path.join(flow_dir, f"flow_{i:04d}_{step}.npy"))
            bwd_p = os.path.join(flow_dir, f"flowb_{i:04d}_{step}.npy")
            bwd = np.load(bwd_p) if os.path.exists(bwd_p) else None
        else:
            fwd = block_flow(a, b)
            bwd = block_flow(b, a)
        warped = warp(b, fwd)
        if bwd is not None:
            # forward-backward occlusion check
            fb = fwd + warp(bwd, fwd)
            occ = (np.linalg.norm(fb, axis=-1) < 1.0)[..., None]
        else:
            occ = np.ones(a.shape[:2] + (1,), bool)
        denom = max(occ.sum() * 3, 1)
        mses.append(float((np.square(warped - a) * occ).sum() / denom))
        if lpips is not None:
            lpipss.append(float(lpips(a * occ, warped * occ)))

    result = {
        "step": step,
        "mse_mean": float(np.mean(mses)) if mses else None,
        "lpips_mean": float(np.mean(lpipss)) if lpipss else None,
        "n_pairs": len(mses),
    }
    if save_json:
        with open(save_json, "w") as f:
            json.dump(result, f, indent=2)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--frames_dir", type=str, required=True,
                   help="rendered video frames")
    p.add_argument("--step", type=int, default=1,
                   help="1 = short-range, 7 = long-range (README.md:131-140)")
    p.add_argument("--flow_dir", type=str, default=None,
                   help="precomputed RAFT flows (exact protocol)")
    p.add_argument("--save_json", type=str, default=None)
    a = p.parse_args()
    evaluate(a.frames_dir, a.step, a.flow_dir, a.save_json)
