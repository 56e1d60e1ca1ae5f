#!/usr/bin/env python
"""Convert an LLFF dataset (poses_bounds.npy + images_N/) to transforms_*.json.

Equivalent of the reference's scripts/llff2nerf.py (+ data_utils/llff.py
spiral and data_utils/nerf_360_v2.py ellipse video paths): undo the LLFF
[down right back] convention, apply the instant-ngp world alignment (up ->
+z, center of attention at the origin, radius scaled to 4), hold out every
Nth image for test, and emit train/val/test/video splits.
"""

import argparse
import glob
import json
import os

import numpy as np


def normalize(v):
    return v / np.linalg.norm(v)


def view_matrix(forward, up, pos):
    f = normalize(forward)
    r = normalize(np.cross(up, f))
    u = normalize(np.cross(f, r))
    return np.stack([r, u, f, pos], axis=1)


def rot_between(a, b):
    """Rotation matrix taking unit vector a to b (Rodrigues)."""
    a, b = normalize(a), normalize(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if c < -1 + 1e-8:
        return rot_between(a + np.random.uniform(-1e-2, 1e-2, 3), b)
    s = np.linalg.norm(v)
    k = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + k + k @ k * ((1 - c) / (s ** 2 + 1e-10))


def ray_midpoint(oa, da, ob, db):
    """Closest point between two rays + a parallelism weight."""
    da, db = normalize(da), normalize(db)
    c = np.cross(da, db)
    denom = np.linalg.norm(c) ** 2
    t = ob - oa
    ta = np.linalg.det([t, db, c]) / (denom + 1e-10)
    tb = np.linalg.det([t, da, c]) / (denom + 1e-10)
    ta, tb = min(ta, 0), min(tb, 0)
    return (oa + ta * da + ob + tb * db) * 0.5, denom


def spiral_path(poses_llff, bounds, n_views=120, n_rots=2, zrate=0.5):
    """LLFF forward-facing spiral (data_utils/llff.py:44-94 equivalent)."""
    # to [right up back]-ish working frame
    poses = np.concatenate(
        [poses_llff[..., 1:2], -poses_llff[..., 0:1], poses_llff[..., 2:4]],
        axis=-1,
    )
    center = poses[:, :3, 3].mean(0)
    fwd = normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    c2w_avg = view_matrix(fwd, up, center)

    # recenter
    hom = np.eye(4)
    hom[:3, :4] = c2w_avg
    inv = np.linalg.inv(hom)
    rec = np.einsum("ij,njk->nik", inv[:3, :4],
                    np.concatenate([poses[:, :3, :4],
                                    np.tile([[[0, 0, 0, 1]]],
                                            (len(poses), 1, 1))], axis=1))
    up_r = normalize(rec[:, :3, 1].sum(0))

    close, far = bounds.min() * 0.9, bounds.max() * 5.0
    dt = 0.75
    focal = 1.0 / ((1 - dt) / close + dt / far)
    rads = np.percentile(np.abs(rec[:, :3, 3]), 90, axis=0)
    rads = np.array(list(rads) + [1.0])

    out = []
    for theta in np.linspace(0, 2 * np.pi * n_rots, n_views + 1)[:-1]:
        c = np.array([np.cos(theta), -np.sin(theta),
                      -np.sin(theta * zrate), 1.0]) * rads
        c = c[:3]
        z = normalize(c - np.array([0, 0, -focal]))
        m = view_matrix(z, up_r, c)  # [3, 4] in recentered frame
        m4 = np.eye(4)
        m4[:3, :4] = m
        out.append((hom @ m4)[:3, :4])
    return np.stack(out)


def ellipse_path(poses_llff, n_views=120):
    """mip-360 PCA-aligned elliptical orbit (data_utils/nerf_360_v2.py
    equivalent, simplified): fit the camera centers' plane, orbit on the
    90th-percentile ellipse, look at the scene center."""
    poses = np.concatenate(
        [poses_llff[..., 1:2], -poses_llff[..., 0:1], poses_llff[..., 2:4]],
        axis=-1,
    )
    centers = poses[:, :3, 3]
    mean = centers.mean(0)
    _, _, vt = np.linalg.svd(centers - mean)
    # basis: first two principal dirs span the orbit plane
    b0, b1, bn = vt[0], vt[1], vt[2]
    up = poses[:, :3, 1].sum(0)
    if np.dot(bn, up) < 0:
        bn = -bn
    proj = (centers - mean) @ np.stack([b0, b1]).T
    r0, r1 = np.percentile(np.abs(proj), 90, axis=0)
    look = mean
    out = []
    for theta in np.linspace(0, 2 * np.pi, n_views + 1)[:-1]:
        c = mean + r0 * np.cos(theta) * b0 + r1 * np.sin(theta) * b1
        fwd = normalize(c - look)
        out.append(view_matrix(fwd, up, c))
    return np.stack(out)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("path", type=str)
    parser.add_argument("--images", type=str, default="images_8")
    parser.add_argument("--downscale", type=float, default=8)
    parser.add_argument("--hold", type=int, default=8)
    parser.add_argument("--datatype", type=str, required=True,
                        choices=["llff", "mip360", "blender"])
    opt = parser.parse_args()

    root = opt.path.rstrip("/") + "/"
    exts = (".png", ".jpg", ".jpeg")
    images = [f[len(root):] for f in sorted(
        glob.glob(os.path.join(root, opt.images, "*")))
        if f.lower().endswith(exts)]

    pb = np.load(os.path.join(root, "poses_bounds.npy"))
    N = pb.shape[0]
    assert N == len(images), (N, len(images))
    poses = pb[:, :15].reshape(-1, 3, 5)
    bounds = pb[:, -2:]
    H, W, fl = poses[0, :, -1]
    H, W, fl = H // opt.downscale, W // opt.downscale, fl / opt.downscale

    if opt.datatype == "llff":
        render_poses = spiral_path(poses, bounds)
    else:
        render_poses = ellipse_path(poses)
    # video poses get the same column flips applied below to the cameras
    render_poses = render_poses.copy()
    render_poses[:, :3, 1] *= -1
    render_poses[:, :3, 2] *= -1

    # LLFF [down right back] -> [right down back] (llff2nerf.py:110)
    cams = np.concatenate(
        [poses[..., 1:2], poses[..., 0:1], -poses[..., 2:3], poses[..., 3:4]],
        axis=-1,
    )
    allp = np.concatenate([cams, render_poses], axis=0)
    hom = np.tile(np.array([[[0, 0, 0, 1.0]]]), (len(allp), 1, 1))
    allp = np.concatenate([allp, hom], axis=1)

    # ngp alignment (llff2nerf.py:120-149)
    allp[:, 0:3, 1] *= -1
    allp[:, 0:3, 2] *= -1
    allp = allp[:, [1, 0, 2, 3], :]
    allp[:, 2, :] *= -1

    up = normalize(allp[:, 0:3, 1].sum(0))
    R = np.pad(rot_between(up, np.array([0, 0, 1.0])), [(0, 1), (0, 1)])
    R[-1, -1] = 1
    allp = R @ allp

    # center of attention + radius normalization
    totw, totp = 0.0, np.zeros(3)
    for i in range(N):
        for j in range(i + 1, N):
            p, w = ray_midpoint(allp[i, :3, 3], allp[i, :3, 2],
                                allp[j, :3, 3], allp[j, :3, 2])
            if w > 0.01:
                totp += p * w
                totw += w
    if totw > 0:
        allp[:, :3, 3] -= totp / totw
    avglen = np.linalg.norm(allp[:N, :3, 3], axis=-1).mean()
    allp[:, :3, 3] *= 4.0 / avglen

    test_ids = np.arange(N)[::opt.hold]
    train_ids = np.array([i for i in range(N) if i not in test_ids])

    def frames(ids, names=True):
        return [{"file_path": images[i] if names else "---",
                 "transform_matrix": allp[i].tolist()} for i in ids]

    def write(name, frs):
        out = {"w": W, "h": H, "fl_x": fl, "fl_y": fl, "cx": W // 2,
               "cy": H // 2, "aabb_scale": 2, "frames": frs}
        with open(os.path.join(root, name), "w") as f:
            json.dump(out, f, indent=2)
        print(f"[llff2nerf] wrote {len(frs)} frames to {name}")

    write("transforms_train.json", frames(train_ids))
    write("transforms_val.json", frames(test_ids)[::10])
    write("transforms_test.json", frames(test_ids))
    write("transforms_video.json", frames(np.arange(N, len(allp)),
                                          names=False))


if __name__ == "__main__":
    main()
