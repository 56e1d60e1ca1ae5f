#!/usr/bin/env python
"""Convert a COLMAP text export to transforms.json.

Equivalent of the reference's scripts/colmap2nerf.py: parses
cameras.txt/images.txt, computes per-image sharpness (variance of
Laplacian), converts COLMAP world2cam quaternions to cam2world, applies the
instant-ngp alignment (up -> +z, center of attention, radius 4), and writes
a single transforms.json (colmap mode: the loader splits val = frame 0,
provider.py:168-175).
"""

import argparse
import json
import math
import os

import numpy as np

from llff2nerf import normalize, ray_midpoint, rot_between

try:
    import imageio.v2 as imageio
except ImportError:
    import imageio


def qvec2rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
    ])


def sharpness(path):
    img = np.asarray(imageio.imread(path), np.float32)
    if img.ndim == 3:
        img = img[..., :3].mean(-1)
    lap = (-4 * img[1:-1, 1:-1] + img[:-2, 1:-1] + img[2:, 1:-1]
           + img[1:-1, :-2] + img[1:-1, 2:])
    return float(lap.var())


def parse_cameras(path):
    cams = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            el = line.split()
            cam_id, model = int(el[0]), el[1]
            w, h = float(el[2]), float(el[3])
            p = [float(v) for v in el[4:]]
            if model == "SIMPLE_PINHOLE":
                fx = fy = p[0]
                cx, cy = p[1], p[2]
            elif model in ("PINHOLE", "OPENCV", "SIMPLE_RADIAL", "RADIAL"):
                if model == "PINHOLE" or model == "OPENCV":
                    fx, fy, cx, cy = p[0], p[1], p[2], p[3]
                else:
                    fx = fy = p[0]
                    cx, cy = p[1], p[2]
            else:
                raise ValueError(f"unsupported camera model {model}")
            cams[cam_id] = dict(w=w, h=h, fl_x=fx, fl_y=fy, cx=cx, cy=cy)
    return cams


def parse_images(path):
    out = []
    with open(path) as f:
        lines = [l for l in f if not l.startswith("#") and l.strip()]
    for line in lines[::2]:  # every other line is 2D points
        el = line.split()
        q = np.array([float(v) for v in el[1:5]])
        t = np.array([float(v) for v in el[5:8]])
        cam_id = int(el[8])
        name = "_".join(el[9:])
        out.append((name, q, t, cam_id))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text", type=str, default="colmap_text",
                   help="directory with cameras.txt/images.txt")
    p.add_argument("--images", type=str, default="images")
    p.add_argument("--out", type=str, default="transforms.json")
    p.add_argument("--aabb_scale", type=int, default=2)
    p.add_argument("--skip_sharpness", action="store_true")
    a = p.parse_args()

    cams = parse_cameras(os.path.join(a.text, "cameras.txt"))
    images = parse_images(os.path.join(a.text, "images.txt"))
    cam = cams[images[0][3]]
    angle_x = math.atan(cam["w"] / (cam["fl_x"] * 2)) * 2

    frames = []
    for name, q, t, cam_id in images:
        path = os.path.join(a.images, name)
        R = qvec2rotmat(q)  # world2cam
        c2w = np.eye(4)
        c2w[:3, :3] = R.T
        c2w[:3, 3] = -R.T @ t
        # colmap convention -> nerf convention: flip y/z camera axes
        c2w[0:3, 1] *= -1
        c2w[0:3, 2] *= -1
        frame = {"file_path": path, "transform_matrix": c2w}
        if not a.skip_sharpness and os.path.exists(path):
            frame["sharpness"] = sharpness(path)
        frames.append(frame)

    poses = np.stack([f["transform_matrix"] for f in frames])
    # ngp world alignment (same as llff2nerf / colmap2nerf reference)
    poses = poses[:, [1, 0, 2, 3], :]
    poses[:, 2, :] *= -1
    up = normalize(poses[:, 0:3, 1].sum(0))
    R = np.pad(rot_between(up, np.array([0, 0, 1.0])), [(0, 1), (0, 1)])
    R[-1, -1] = 1
    poses = R @ poses

    totw, totp = 0.0, np.zeros(3)
    N = len(poses)
    for i in range(N):
        for j in range(i + 1, N):
            pt, w = ray_midpoint(poses[i, :3, 3], poses[i, :3, 2],
                                 poses[j, :3, 3], poses[j, :3, 2])
            if w > 0.01:
                totp += pt * w
                totw += w
    if totw > 0:
        poses[:, :3, 3] -= totp / totw
    avglen = np.linalg.norm(poses[:, :3, 3], axis=-1).mean()
    poses[:, :3, 3] *= 4.0 / avglen

    for f, m in zip(frames, poses):
        f["transform_matrix"] = m.tolist()

    out = {
        "camera_angle_x": angle_x,
        "fl_x": cam["fl_x"], "fl_y": cam["fl_y"],
        "cx": cam["cx"], "cy": cam["cy"],
        "w": cam["w"], "h": cam["h"],
        "aabb_scale": a.aabb_scale,
        "frames": frames,
    }
    with open(a.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[colmap2nerf] wrote {len(frames)} frames to {a.out}")


if __name__ == "__main__":
    main()
