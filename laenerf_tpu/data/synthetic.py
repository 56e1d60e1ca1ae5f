"""Procedural synthetic dataset generator.

The reference is exercised on nerf_synthetic/llff/mip360 data that is not
shipped with it; this module generates a miniature blender-format scene
(transforms_{train,val,test}.json + RGBA pngs) by volume-rendering an
analytic scene — colored constant-density spheres — with dense sampling.
It serves the integration tests and the benchmark as a stand-in for
nerf_synthetic/lego, exercising the same data pipeline
(blender splits, camera_angle_x intrinsics, alpha channel).
"""

import json
import os

import numpy as np

try:
    import imageio.v2 as imageio
except ImportError:  # pragma: no cover
    import imageio

# (center, radius, rgb, sigma)
DEFAULT_SPHERES = [
    ((0.0, 0.0, 0.0), 0.42, (0.85, 0.25, 0.2), 60.0),
    ((0.45, 0.3, 0.1), 0.22, (0.2, 0.7, 0.3), 60.0),
    ((-0.4, -0.25, 0.25), 0.18, (0.25, 0.35, 0.9), 60.0),
    ((0.1, -0.45, -0.35), 0.15, (0.9, 0.8, 0.2), 60.0),
]


def scene_density_color(pts, spheres=None):
    """Analytic scene: density + color at points [N, 3] (NumPy)."""
    spheres = spheres or DEFAULT_SPHERES
    sigma = np.zeros(pts.shape[:-1], np.float32)
    color = np.zeros(pts.shape[:-1] + (3,), np.float32)
    for center, radius, rgb, s in spheres:
        inside = np.sum((pts - np.array(center)) ** 2, -1) < radius ** 2
        new = inside & (sigma == 0)
        sigma = np.where(inside, np.maximum(sigma, s), sigma)
        color[new] = rgb
    return sigma, color


def _look_at_pose(eye, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)):
    """Blender-convention cam2world (camera looks along -z)."""
    eye = np.asarray(eye, np.float32)
    f = np.asarray(target, np.float32) - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, np.asarray(up, np.float32))
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0] = r
    pose[:3, 1] = u
    pose[:3, 2] = -f
    pose[:3, 3] = eye
    return pose


def _render_view(pose, H, W, focal, spheres, n_steps=384):
    """Dense ground-truth volume render of one view (NumPy, blender coords)."""
    i, j = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5, indexing="xy")
    dirs_cam = np.stack(
        [(i - W / 2) / focal, -(j - H / 2) / focal, -np.ones_like(i)], -1
    )
    dirs = dirs_cam @ pose[:3, :3].T
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    origin = pose[:3, 3]

    t = np.linspace(1.0, 7.0, n_steps, dtype=np.float32)
    dt = float(t[1] - t[0])
    img = np.zeros((H, W, 3), np.float32)
    alpha_acc = np.zeros((H, W), np.float32)
    T = np.ones((H, W), np.float32)
    for k in range(n_steps):
        pts = origin + t[k] * dirs
        sigma, color = scene_density_color(pts.reshape(-1, 3), spheres)
        sigma = sigma.reshape(H, W)
        color = color.reshape(H, W, 3)
        a = 1.0 - np.exp(-sigma * dt)
        w = a * T
        img += w[..., None] * color
        alpha_acc += w
        T *= 1.0 - a
        if T.max() < 1e-4:
            break
    return img, alpha_acc


def generate_synthetic_scene(out_dir, n_train=20, n_val=2, n_test=3, H=100,
                             W=100, radius=3.5, camera_angle_x=0.8,
                             spheres=None, seed=0):
    """Write a blender-format scene under out_dir. Returns out_dir."""
    spheres = spheres or DEFAULT_SPHERES
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    focal = W / (2 * np.tan(camera_angle_x / 2))

    def make_split(name, n, start=0.0):
        frames = []
        os.makedirs(os.path.join(out_dir, name), exist_ok=True)
        for k in range(n):
            phi = 2 * np.pi * (k / n) + start
            theta = 0.7 + 0.5 * rng.rand()
            eye = (
                radius * np.sin(theta) * np.cos(phi),
                radius * np.sin(theta) * np.sin(phi),
                radius * np.cos(theta),
            )
            pose = _look_at_pose(eye)
            img, alpha = _render_view(pose, H, W, focal, spheres)
            rgba = np.concatenate([img, alpha[..., None]], -1)
            rgba = (np.clip(rgba, 0, 1) * 255).astype(np.uint8)
            rel = f"{name}/r_{k}.png"
            imageio.imwrite(os.path.join(out_dir, rel), rgba)
            frames.append({
                "file_path": f"./{name}/r_{k}",
                "transform_matrix": pose.tolist(),
            })
        with open(os.path.join(out_dir, f"transforms_{name}.json"), "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)

    make_split("train", n_train)
    make_split("val", n_val, start=0.3)
    make_split("test", n_test, start=0.15)
    return out_dir
