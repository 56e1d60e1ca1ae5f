"""Procedural synthetic dataset generator.

The reference is exercised on nerf_synthetic/llff/mip360 data that is not
shipped with it; this module generates a miniature blender-format scene
(transforms_{train,val,test}.json + RGBA pngs) by volume-rendering an
analytic scene — colored constant-density spheres — with dense sampling.
It serves the integration tests and the benchmark as a stand-in for
nerf_synthetic/lego, exercising the same data pipeline
(blender splits, camera_angle_x intrinsics, alpha channel).
"""

import functools
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


def _texture(pts, rgb, freq, phase):
    """Procedural 3D color texture: base color modulated by a sinusoidal
    field (exercises the fine hash-grid levels the way lego's decals do)."""
    if freq <= 0:
        return np.broadcast_to(np.asarray(rgb, np.float32),
                               pts.shape[:-1] + (3,))
    mod = 0.5 + 0.5 * np.sin(
        2 * np.pi * freq * (pts[..., 0] + 0.7 * pts[..., 1]
                            + 0.41 * pts[..., 2]) + phase)
    out = np.asarray(rgb, np.float32) * (0.55 + 0.45 * mod[..., None])
    return out.astype(np.float32)


def lego_class_scene():
    """A 'lego-class' procedural scene: a textured base plate, a lattice of
    thin pillars, beams, and textured spheres — thin geometry plus
    high-frequency appearance, standing in for nerf_synthetic/lego (which
    is not shipped; this env has no network egress). Primitives:
    ('box', center, half_extents, rgb, sigma, freq, phase) and
    ('sphere', center, radius, rgb, sigma, freq, phase)."""
    prims = [
        ("box", (0.0, 0.0, -0.52), (0.62, 0.62, 0.05),
         (0.72, 0.65, 0.35), 200.0, 4.0, 0.0),
    ]
    # pillar lattice (thin structures ~0.035 world units)
    rng = np.random.RandomState(7)
    for ix in range(-2, 3):
        for iy in range(-2, 3):
            if (ix + iy) % 2 == 0:
                h = 0.18 + 0.22 * rng.rand()
                prims.append((
                    "box", (0.22 * ix, 0.22 * iy, -0.47 + h),
                    (0.035, 0.035, h),
                    (0.75, 0.25 + 0.1 * ((ix + 2) % 3), 0.2), 200.0,
                    6.0, 0.7 * ix + iy,
                ))
    # cross beams
    prims.append(("box", (0.0, 0.0, 0.1), (0.5, 0.04, 0.035),
                  (0.25, 0.45, 0.8), 200.0, 8.0, 1.1))
    prims.append(("box", (0.0, 0.0, 0.22), (0.04, 0.5, 0.035),
                  (0.3, 0.75, 0.3), 200.0, 8.0, 2.3))
    # textured hollow spheres on top (shells, so interiors prune from the
    # occupancy grid like lego's hollow geometry)
    prims.append(("shell", (0.25, -0.2, 0.33), 0.13, 0.045,
                  (0.9, 0.75, 0.2), 160.0, 10.0, 0.4))
    prims.append(("shell", (-0.28, 0.22, 0.4), 0.16, 0.045,
                  (0.35, 0.4, 0.85), 160.0, 9.0, 2.8))
    prims.append(("shell", (0.0, 0.0, 0.5), 0.1, 0.04,
                  (0.85, 0.3, 0.3), 160.0, 12.0, 1.9))
    return prims


def scene_density_color(pts, spheres=None):
    """Analytic scene: density + color at points [N, 3] (NumPy).

    Accepts the legacy sphere tuples (center, radius, rgb, sigma) or typed
    primitives from lego_class_scene()."""
    spheres = spheres or DEFAULT_SPHERES
    sigma = np.zeros(pts.shape[:-1], np.float32)
    color = np.zeros(pts.shape[:-1] + (3,), np.float32)
    for prim in spheres:
        if isinstance(prim[0], str):
            kind = prim[0]
            if kind == "sphere":
                _, center, radius, rgb, s, freq, phase = prim
                inside = np.sum((pts - np.array(center)) ** 2, -1) < radius ** 2
            elif kind == "shell":
                _, center, radius, th, rgb, s, freq, phase = prim
                r2 = np.sum((pts - np.array(center)) ** 2, -1)
                inside = (r2 < radius ** 2) & (r2 > (radius - th) ** 2)
            else:  # box
                _, center, half, rgb, s, freq, phase = prim
                d = np.abs(pts - np.array(center, np.float32))
                inside = np.all(d < np.array(half, np.float32), axis=-1)
        else:
            center, radius, rgb, s = prim
            freq, phase = 0.0, 0.0
            inside = np.sum((pts - np.array(center)) ** 2, -1) < radius ** 2
        new = inside & (sigma == 0)
        if np.any(new):
            tex = _texture(pts[new], rgb, freq, phase)
            color[new] = tex
        sigma = np.where(inside, np.maximum(sigma, s), sigma)
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


def _prim_arrays(spheres):
    """Group primitives into typed arrays for the vectorized JAX renderer.

    Returns a dict of numpy arrays; ordering preserves the first-hit color
    rule of scene_density_color (primitive list order)."""
    spheres = spheres or DEFAULT_SPHERES
    rows = []
    for order, prim in enumerate(spheres):
        if isinstance(prim[0], str):
            kind = prim[0]
            if kind == "sphere":
                _, center, radius, rgb, s, freq, phase = prim
                rows.append((0, center, (radius, 0, 0), rgb, s, freq, phase,
                             order))
            elif kind == "shell":
                _, center, radius, th, rgb, s, freq, phase = prim
                rows.append((1, center, (radius, th, 0), rgb, s, freq, phase,
                             order))
            else:
                _, center, half, rgb, s, freq, phase = prim
                rows.append((2, center, half, rgb, s, freq, phase, order))
        else:
            center, radius, rgb, s = prim
            rows.append((0, center, (radius, 0, 0), rgb, s, 0.0, 0.0,
                         order))
    out = {
        "kind": np.array([r[0] for r in rows], np.int32),
        "center": np.array([r[1] for r in rows], np.float32),
        "shape": np.array([r[2] for r in rows], np.float32),
        "rgb": np.array([r[3] for r in rows], np.float32),
        "sigma": np.array([r[4] for r in rows], np.float32),
        "freq": np.array([r[5] for r in rows], np.float32),
        "phase": np.array([r[6] for r in rows], np.float32),
    }
    return out


def _render_view(pose, H, W, focal, spheres, n_steps=384, aa: int = 1):
    """Dense ground-truth volume render of one view (vectorized JAX; runs
    on the default backend, so 800x800 views take seconds, not minutes).

    aa > 1 supersamples aa^2 jittered sub-pixel rays per pixel: the binary
    inside-tests otherwise produce stairstep silhouettes that cap the
    reconstructible PSNR of models trained on the data."""
    if aa > 1:
        img = None
        acc = None
        offs = (np.arange(aa) + 0.5) / aa - 0.5
        for oy in offs:
            for ox in offs:
                im, ac = _render_view_offset(pose, H, W, focal, spheres,
                                             n_steps, ox, oy)
                img = im if img is None else img + im
                acc = ac if acc is None else acc + ac
        return img / aa ** 2, acc / aa ** 2
    return _render_view_offset(pose, H, W, focal, spheres, n_steps, 0.0, 0.0)


def _render_chunk_jit():
    """Module-level jitted GT ray renderer. A per-view closure would
    recompile (or at best reload the persistent cache) for EVERY view and
    aa offset — at 800^2 on the tunneled TPU that turned scene generation
    into hours (r4 session). One compile per (chunk shape, n_steps)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("dt",))
    def render_chunk(pa, origin, d, ts, dt):
        def eval_scene(pts):
            # pts [B, 3]; per-prim membership [B, P]
            rel = pts[:, None, :] - pa["center"][None]  # [B, P, 3]
            r2 = jnp.sum(rel * rel, -1)
            rad = pa["shape"][:, 0][None]
            th = pa["shape"][:, 1][None]
            in_sphere = r2 < rad ** 2
            in_shell = in_sphere & (r2 > (rad - th) ** 2)
            in_box = jnp.all(jnp.abs(rel) < pa["shape"][None], axis=-1)
            kind = pa["kind"][None]
            inside = jnp.where(kind == 0, in_sphere,
                               jnp.where(kind == 1, in_shell, in_box))
            # first-hit color: pick the lowest-index prim containing the pt
            first = jnp.argmax(inside, axis=1)  # [B]
            any_in = jnp.any(inside, axis=1)
            sigma = jnp.max(jnp.where(inside, pa["sigma"][None], 0.0), 1)
            c = jnp.take(pa["rgb"], first, axis=0)
            fr = jnp.take(pa["freq"], first)
            ph = jnp.take(pa["phase"], first)
            mod = 0.5 + 0.5 * jnp.sin(
                2 * jnp.pi * fr * (pts[:, 0] + 0.7 * pts[:, 1]
                                   + 0.41 * pts[:, 2]) + ph)
            tex = c * (0.55 + 0.45 * mod[:, None])
            color = jnp.where((fr > 0)[:, None], tex, c)
            color = jnp.where(any_in[:, None], color, 0.0)
            return sigma, color

        def step(carry, t):
            T, img, acc = carry
            pts = origin[None] + t * d
            sigma, color = eval_scene(pts)
            a = 1.0 - jnp.exp(-sigma * dt)
            w = a * T
            img = img + w[:, None] * color
            acc = acc + w
            return (T * (1.0 - a), img, acc), None

        B = d.shape[0]
        init = (jnp.ones((B,)), jnp.zeros((B, 3)), jnp.zeros((B,)))
        (T, img, acc), _ = jax.lax.scan(step, init, ts)
        return img, acc

    return render_chunk


_RENDER_CHUNK = None


def _render_view_offset(pose, H, W, focal, spheres, n_steps, ox, oy):
    import jax.numpy as jnp

    global _RENDER_CHUNK
    if _RENDER_CHUNK is None:
        _RENDER_CHUNK = _render_chunk_jit()

    pa = {k: jnp.asarray(v) for k, v in _prim_arrays(spheres).items()}

    i, j = np.meshgrid(np.arange(W) + 0.5 + ox, np.arange(H) + 0.5 + oy,
                       indexing="xy")
    dirs_cam = np.stack(
        [(i - W / 2) / focal, -(j - H / 2) / focal, -np.ones_like(i)], -1
    )
    dirs = dirs_cam @ pose[:3, :3].T
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs.reshape(-1, 3), jnp.float32)
    origin = jnp.asarray(pose[:3, 3], jnp.float32)

    ts = jnp.linspace(1.0, 7.0, n_steps, dtype=jnp.float32)
    dt = float((7.0 - 1.0) / (n_steps - 1))

    n = H * W
    chunk = 1 << 16
    # pad the ray count to a chunk multiple: ONE compiled shape for every
    # (H, W) instead of a fresh ragged-tail compile per resolution
    n_pad = ((n + chunk - 1) // chunk) * chunk
    dirs = jnp.concatenate(
        [dirs, jnp.zeros((n_pad - n, 3), jnp.float32)]) if n_pad > n else dirs
    imgs, accs = [], []
    for s in range(0, n_pad, chunk):
        im, ac = _RENDER_CHUNK(pa, origin, dirs[s:s + chunk], ts, dt)
        imgs.append(im)
        accs.append(ac)
    img = np.asarray(jnp.concatenate(imgs))[:n].reshape(H, W, 3)
    acc = np.asarray(jnp.concatenate(accs))[:n].reshape(H, W)
    return img, acc


def generate_synthetic_scene(out_dir, n_train=20, n_val=2, n_test=3, H=100,
                             W=100, radius=3.5, camera_angle_x=0.8,
                             spheres=None, seed=0, aa: int = 1):
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
            img, alpha = _render_view(pose, H, W, focal, spheres, aa=aa)
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
