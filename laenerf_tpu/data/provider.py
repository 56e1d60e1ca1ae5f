"""Dataset loading and host-side ray sampling.

TPU-native equivalent of the reference's NeRFDataset
(/root/reference/nerf/provider.py:94-352): auto-detects colmap
(transforms.json; val = frame 0, test = slerp between two random poses) vs
blender (transforms_{split}.json) layouts, applies the ngp pose convention
(axis swap + scale/offset, provider.py:19-27), loads images (+optional
*_mask.png), derives intrinsics from fl_x / camera_angle_x, and keeps a
128x128 error map per image for importance sampling.

Design: the loader is plain host-side NumPy (imageio instead of cv2); each
batch it emits is a dict of fixed-shape arrays (pose, pixel indices, target
pixels) so the jitted train step never sees dynamic shapes. Pixel index
sampling (uniform / error-map multinomial / patch) happens here on host.
"""

import glob
import json
import os
from typing import Optional

import numpy as np

try:
    import imageio.v2 as imageio
except ImportError:  # pragma: no cover
    import imageio


def nerf_matrix_to_ngp(pose, scale=0.33, offset=(0, 0, 0)):
    """NeRF (blender) cam2world -> instant-ngp convention (provider.py:19-27):
    cycle axes (y,z,x), flip y/z columns, scale + offset the origin."""
    return np.array(
        [
            [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3] * scale + offset[0]],
            [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3] * scale + offset[1]],
            [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3] * scale + offset[2]],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )


def _slerp(r0, r1, t):
    """Quaternion slerp between two rotation matrices."""
    from scipy.spatial.transform import Rotation, Slerp

    rots = Rotation.from_matrix(np.stack([r0, r1]))
    return Slerp([0, 1], rots)(t).as_matrix()


def rand_poses(n, rng, radius=1.0, theta_range=(np.pi / 3, 2 * np.pi / 3),
               phi_range=(0, 2 * np.pi)):
    """Random orbit-camera poses (provider.py:57-91), used by CLIP-guided
    training and pose augmentation. Returns [n, 4, 4] cam2world."""
    thetas = rng.uniform(*theta_range, n)
    phis = rng.uniform(*phi_range, n)
    centers = np.stack([
        radius * np.sin(thetas) * np.sin(phis),
        radius * np.cos(thetas),
        radius * np.sin(thetas) * np.cos(phis),
    ], axis=-1)
    fwd = -centers / (np.linalg.norm(centers, axis=-1, keepdims=True) + 1e-10)
    up = np.tile(np.array([0.0, -1.0, 0.0]), (n, 1))
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right, axis=-1, keepdims=True) + 1e-10
    up = np.cross(right, fwd)
    up /= np.linalg.norm(up, axis=-1, keepdims=True) + 1e-10
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, :3, :3] = np.stack([right, up, fwd], axis=-1)
    poses[:, :3, 3] = centers
    return poses


class NeRFDataset:
    """Loads a NeRF dataset and serves ray batches.

    Args mirror the reference's opt fields used by the loader.
    """

    def __init__(self, path: str, split: str = "train", downscale: int = 1,
                 scale: float = 0.33, offset=(0, 0, 0), num_rays: int = 4096,
                 error_map: bool = False, patch_size: int = 1,
                 n_test: int = 10, seed: int = 0, color_space: str = "srgb"):
        self.root_path = path
        self.split = split
        self.downscale = downscale
        self.scale = scale
        self.offset = tuple(offset)
        self.color_space = color_space
        self.training = split in ("train", "all", "trainval")
        self.num_rays = num_rays if self.training else -1
        self.patch_size = patch_size
        self.rng = np.random.RandomState(seed)

        if os.path.exists(os.path.join(path, "transforms.json")):
            self.mode = "colmap"
        elif os.path.exists(os.path.join(path, "transforms_train.json")):
            self.mode = "blender"
        else:
            raise FileNotFoundError(
                f"no transforms*.json under {path}"
            )

        transform = self._load_transform(split)

        if "h" in transform and "w" in transform:
            self.H = int(transform["h"]) // downscale
            self.W = int(transform["w"]) // downscale
        else:
            self.H = self.W = None

        frames = transform["frames"]

        self.poses = []
        self.images = []
        self.masks = []
        self.depths = []  # filled by distillation (depth supervision)

        if self.mode == "colmap" and split == "test":
            # interpolate a test trajectory between two random poses
            # (provider.py:168-184)
            f0, f1 = self.rng.choice(frames, 2, replace=False)
            p0 = nerf_matrix_to_ngp(np.array(f0["transform_matrix"],
                                             np.float32), self.scale,
                                    self.offset)
            p1 = nerf_matrix_to_ngp(np.array(f1["transform_matrix"],
                                             np.float32), self.scale,
                                    self.offset)
            for i in range(n_test + 1):
                ratio = np.sin(((i / n_test) - 0.5) * np.pi) * 0.5 + 0.5
                pose = np.eye(4, dtype=np.float32)
                pose[:3, :3] = _slerp(p0[:3, :3], p1[:3, :3], ratio)
                pose[:3, 3] = (1 - ratio) * p0[:3, 3] + ratio * p1[:3, 3]
                self.poses.append(pose)
            self.images = None
        else:
            if self.mode == "colmap":
                if split == "train":
                    frames = frames[1:]
                elif split == "val":
                    frames = frames[:1]
            for f in frames:
                f_path = os.path.join(path, f["file_path"])
                if self.mode == "blender" and "." not in os.path.basename(f_path):
                    f_path += ".png"
                if not os.path.exists(f_path) and split != "video":
                    continue
                pose = nerf_matrix_to_ngp(
                    np.array(f["transform_matrix"], np.float32), self.scale,
                    self.offset,
                )
                if split == "video":
                    self.poses.append(pose)
                    continue
                image = np.asarray(imageio.imread(f_path))
                if self.H is None:
                    self.H = image.shape[0] // downscale
                    self.W = image.shape[1] // downscale
                if image.shape[0] != self.H or image.shape[1] != self.W:
                    image = _resize(image, self.H, self.W)
                image = image.astype(np.float32) / 255.0
                mask_path = f_path[: f_path.find(".")] + "_mask.png"
                if os.path.exists(mask_path):
                    mask = np.asarray(imageio.imread(mask_path))
                    if mask.shape[:2] != (self.H, self.W):
                        mask = _resize(mask, self.H, self.W)
                    self.masks.append(mask)
                else:
                    self.masks.append(None)
                self.poses.append(pose)
                self.images.append(image)
            if split == "video":
                self.images = None

        # the video split skips image loading; read one frame (if any
        # exists) to recover H/W for intrinsics derived from camera_angle
        if self.H is None:
            for f in frames:
                f_path = os.path.join(path, f["file_path"])
                if self.mode == "blender" and "." not in os.path.basename(f_path):
                    f_path += ".png"
                if os.path.exists(f_path):
                    img = np.asarray(imageio.imread(f_path))
                    self.H = img.shape[0] // downscale
                    self.W = img.shape[1] // downscale
                    break

        self.poses = np.stack(self.poses, axis=0)
        if self.images is not None and len(self.images) > 0:
            self.images = np.stack(self.images, axis=0)  # [B, H, W, C]
            if color_space == "linear":
                # the reference converts GT pixels per step
                # (nerf/utils.py:563); converting once at load time is
                # equivalent since images are only ever used as GT. Alpha
                # (if present) stays untouched.
                from ..utils.color import srgb_to_linear

                self.images[..., :3] = np.asarray(
                    srgb_to_linear(self.images[..., :3]))
        self.radius = float(np.linalg.norm(self.poses[:, :3, 3], axis=-1).mean())

        # error map for importance sampling (provider.py:251-255)
        if self.training and error_map and self.images is not None:
            self.error_map = np.ones(
                (self.images.shape[0], 128 * 128), np.float32
            )
        else:
            self.error_map = None

        self.intrinsics = self._load_intrinsics(transform)

    # ------------------------------------------------------------------

    def _load_transform(self, split):
        if self.mode == "colmap":
            with open(os.path.join(self.root_path, "transforms.json")) as f:
                return json.load(f)
        if split == "all":
            transform = None
            for p in sorted(glob.glob(os.path.join(self.root_path, "*.json"))):
                with open(p) as f:
                    t = json.load(f)
                if transform is None:
                    transform = t
                else:
                    transform["frames"].extend(t["frames"])
            return transform
        if split == "trainval":
            with open(os.path.join(self.root_path, "transforms_train.json")) as f:
                transform = json.load(f)
            with open(os.path.join(self.root_path, "transforms_val.json")) as f:
                transform["frames"].extend(json.load(f)["frames"])
            return transform
        name = {"video": "test"}.get(split, split)
        p = os.path.join(self.root_path, f"transforms_{name}.json")
        if split == "video" and os.path.exists(
            os.path.join(self.root_path, "transforms_video.json")
        ):
            p = os.path.join(self.root_path, "transforms_video.json")
        with open(p) as f:
            return json.load(f)

    def _load_intrinsics(self, transform):
        d = self.downscale
        if "fl_x" in transform or "fl_y" in transform:
            fl_x = transform.get("fl_x", transform.get("fl_y")) / d
            fl_y = transform.get("fl_y", transform.get("fl_x")) / d
        elif "camera_angle_x" in transform or "camera_angle_y" in transform:
            fl_x = fl_y = None
            if "camera_angle_x" in transform:
                fl_x = self.W / (2 * np.tan(transform["camera_angle_x"] / 2))
            if "camera_angle_y" in transform:
                fl_y = self.H / (2 * np.tan(transform["camera_angle_y"] / 2))
            fl_x = fl_x if fl_x is not None else fl_y
            fl_y = fl_y if fl_y is not None else fl_x
        else:
            raise RuntimeError("no focal length in transforms.json")
        cx = transform.get("cx", self.W * d / 2) / d
        cy = transform.get("cy", self.H * d / 2) / d
        return np.array([fl_x, fl_y, cx, cy], np.float32)

    # ------------------------------------------------------------------

    def __len__(self):
        return len(self.poses)

    @property
    def has_gt(self):
        return self.images is not None

    def sample_pixel_inds(self, index: int):
        """Pick num_rays pixel indices for one view (uniform / error-map /
        patch; mirrors utils.py:84-127). Returns (inds, inds_coarse|None)."""
        H, W, N = self.H, self.W, self.num_rays
        if self.patch_size > 1:
            num_patch = N // (self.patch_size ** 2)
            ix = self.rng.randint(0, H - self.patch_size, num_patch)
            iy = self.rng.randint(0, W - self.patch_size, num_patch)
            px, py = np.meshgrid(np.arange(self.patch_size),
                                 np.arange(self.patch_size), indexing="ij")
            gx = (ix[:, None] + px.reshape(-1)[None, :]).reshape(-1)
            gy = (iy[:, None] + py.reshape(-1)[None, :]).reshape(-1)
            return (gx * W + gy).astype(np.int32), None
        if self.error_map is None:
            return self.rng.randint(0, H * W, N).astype(np.int32), None
        em = self.error_map[index]
        p = em / em.sum()
        inds_coarse = self.rng.choice(128 * 128, N, replace=False, p=p)
        ix, iy = inds_coarse // 128, inds_coarse % 128
        sx, sy = H / 128, W / 128
        ix = np.clip((ix * sx + self.rng.rand(N) * sx).astype(np.int64), 0, H - 1)
        iy = np.clip((iy * sy + self.rng.rand(N) * sy).astype(np.int64), 0, W - 1)
        return (ix * W + iy).astype(np.int32), inds_coarse.astype(np.int32)

    def get_batch(self, index: int):
        """One training batch for view `index` as host numpy arrays."""
        inds, inds_coarse = self.sample_pixel_inds(index)
        batch = {
            "pose": self.poses[index],
            "intrinsics": self.intrinsics,
            "inds": inds,
            "index": index,
            "H": self.H,
            "W": self.W,
        }
        if self.images is not None:
            flat = self.images[index].reshape(-1, self.images.shape[-1])
            batch["pixels"] = flat[inds]
        if inds_coarse is not None:
            batch["inds_coarse"] = inds_coarse
        # distillation depth supervision targets (filled by
        # editing.distill.distill_dataset; utils.py:586-589 equivalent)
        if len(self.depths) > 0:
            batch["depth"] = np.asarray(self.depths[index])[inds]
        return batch

    def update_error_map(self, index: int, inds_coarse, errors):
        """EMA error-map update (utils.py:609-631 equivalent)."""
        if self.error_map is None:
            return
        em = self.error_map[index]
        em[inds_coarse] = 0.1 * em[inds_coarse] + 0.9 * errors
        self.error_map[index] = em

    def epoch_indices(self, shuffle: Optional[bool] = None):
        n = len(self.poses)
        idx = np.arange(n)
        if shuffle if shuffle is not None else self.training:
            self.rng.shuffle(idx)
        return idx


def _resize(img, H, W):
    """Area-ish resize without cv2: PIL fallback."""
    from PIL import Image

    mode = None
    arr = img
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    out = Image.fromarray(arr, mode).resize((W, H), Image.LANCZOS)
    return np.asarray(out)
