"""VGG-19/16 feature extractors in JAX (for style Gram losses, NPR feature
matching, and LPIPS).

Equivalent of the reference's torchvision-based feature stacks
(/root/reference/editing/style_network.py:64-68, semantic_encoder.py, and
the lpips package used by nerf/utils.py:296-330).

Weights: this environment has no network egress, so pretrained weights are
loaded from a local npz (set LAENERF_VGG19_NPZ / LAENERF_VGG16_NPZ or drop
files under ~/.cache/laenerf_tpu_weights/). Convert once from torchvision
with:

    import torchvision, numpy as np
    sd = torchvision.models.vgg19(weights="DEFAULT").features.state_dict()
    np.savez("vgg19_features.npz", **{k: v.numpy() for k, v in sd.items()})

Without weights, He-initialised random filters are used (deterministic
seed). Random VGG features still carry useful texture statistics for Gram
losses, but quality is degraded — a warning is emitted once.
"""

import math
import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np

# torchvision `features` layer indices: (out_channels or 'M' for maxpool)
VGG19_LAYOUT = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
VGG16_LAYOUT = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                512, 512, 512, "M", 512, 512, 512, "M"]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_WEIGHTS_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "laenerf_tpu_weights")


def _layer_indices(layout):
    """Map torchvision features indices -> (kind, conv#). Conv at i, ReLU at
    i+1, pools at their own index."""
    idx = []
    for c in layout:
        if c == "M":
            idx.append(("pool", None))
        else:
            idx.append(("conv", c))
            idx.append(("relu", None))
    return idx


def _load_npz(env_var, default_name):
    path = os.environ.get(env_var)
    if path is None:
        cand = os.path.join(_WEIGHTS_DIR, default_name)
        path = cand if os.path.exists(cand) else None
    if path and os.path.exists(path):
        return dict(np.load(path))
    return None


def vgg_init(arch: str = "vgg19", seed: int = 0):
    """Build (params, layers) for a VGG feature stack.

    params: list aligned with torchvision feature indices; conv entries are
    (w [kh,kw,cin,cout], b [cout]), others None.
    Returns (params, layer_kinds, pretrained: bool).
    """
    layout = VGG19_LAYOUT if arch == "vgg19" else VGG16_LAYOUT
    kinds = _layer_indices(layout)
    npz = _load_npz(f"LAENERF_{arch.upper()}_NPZ", f"{arch}_features.npz")
    pretrained = npz is not None
    if not pretrained:
        warnings.warn(
            f"No pretrained {arch} weights found; using random filters "
            f"(style/LPIPS quality degraded). See editing/vgg.py docstring.",
            stacklevel=2,
        )
    rng = np.random.RandomState(seed)
    params = []
    cin = 3
    for i, (kind, cout) in enumerate(kinds):
        if kind != "conv":
            params.append(None)
            continue
        if pretrained:
            w = npz[f"{i}.weight"]  # torch [cout, cin, kh, kw]
            b = npz[f"{i}.bias"]
            w = np.transpose(w, (2, 3, 1, 0))  # -> [kh, kw, cin, cout]
        else:
            fan_in = cin * 9
            std = math.sqrt(2.0 / fan_in)
            w = rng.normal(0, std, (3, 3, cin, cout)).astype(np.float32)
            b = np.zeros((cout,), np.float32)
        params.append((jnp.asarray(w), jnp.asarray(b)))
        cin = cout
    return params, kinds, pretrained


def vgg_features(params, kinds, x, out_layers):
    """Run the stack on x [B, 3, H, W] (torch NCHW convention, ImageNet
    normalized), returning activations at the torchvision feature indices
    in out_layers."""
    max_layer = max(out_layers)
    outs = []
    h = x
    for i, (kind, _) in enumerate(kinds):
        if i > max_layer:
            break
        if kind == "conv":
            w, b = params[i]
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "HWIO", "NCHW"),
            ) + b[None, :, None, None]
        elif kind == "relu":
            h = jnp.maximum(h, 0.0)
        else:  # maxpool 2x2 stride 2
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
        if i in out_layers:
            outs.append(h)
    return outs


def normalize_imagenet(img):
    """img [3, H, W] in [0,1] -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN)[:, None, None]
    std = jnp.asarray(IMAGENET_STD)[:, None, None]
    return (img - mean) / std


def lpips_fn():
    """Perceptual distance via VGG16 features.

    The reference uses lpips(alex) (nerf/utils.py:296-330). Without the
    LPIPS linear-head weights (no egress), this computes the standard
    unit-weight VGG-LPIPS variant: mean squared distance of channel-
    normalized features at the conv1_2..conv5_3-pre-pool layers. Requires
    pretrained VGG16 weights; raises otherwise so callers can degrade.
    """
    params, kinds, pretrained = vgg_init("vgg16")
    if not pretrained:
        raise RuntimeError("LPIPS requires local vgg16 weights")
    # (layer index, pools before it): relu1_2..relu5_3
    all_layers = ((3, 0), (8, 1), (15, 2), (22, 3), (29, 4))

    @jax.jit
    def dist(a, b):
        # a, b: [H, W, 3] in [0, 1]; drop layers whose pooled spatial size
        # would collapse below 2px for small patches (shape is static)
        size = min(a.shape[0], a.shape[1])
        layers = tuple(l for l, p in all_layers if size >> (p + 1) >= 1)

        def prep(x):
            x = jnp.moveaxis(x, -1, 0)
            return normalize_imagenet(x)[None]

        fa = vgg_features(params, kinds, prep(a), layers)
        fb = vgg_features(params, kinds, prep(b), layers)
        total = 0.0
        for xa, xb in zip(fa, fb):
            na = xa / jnp.maximum(jnp.linalg.norm(xa, axis=1, keepdims=True),
                                  1e-8)
            nb = xb / jnp.maximum(jnp.linalg.norm(xb, axis=1, keepdims=True),
                                  1e-8)
            total = total + jnp.mean(jnp.sum((na - nb) ** 2, axis=1))
        return total / len(layers)

    return dist
