"""CLIP ViT-B/16 vision tower in JAX — differentiable text-image guidance.

TPU-native equivalent of the reference's CLIP guidance
(/root/reference/nerf/clip_utils.py:11-59), which backprops
-(image_z . text_z) into NeRF parameters during --rand_pose training
(/root/reference/nerf/utils.py:543-557). The reference calls the frozen
torch CLIP inside the autograd graph; here the vision tower is a plain JAX
function so the similarity gradient flows through jit/grad on TPU.

Weights: no network egress here, so pretrained weights load from a local
npz (set LAENERF_CLIP_NPZ or drop clip_vitb16_vision.npz under
~/.cache/laenerf_tpu_weights/). Convert once from HuggingFace with:

    import numpy as np
    from transformers import CLIPModel
    m = CLIPModel.from_pretrained("openai/clip-vit-base-patch16")
    sd = {k: v.numpy() for k, v in m.vision_model.state_dict().items()}
    sd["visual_projection.weight"] = \
        m.visual_projection.weight.detach().numpy()
    np.savez("clip_vitb16_vision.npz", **sd)

Without weights a deterministic random init is used (gradient plumbing and
tests work; guidance quality is meaningless — a warning is emitted once).

Architecture (ViT-B/16 vision): 16x16 patch embed -> 768, class token,
learned positions (197), pre-LN, 12 pre-norm transformer blocks
(12-head attention, 3072 quickGELU MLP), post-LN on the class token,
linear projection to the 512-dim joint space.
"""

import os
import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

IMAGE_SIZE = 224
PATCH = 16
WIDTH = 768
LAYERS = 12
HEADS = 12
MLP_DIM = 3072
EMBED_DIM = 512
N_TOKENS = (IMAGE_SIZE // PATCH) ** 2 + 1  # 197

# OpenAI CLIP preprocessing constants (clip_utils.py:24-26)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

_WEIGHTS_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "laenerf_tpu_weights")
_warned = False


def clip_vision_init(key=None, seed: int = 0):
    """Deterministic random-init parameter pytree (synthetic-weights mode).

    Per-block weights are stacked on a leading [LAYERS] axis so the
    transformer runs as one lax.scan (compiles once, not 12 times).
    """
    if key is None:
        key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    s = 1.0 / np.sqrt(WIDTH)

    def rn(k, shape, scale):
        return (jax.random.normal(k, shape, jnp.float32) * scale)

    return {
        "patch_w": rn(ks[0], (PATCH * PATCH * 3, WIDTH), 0.02),
        "class_emb": rn(ks[1], (WIDTH,), 0.02),
        "pos_emb": rn(ks[2], (N_TOKENS, WIDTH), 0.01),
        "ln_pre": {"w": jnp.ones((WIDTH,)), "b": jnp.zeros((WIDTH,))},
        "blocks": {
            "ln1_w": jnp.ones((LAYERS, WIDTH)),
            "ln1_b": jnp.zeros((LAYERS, WIDTH)),
            "qkv_w": rn(ks[3], (LAYERS, WIDTH, 3 * WIDTH), s),
            "qkv_b": jnp.zeros((LAYERS, 3 * WIDTH)),
            "out_w": rn(ks[4], (LAYERS, WIDTH, WIDTH), s),
            "out_b": jnp.zeros((LAYERS, WIDTH)),
            "ln2_w": jnp.ones((LAYERS, WIDTH)),
            "ln2_b": jnp.zeros((LAYERS, WIDTH)),
            "fc1_w": rn(ks[5], (LAYERS, WIDTH, MLP_DIM), s),
            "fc1_b": jnp.zeros((LAYERS, MLP_DIM)),
            "fc2_w": rn(ks[6], (LAYERS, MLP_DIM, WIDTH),
                        1.0 / np.sqrt(MLP_DIM)),
            "fc2_b": jnp.zeros((LAYERS, WIDTH)),
        },
        "ln_post": {"w": jnp.ones((WIDTH,)), "b": jnp.zeros((WIDTH,))},
        "proj": rn(ks[7], (WIDTH, EMBED_DIM), s),
    }


def load_clip_vision():
    """(params, pretrained). Loads the local npz when present, else the
    deterministic random init (warns once)."""
    global _warned
    path = os.environ.get("LAENERF_CLIP_NPZ")
    if path is None:
        cand = os.path.join(_WEIGHTS_DIR, "clip_vitb16_vision.npz")
        path = cand if os.path.exists(cand) else None
    if path and os.path.exists(path):
        return _params_from_hf_npz(dict(np.load(path))), True
    if not _warned:
        warnings.warn("No pretrained CLIP weights found; using random "
                      "init (guidance semantics meaningless). See "
                      "models/clip_vit.py docstring for the converter.")
        _warned = True
    return clip_vision_init(), False


def _params_from_hf_npz(sd):
    """Map HuggingFace CLIPVisionModel state-dict keys to our pytree."""
    def g(k):
        return jnp.asarray(sd[k])

    blocks = {k: [] for k in ("ln1_w", "ln1_b", "qkv_w", "qkv_b", "out_w",
                              "out_b", "ln2_w", "ln2_b", "fc1_w", "fc1_b",
                              "fc2_w", "fc2_b")}
    for i in range(LAYERS):
        p = f"encoder.layers.{i}."
        blocks["ln1_w"].append(g(p + "layer_norm1.weight"))
        blocks["ln1_b"].append(g(p + "layer_norm1.bias"))
        # torch Linear stores [out, in]; our matmuls are x @ w ([in, out])
        qw = jnp.concatenate(
            [g(p + f"self_attn.{n}_proj.weight").T for n in "qkv"], axis=1)
        qb = jnp.concatenate(
            [g(p + f"self_attn.{n}_proj.bias") for n in "qkv"], axis=0)
        blocks["qkv_w"].append(qw)
        blocks["qkv_b"].append(qb)
        blocks["out_w"].append(g(p + "self_attn.out_proj.weight").T)
        blocks["out_b"].append(g(p + "self_attn.out_proj.bias"))
        blocks["ln2_w"].append(g(p + "layer_norm2.weight"))
        blocks["ln2_b"].append(g(p + "layer_norm2.bias"))
        blocks["fc1_w"].append(g(p + "mlp.fc1.weight").T)
        blocks["fc1_b"].append(g(p + "mlp.fc1.bias"))
        blocks["fc2_w"].append(g(p + "mlp.fc2.weight").T)
        blocks["fc2_b"].append(g(p + "mlp.fc2.bias"))
    # conv weight [768, 3, 16, 16] -> flat patch matmul ordered (ph, pw, c)
    pw = g("embeddings.patch_embedding.weight")
    pw = jnp.transpose(pw, (2, 3, 1, 0)).reshape(PATCH * PATCH * 3, WIDTH)
    return {
        "patch_w": pw,
        "class_emb": g("embeddings.class_embedding").reshape(WIDTH),
        "pos_emb": g("embeddings.position_embedding.weight"),
        "ln_pre": {"w": g("pre_layrnorm.weight"),
                   "b": g("pre_layrnorm.bias")},
        "blocks": {k: jnp.stack(v) for k, v in blocks.items()},
        "ln_post": {"w": g("post_layernorm.weight"),
                    "b": g("post_layernorm.bias")},
        "proj": g("visual_projection.weight").T,
    }


def _ln(x, w, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_preprocess(images):
    """[B, H, W, 3] in [0, 1] -> resized + CLIP-normalized [B, 224, 224, 3]
    (differentiable; the resize is bilinear like T.Resize)."""
    images = jax.image.resize(
        images, (images.shape[0], IMAGE_SIZE, IMAGE_SIZE, 3), "bilinear")
    return (images - CLIP_MEAN) / CLIP_STD


def clip_vision_forward(params, images):
    """Normalized [B, 512] embeddings for preprocessed [B, 224, 224, 3]."""
    B = images.shape[0]
    n = IMAGE_SIZE // PATCH
    # patchify ordered (ph, pw, c) to match patch_w's layout
    x = images.reshape(B, n, PATCH, n, PATCH, 3)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, n * n,
                                                     PATCH * PATCH * 3)
    x = x @ params["patch_w"]  # [B, 196, 768]
    cls = jnp.broadcast_to(params["class_emb"], (B, 1, WIDTH))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_emb"][None]
    x = _ln(x, params["ln_pre"]["w"], params["ln_pre"]["b"])

    hd = WIDTH // HEADS

    def block(x, p):
        h = _ln(x, p["ln1_w"], p["ln1_b"])
        qkv = h @ p["qkv_w"] + p["qkv_b"]  # [B, T, 3*W]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, -1, HEADS, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, -1, WIDTH)
        x = x + o @ p["out_w"] + p["out_b"]
        h = _ln(x, p["ln2_w"], p["ln2_b"])
        h = _quick_gelu(h @ p["fc1_w"] + p["fc1_b"])
        x = x + h @ p["fc2_w"] + p["fc2_b"]
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    cls_out = _ln(x[:, 0], params["ln_post"]["w"], params["ln_post"]["b"])
    z = cls_out @ params["proj"]  # [B, 512]
    return z / jnp.linalg.norm(z, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=())
def clip_similarity_loss(params, images, text_z):
    """-(image_z . text_z).mean() for [B, H, W, 3] renders in [0, 1]
    (clip_utils.py:42-57, mode='text')."""
    z = clip_vision_forward(params, clip_preprocess(images))
    t = text_z / jnp.linalg.norm(text_z, axis=-1, keepdims=True)
    return -jnp.mean(jnp.sum(z * t[None] if t.ndim == 1 else z * t, axis=-1))
