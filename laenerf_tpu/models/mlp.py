"""Small fused-MLP replacement.

The reference relies on fully-fused CUDA MLPs (ffmlp extension,
/root/reference/ffmlp/src/ffmlp.cu:331-518, and tiny-cuda-nn for the LAENeRF
nets) to keep activations in shared memory. On TPU the same networks are a
chain of `dot_general`s that XLA fuses end-to-end and tiles onto the MXU —
a hand-written kernel buys nothing at these sizes, so this is deliberately
plain jitted code. Matmuls run in bf16 with fp32 params and fp32 outputs
(the bf16 analogue of the reference's fp16 AMP policy).

Layers are bias-free, matching the reference's nn.Linear(bias=False)
(nerf/network.py:45,66,88) and ffmlp (which has no bias terms at all).
"""

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def mlp_init(key, dims: Sequence[int], dtype=jnp.float32):
    """Initialise a bias-free MLP.

    Weights use torch.nn.Linear's default kaiming-uniform bound U(±1/sqrt(in))
    so the training dynamics match the reference backbone.

    Args:
      key: PRNG key.
      dims: layer sizes, e.g. (in, hidden, ..., out).
    Returns:
      list of [in, out] weight matrices.
    """
    params = []
    keys = jax.random.split(key, len(dims) - 1)
    for k, din, dout in zip(keys, dims[:-1], dims[1:]):
        bound = 1.0 / math.sqrt(din)
        params.append(
            jax.random.uniform(k, (din, dout), dtype=dtype, minval=-bound,
                               maxval=bound)
        )
    return params


def mlp_apply(params, x, compute_dtype=jnp.bfloat16, out_dtype=jnp.float32):
    """Apply the MLP with ReLU between layers, none after the last.

    Mirrors the reference forward loops (nerf/network.py:103-106). The
    activation chain stays in compute_dtype; the result is cast to out_dtype.
    """
    h = x.astype(compute_dtype)
    n = len(params)
    for i, w in enumerate(params):
        h = jnp.dot(h, w.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        if i != n - 1:
            h = jnp.maximum(h, 0.0)
        h = h.astype(compute_dtype)
    return h.astype(out_dtype)
