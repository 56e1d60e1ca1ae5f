"""Positional (frequency) encoding.

TPU-native equivalent of the reference's freqencoder CUDA extension
(/root/reference/freqencoder/src/freqencoder.cu:30-95 and the pure-torch
FreqEncoder in encoding.py:5-43): output layout is
[x, sin(2^0 x), cos(2^0 x), ..., sin(2^{deg-1} x), cos(2^{deg-1} x)]
interleaved per frequency, giving D + 2*D*degree channels.
"""

import jax.numpy as jnp


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim + 2 * input_dim * degree


def freq_encode(x, degree: int = 4):
    """Encode coordinates with sin/cos frequencies.

    Args:
      x: [..., D] coordinates.
      degree: number of octaves.

    Returns:
      [..., D + 2*D*degree]: identity, then per-frequency (sin, cos) pairs.
    """
    outs = [x]
    for f in range(degree):
        xs = x * (2.0 ** f)
        outs.append(jnp.sin(xs))
        outs.append(jnp.cos(xs))
    return jnp.concatenate(outs, axis=-1)
