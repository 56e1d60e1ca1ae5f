"""Truncated exponential activation.

TPU-native equivalent of the reference's custom autograd op
(/root/reference/activation.py:5-18): forward is exp(x); backward clamps the
saved input to [-15, 15] so fp16/bf16 training does not blow up on large
densities.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
