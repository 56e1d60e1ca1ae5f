"""Fixed-shape sample compaction for network evaluation.

The reference evaluates its NeRF MLP on a ragged, atomically-compacted [M]
sample buffer (raymarching.cu:402-407 second pass). On TPU, dynamic shapes
would force recompiles, so we keep the padded [N, S] grids for compositing
but compact the *network evaluation* — the expensive part — into a fixed
[M_cap] buffer via a cumsum of validity (the static analogue of the
reference's mean_count-tracked buffer, raymarching/raymarching.py:198-203).

compact -> evaluate MLP on [M_cap] -> scatter_back to [N, S].
"""

import jax.numpy as jnp


def compact_samples(valid, m_cap: int):
    """Compute gather/scatter indexing for compaction.

    Args:
      valid: [N, S] bool.
      m_cap: static capacity of the compacted buffer. Samples beyond it are
        dropped (their sigma scatters back as 0 -> empty space), matching the
        reference's buffer-overflow behavior.
    Returns:
      gather_idx: [M_cap] int32 flat indices into [N*S] (clamped; garbage
        rows are masked by gather_mask).
      gather_mask: [M_cap] bool, True where the row holds a real sample.
      dest: [N, S] int32 destination of each sample in the compacted buffer
        (== m_cap for dropped/invalid samples, i.e. a dumpster row).
    """
    N, S = valid.shape
    flat = valid.reshape(-1)
    pos = jnp.cumsum(flat) - 1  # destination row per valid sample
    keep = flat & (pos < m_cap)
    dest_flat = jnp.where(keep, pos, m_cap)

    # inverse mapping: which [N*S] slot does compacted row m come from
    src = jnp.arange(N * S, dtype=jnp.int32)
    gather_idx = jnp.zeros((m_cap + 1,), dtype=jnp.int32)
    gather_idx = gather_idx.at[dest_flat].set(src)[:m_cap]
    n_valid = jnp.sum(flat)
    gather_mask = jnp.arange(m_cap) < jnp.minimum(n_valid, m_cap)
    return gather_idx, gather_mask, dest_flat.reshape(N, S)


def gather_flat(x, gather_idx):
    """Gather rows of a flattened [N*S, ...] array into [M_cap, ...]."""
    return jnp.take(x, gather_idx, axis=0)


def scatter_back(vals, dest, shape, fill=0.0):
    """Scatter compacted values [M_cap, ...] back to a padded [N, S, ...] grid.

    Args:
      vals: [M_cap, ...] compacted values.
      dest: [N, S] int32 from compact_samples (m_cap = dumpster).
      shape: (N, S) of the padded grid.
      fill: value for empty slots.
    """
    N, S = shape
    m_cap = vals.shape[0]
    trailing = vals.shape[1:]
    # dest maps sample -> compacted row; invert by gathering vals at dest,
    # with an extra fill row absorbing dumpster (dropped/invalid) slots.
    padded = jnp.concatenate(
        [vals, jnp.full((1,) + trailing, fill, dtype=vals.dtype)], axis=0
    )
    out = jnp.take(padded, jnp.minimum(dest.reshape(-1), m_cap), axis=0)
    return out.reshape((N, S) + trailing)
