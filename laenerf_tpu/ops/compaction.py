"""Fixed-shape sample compaction for network evaluation.

The reference evaluates its NeRF MLP on a ragged, atomically-compacted [M]
sample buffer (raymarching.cu:402-407 second pass). On TPU, dynamic shapes
would force recompiles, so we keep the padded [N, S] grids for compositing
but compact the *network evaluation* — the expensive part — into a fixed
[M_cap] buffer via a cumsum of validity (the static analogue of the
reference's mean_count-tracked buffer, raymarching/raymarching.py:198-203).

compact -> evaluate MLP on [M_cap] -> scatter_back to [N, S].
"""

from functools import partial

import jax
import jax.numpy as jnp


def compact_samples(valid, m_cap: int):
    """Compute gather/scatter indexing for compaction — scatter-free.

    TPU scatters cost ~10-30 ms at the 1M-element sizes this runs at per
    render round; this formulation uses only a tiny per-row sort (S-wide),
    row-count cumsums, and a searchsorted, all of which vectorize cleanly.

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
    counts = jnp.sum(valid, axis=1)  # [N]
    offsets_incl = jnp.cumsum(counts)  # [N]
    offsets_excl = offsets_incl - counts

    # per-sample destination: row offset + within-row prefix position
    pos_in_row = jnp.cumsum(valid, axis=1) - 1  # [N, S]
    dest = offsets_excl[:, None] + pos_in_row
    keep = valid & (dest < m_cap)
    dest = jnp.where(keep, dest, m_cap).astype(jnp.int32)

    # inverse mapping without a big scatter: stable-sort each S-wide row so
    # the valid slots come first, then address output row m as (ray, j).
    # ray-of-m is decoded by scattering each ray's id at its start offset
    # and running a cummax — jnp.searchsorted lowers to a while loop on TPU
    # (~4-15 ms/call at render shapes, measured via xplane trace); the
    # scalar scatter-max is ~0.4 ms. Rays sharing a start offset all have
    # zero counts except (at most) the last, so max-of-ids at each slot is
    # exactly the owning ray.
    order = jnp.argsort(~valid, axis=1, stable=True)  # [N, S]
    m = jnp.arange(m_cap, dtype=jnp.int32)
    starts = jnp.minimum(offsets_excl, m_cap).astype(jnp.int32)  # [N]
    ray = jnp.zeros((m_cap + 1,), jnp.int32).at[starts].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop")[:m_cap]
    ray = jax.lax.cummax(ray)
    j = jnp.clip(m - jnp.take(offsets_excl, ray).astype(jnp.int32), 0, S - 1)
    slot = jnp.take(order.reshape(-1), ray * S + j)
    gather_idx = (ray * S + slot).astype(jnp.int32)

    n_valid = offsets_incl[-1]
    gather_mask = m < jnp.minimum(n_valid, m_cap)
    return gather_idx, gather_mask, dest


def gather_flat(x, gather_idx):
    """Gather rows of a flattened [N*S, ...] array into [M_cap, ...]."""
    return jnp.take(x, gather_idx, axis=0)


def _scatter_back_impl(vals, dest, shape, fill):
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


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _scatter_back_bij(vals, dest, gather_idx, gather_mask, shape, fill):
    return _scatter_back_impl(vals, dest, shape, fill)


def _scatter_back_bij_fwd(vals, dest, gather_idx, gather_mask, shape, fill):
    return (_scatter_back_impl(vals, dest, shape, fill),
            (gather_idx, gather_mask))


def _scatter_back_bij_bwd(shape, fill, res, g):
    # dest is INJECTIVE on real samples (compact_samples assigns unique
    # prefix positions), so the vals-cotangent is a single [M_cap]-row
    # gather at gather_idx — XLA's autodiff of the forward take would
    # instead emit a [N*S]-row scatter-add (~14.5 ms/step at the training
    # shape, measured r5 xplane trace; this gather is ~0.5 ms)
    trailing = g.shape[2:]
    gather_idx, gather_mask = res
    gflat = g.reshape((-1,) + trailing)
    gv = jnp.take(gflat, gather_idx, axis=0)
    # g's dtype equals the forward output's, which equals vals' dtype
    gv = jnp.where(gather_mask.reshape((-1,) + (1,) * len(trailing)), gv, 0)
    return gv, None, None, None


_scatter_back_bij.defvjp(_scatter_back_bij_fwd, _scatter_back_bij_bwd)


def scatter_back(vals, dest, shape, fill=0.0, gather_idx=None,
                 gather_mask=None):
    """Scatter compacted values [M_cap, ...] back to a padded [N, S, ...] grid.

    Args:
      vals: [M_cap, ...] compacted values.
      dest: [N, S] int32 from compact_samples (m_cap = dumpster).
      shape: (N, S) of the padded grid.
      fill: value for empty slots.
      gather_idx, gather_mask: the matching compact_samples outputs. When
        given, a custom VJP computes the vals-cotangent as one gather at
        gather_idx instead of autodiff's [N*S]-row scatter-add (dest is
        injective on real samples). Pass them on differentiated paths.
    """
    if gather_idx is not None and gather_mask is not None:
        return _scatter_back_bij(vals, dest, gather_idx, gather_mask,
                                 tuple(shape), fill)
    return _scatter_back_impl(vals, dest, tuple(shape), fill)
