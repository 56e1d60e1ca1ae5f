"""Row scatter-add, redesigned for TPU: sort + work-list one-hot matmuls.

TPU-native replacement for the reference's atomicAdd gradient accumulation
(/root/reference/gridencoder/src/gridencoder.cu:323-338). XLA's TPU scatter
serializes at ~10-14 ns/scalar regardless of sorted/unique flags (measured,
perf/microbench_scatter2.py), which made the hash-encoder backward ~60% of
the train step in round 1. This op reformulates scatter-add as dense MXU
work:

  1. sort updates by destination row (radix argsort, ~0.3 ns/elem),
  2. cut the destination table into TILE-row tiles and the sorted update
     stream into MAXU-row blocks; build a *work list* of (tile, block)
     pairs — exact for any skew, no overflow/rescue path,
  3. a Pallas kernel iterates the work list: scalar-prefetched index maps
     pipeline each update block into VMEM, and a one-hot matmul
     (rows == local ids) accumulates the block into the resident output
     tile. The MXU performs the conflict resolution that atomics do on GPU.

Measured on v5e at the production shape (2.1M updates x 8ch into a 2.9M-row
table): 227 ms (XLA scatter) -> ~48 ms end-to-end.

Precision: "bf16" rounds each update row to bf16 before the f32-accumulating
matmul (strictly better than the reference's fp16 atomic accumulation);
"f32" splits updates into bf16 hi/lo parts and uses two matmuls (~1e-6 rel).

Multi-device note: under a data-parallel mesh the hashgrid backward runs
this kernel per shard before the gradient psum. GSPMD has no partitioning
rule for pallas_call, so on a real multi-chip mesh the call should be
wrapped in shard_map (untestable here: single physical chip; the 8-device
dryrun exercises the XLA fallback on CPU). Tracked for round 3.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048  # table rows per output tile
MAXU = 2048  # updates per input block
N_GRP = MAXU // 128


def _kernel(wt_ref, wb_ref, wflag_ref, qs_ref, gs_ref, zeros_ref, out_ref, *,
            split: bool):
    del zeros_ref  # donated pre-zeroed output; untouched tiles keep zeros
    """One work item: accumulate update block wb into table tile wt.

    wflag bit 0: first work item of this tile (zero the accumulator).
    wflag bit 1: real work (padding items skip compute).
    """
    w = pl.program_id(0)
    base = wt_ref[w] * TILE
    flag = wflag_ref[w]

    @pl.when(flag & 1 == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(flag & 2 == 2)
    def _():
        local = qs_ref[:] - base  # [N_GRP, 128] int32
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 0)
        C = out_ref.shape[1]
        acc = jnp.zeros((TILE, C), jnp.float32)
        for grp in range(N_GRP):
            oh = (row_iota == local[grp, :][None, :]).astype(jnp.bfloat16)
            blk = gs_ref[grp * 128:(grp + 1) * 128, :]
            if split:
                hi = blk.astype(jnp.bfloat16)
                lo = (blk - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                acc = acc + jnp.dot(oh, hi,
                                    preferred_element_type=jnp.float32)
                acc = acc + jnp.dot(oh, lo,
                                    preferred_element_type=jnp.float32)
            else:
                acc = acc + jnp.dot(oh, blk,
                                    preferred_element_type=jnp.float32)
        out_ref[:] += acc


@functools.lru_cache(maxsize=None)
def _make_call(q_blks: int, n_tiles: int, w_cap: int, c: int, split: bool,
               interpret: bool):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(w_cap,),
        in_specs=[
            pl.BlockSpec((N_GRP, 128), lambda w, wt, wb, wf: (wb[w], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MAXU, c), lambda w, wt, wb, wf: (wb[w], 0),
                         memory_space=pltpu.VMEM),
            # donated pre-zeroed output: lets the work list skip empty
            # tiles entirely (their blocks are never written and keep the
            # zeros) — for big sparse tables (the L16 editing encoder)
            # this halves the kernel's grid work
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, c), lambda w, wt, wb, wf: (wt[w], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, split=split),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, c), jnp.float32),
        # operand index counts the 3 scalar-prefetch args first
        input_output_aliases={5: 0},
        interpret=interpret,
    )


def scatter_add_rows(idx, g, table_rows: int, *, precision: str = "bf16",
                     interpret: bool = None):
    """grad[t, c] = sum over updates q with idx[q] == t of g[q, c].

    Args:
      idx: [Q] int32 destination rows, any order/duplication.
      g: [Q, C] float32 update rows.
      table_rows: T, number of output rows.
      precision: "bf16" (update rows rounded to bf16; f32 accumulation) or
        "f32" (hi/lo-split matmuls, ~1e-6 relative error).
      interpret: force Pallas interpreter (defaults to True off-TPU so tests
        run on CPU).
    Returns:
      [T, C] float32 accumulated gradient.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Q, C = g.shape[0], g.shape[1]
    if Q == 0:
        # an empty work list would leave every tile's VMEM output buffer
        # uninitialized (no item carries the zero flag) — flushed back as
        # garbage on hardware. Static shape, so resolve it at trace time.
        return jnp.zeros((table_rows, C), jnp.float32)
    T_pad = ((table_rows + TILE - 1) // TILE) * TILE
    n_tiles = T_pad // TILE
    q_blks = (Q + MAXU - 1) // MAXU + 1
    # every tile needs >= 1 item; straddling adds <= 1 block per tile
    w_cap = 2 * n_tiles + (Q + MAXU - 1) // MAXU + 8

    # one sort yields both the sorted keys and the permutation (argsort +
    # take(q) would run the same sort and then pay a 2M-row gather again)
    qs, order = jax.lax.sort_key_val(
        idx.astype(jnp.int32), jnp.arange(Q, dtype=jnp.int32))
    if precision == "bf16":
        gs = jnp.take(g.astype(jnp.bfloat16), order, axis=0)
        pad_dtype = jnp.bfloat16
    else:
        gs = jnp.take(g.astype(jnp.float32), order, axis=0)
        pad_dtype = jnp.float32

    pad = q_blks * MAXU - Q
    sentinel = jnp.int32(T_pad + 7)
    qs_p = jnp.concatenate([qs, jnp.full((pad,), sentinel, jnp.int32)])
    gs_p = jnp.concatenate([gs, jnp.zeros((pad, C), pad_dtype)])

    # per-tile sorted ranges and their block spans
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE
    lo = jnp.searchsorted(qs, bounds).astype(jnp.int32)
    cnt = lo[1:] - lo[:-1]
    blk_lo = lo[:-1] // MAXU
    blk_hi = (jnp.maximum(lo[1:], 1) - 1) // MAXU
    # empty tiles get NO work item: the donated pre-zeroed output keeps
    # their blocks at zero without the kernel visiting them
    n_work = jnp.where(cnt > 0, blk_hi - blk_lo + 1, 0)
    cum = jnp.cumsum(n_work)
    total = cum[-1]

    w_ids = jnp.arange(w_cap, dtype=jnp.int32)
    wt = jnp.searchsorted(cum, w_ids, side="right").astype(jnp.int32)
    wt = jnp.minimum(wt, n_tiles - 1)
    # padding items must revisit a tile the kernel already zeroed (an
    # unvisited block's VMEM buffer would otherwise be flushed back as
    # garbage): park them on the last real item's tile
    last_tile = jnp.take(wt, jnp.maximum(total - 1, 0))
    in_range = w_ids < total
    wt = jnp.where(in_range, wt, last_tile)
    w_off = w_ids - jnp.where(wt > 0, jnp.take(cum, wt - 1), 0)
    wreal = in_range & (jnp.take(cnt, wt) > 0)
    wfirst = (w_off == 0) & in_range
    wflag = (wfirst.astype(jnp.int32) + 2 * wreal.astype(jnp.int32))
    wb = jnp.where(wreal, jnp.take(blk_lo, wt) + w_off, q_blks - 1)
    wb = jnp.clip(wb, 0, q_blks - 1).astype(jnp.int32)

    call = _make_call(q_blks, n_tiles, w_cap, C, precision != "bf16",
                      bool(interpret))
    zeros = jnp.zeros((n_tiles * TILE, C), jnp.float32)
    grad = call(wt, wb, wflag,
                qs_p.reshape(q_blks * N_GRP, 128), gs_p, zeros)
    return grad[:table_rows]


def scatter_add_rows_xla(idx, g, table_rows: int):
    """Plain XLA flat-scalar scatter-add (round-1 path; CPU/fallback)."""
    C = g.shape[1]
    flat = (idx[:, None].astype(jnp.int32) * C
            + jnp.arange(C, dtype=jnp.int32)).reshape(-1)
    grad = jnp.zeros((table_rows * C,), jnp.float32).at[flat].add(
        g.reshape(-1).astype(jnp.float32))
    return grad.reshape(table_rows, C)


# ---------------------------------------------------------------------------
# v2: monotone narrow-window kernel
# ---------------------------------------------------------------------------
# The round-2 kernel's dominant cost is not the MXU but BUILDING the one-hot
# operands on the VPU: every 128-update group is compared against all
# TILE=2048 tile rows (total ~= Q*TILE + T*MAXU compares). v2 exploits the
# sort harder: each 128-update group of the SORTED stream lands in the
# single TILE_W-row window that contains its first row, so the compare
# window shrinks to TILE_W=512 (~8x less VPU work). Windows are
# tile-quantized and monotone non-decreasing, so Pallas keeps a window
# resident across consecutive groups and every window is flushed exactly
# once; the output doubles as an input block (same index_map, donated) so a
# window's first group starts from the buffer's current contents —
# which also makes multi-PASS accumulation correct: updates that overflow
# their group's window (the sorted tail that crosses the boundary, ~15-20%
# at training densities) are compacted and fed through the same kernel
# again on top of the pass-1 result, with a final XLA-scatter fallback for
# anything past the static spill capacities.

TILE_W = 512  # v2 window rows
GRP = 128  # updates per grid step
SLAB = 8  # qs groups per fetched slab (int32 Mosaic blocks need >=8 sublanes)


def _kernel_v2(wt_ref, first_ref, qs_ref, base_ref, gs_ref, out_ref, *,
               split: bool):
    g = pl.program_id(0)
    base = wt_ref[g] * TILE_W

    @pl.when(first_ref[g] == 1)
    def _():
        # first group of this window: seed from the buffer's current
        # contents (donated alias -> pass-1 results on later passes)
        out_ref[:] = base_ref[:]

    # qs arrives as the SLAB-group slab containing g: a (1, GRP) int32
    # block has sublane dim 1, which this Mosaic build cannot lower
    # (measured: TPU lowering error, r4 session). Select row g % SLAB with
    # a masked reduce — no dynamic sublane slicing either.
    row = g % SLAB
    sel = jax.lax.broadcasted_iota(jnp.int32, (SLAB, GRP), 0) == row
    qrow = jnp.sum(jnp.where(sel, qs_ref[:], 0), axis=0)  # [GRP]
    local = qrow - base  # int32; >= 0 by construction
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_W, GRP), 0)
    # window-overflow updates (local >= TILE_W) match no row: dropped here,
    # handled by the next pass
    oh = (row_iota == local[None, :]).astype(jnp.bfloat16)
    blk = gs_ref[:]
    if split:
        hi = blk.astype(jnp.bfloat16)
        lo = (blk - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out_ref[:] += (jnp.dot(oh, hi, preferred_element_type=jnp.float32)
                       + jnp.dot(oh, lo,
                                 preferred_element_type=jnp.float32))
    else:
        out_ref[:] += jnp.dot(oh, blk.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=None)
def _make_call_v2(n_groups: int, n_tiles: int, c: int, split: bool,
                  interpret: bool):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # wt, first
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((SLAB, GRP), lambda g, wt, first: (g // SLAB, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_W, c), lambda g, wt, first: (wt[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GRP, c), lambda g, wt, first: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_W, c), lambda g, wt, first: (wt[g], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel_v2, split=split),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE_W, c), jnp.float32),
        # operand order: wt, first (prefetch), qs, base, gs; base aliases out
        input_output_aliases={3: 0},
        interpret=interpret,
    )


def _scatter_pass_v2(qs, gs, acc, n_tiles, precision, interpret):
    """One v2 pass over a sorted (qs, gs) stream; returns (acc, spill_mask).

    qs rows beyond their group's window survive to the next pass.
    """
    Q = qs.shape[0]
    C = gs.shape[1]
    n_groups = Q // GRP
    starts = qs[::GRP]  # [n_groups] first row per group (sorted)
    wt = (starts // TILE_W).astype(jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (wt[1:] != wt[:-1]).astype(jnp.int32)])
    call = _make_call_v2(n_groups, int(acc.shape[0]) // TILE_W, C,
                         precision != "bf16", interpret)
    acc = call(wt, first, qs.reshape(n_groups, GRP), acc, gs)
    spill = (qs - jnp.repeat(wt, GRP) * TILE_W) >= TILE_W
    return acc, spill


def scatter_add_rows_v2(idx, g, table_rows: int, *, precision: str = "bf16",
                        interpret: bool = None, max_passes: int = 3):
    """grad[t, c] = sum_{q: idx[q] == t} g[q, c] — narrow-window kernel.

    Same contract as scatter_add_rows; ~8x less VPU one-hot work. See the
    v2 block comment above.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Q, C = g.shape[0], g.shape[1]
    if Q == 0:
        return jnp.zeros((table_rows, C), jnp.float32)
    T_pad = ((table_rows + TILE_W - 1) // TILE_W) * TILE_W
    n_tiles = T_pad // TILE_W

    qs, order = jax.lax.sort_key_val(
        idx.astype(jnp.int32), jnp.arange(Q, dtype=jnp.int32))
    gdt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    gs = jnp.take(g.astype(gdt), order, axis=0)

    # pad the stream to a SLAB*GRP multiple (the kernel fetches qs in
    # SLAB-group slabs) with parked updates on the last row of the padded
    # table (zero contribution rows)
    pad = (-Q) % (SLAB * GRP)
    sentinel = jnp.int32(T_pad - 1)
    qs = jnp.concatenate([qs, jnp.full((pad,), sentinel, jnp.int32)])
    gs = jnp.concatenate([gs, jnp.zeros((pad, C), gdt)])

    def xla_remainder(acc, mask, qs, gs):
        # rare path (static-capacity overflow / final-pass leftovers):
        # lax.cond so the scatter's cost is only paid when it runs
        def run(args):
            acc, mask, qs, gs = args
            return acc + scatter_add_rows_xla(
                jnp.where(mask, qs, sentinel),
                jnp.where(mask[:, None], gs, 0).astype(jnp.float32), T_pad)

        return jax.lax.cond(jnp.any(mask), run, lambda a: a[0],
                            (acc, mask, qs, gs))

    acc = jnp.zeros((T_pad, C), jnp.float32)
    # static spill capacities Q/3, Q/9 (sorted order is preserved by the
    # mask compaction); the sentinel row collects dropped padding
    cap = qs.shape[0]
    for p in range(max_passes):
        acc, spill = _scatter_pass_v2(qs, gs, acc, n_tiles, precision,
                                      interpret)
        if p == max_passes - 1:
            break
        cap = max(SLAB * GRP, ((cap // 3) // (SLAB * GRP)) * (SLAB * GRP))
        rank = jnp.cumsum(spill.astype(jnp.int32)) - 1
        keep = spill & (rank < cap)
        ofl = spill & (rank >= cap)
        acc = xla_remainder(acc, ofl, qs, gs)
        dest = jnp.where(keep, rank, cap)
        nq = jnp.full((cap + 1,), sentinel, jnp.int32).at[dest].set(
            jnp.where(keep, qs, sentinel))[:cap]
        ng = (jnp.zeros((cap + 1, C), gdt).at[dest].set(
            jnp.where(keep[:, None], gs, 0)))[:cap]
        qs, gs = nq, ng
    # updates still spilled after the final pass
    acc = xla_remainder(acc, spill, qs, gs)
    return acc[:table_rows]
