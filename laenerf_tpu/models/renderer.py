"""Volume-rendering paths: training, inference, and distillation.

TPU-native equivalent of the reference's NeRFRenderer.run_cuda /
run_cuda_distill (/root/reference/nerf/renderer.py:259-480). The reference's
training path marches into a ragged buffer and composites with custom CUDA
autograd; its inference path is a host-side alive-ray compaction loop. Here:

  * train: fixed-shape march -> compact samples -> one batched network eval
    -> scatter back -> differentiable masked composite (see ops/).
  * inference: `lax.while_loop` over march rounds; every round marches K
    events for all rays and folds the samples into per-ray accumulators
    (composite_chunk). Rays die by transmittance; the loop exits when all
    rays are done or max_steps is exhausted. The caller chunks rays so
    whole tiles retire early (the XLA analogue of alive-ray compaction).
"""

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.compaction import compact_samples, gather_flat, scatter_back  # noqa: F401
from ..ops.composite import composite_chunk, composite_rays_train
from ..ops.hashgrid import octo_view
from ..ops.raymarch import (WINDOW_PERMS, MarchConfig, build_skip_field,
                            lattice_march_supported, make_lattice_round,
                            make_march_event, make_window_round,
                            march_rays_train, near_far_from_aabb,
                            pack_skip_fields, sample_positions,
                            sph_from_ray)
from .nerf import NeRFConfig, nerf_background, nerf_forward


def _with_encoder_view(params, model_cfg: NeRFConfig):
    """Inject the prebuilt octo gather view (ops/hashgrid.octo_view) into the
    param pytree so network evals inside while_loop bodies never rebuild it.
    No-op unless the spec uses octo_gather or a view is already present
    (callers like Trainer.render_image inject one per *frame*)."""
    spec = model_cfg.grid_spec
    if spec.octo_gather and "encoder_view" not in params:
        params = dict(params,
                      encoder_view=octo_view(params["encoder"], spec))
    return params


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration."""

    bound: float = 1.0
    cascades: int = 1
    grid_size: int = 128
    dt_gamma: float = 0.0
    max_steps: int = 1024
    min_near: float = 0.2
    density_scale: float = 1.0
    density_thresh: float = 0.01  # occupancy threshold (min'd with mean)
    t_thresh: float = 1e-4
    # train path shapes: march_iters is the padded event/sample width S
    march_iters: int = 256
    m_cap_per_ray: int = 32  # M_cap = N * this (mean_count analogue)
    # inference path shapes (swept on v5e: K=16/factor=4 with tile-ordered
    # 16-32k chunks maximizes rays/s, perf/profile_render.py)
    infer_chunk_events: int = 16  # K sample SLOTS per while_loop round
    # march events per round (>= slots). Most march events are empty-space
    # skips (traced ~130 events vs ~20-30 samples per object ray at 800^2),
    # so marching more events than slots and packing only the occupied ones
    # into the K-slot grid (in-scan one-hot write) cuts the number of
    # rounds — and with it the per-round eval/composite/dispatch overhead —
    # without evaluating a single extra sample. Rays that fill every slot
    # freeze (t rewinds to the overflowing event) and resume next round.
    # 0 means "same as infer_chunk_events" (no packing).
    infer_march_events: int = 32
    # pair-sampling: an occupied march event also claims the NEXT dt cell
    # as a sample without gathering its occupancy — one skip-field fetch
    # per TWO samples inside objects (the march is latency-bound on
    # dependent gathers). The extra cell may be one the grid would have
    # skipped; its (tiny, trained-model) sigma still composites correctly —
    # this relaxes the acceleration structure, not the renderer. Off by
    # default: exact-parity with the per-cell march (and the reference's
    # bitfield semantics, raymarching.cu:380-399) when False.
    infer_pair_samples: bool = False
    # batched-lattice march round (ops/raymarch.make_lattice_round): one
    # [N, Km] skip-field gather per round instead of Km serialized [N]
    # gathers. Measured on v5e it does NOT pay: XLA TPU gather costs
    # ~8-9 ns per LOOKUP whether batched or serialized
    # (perf/microbench_lattice.py), and the event chain's skip jumps visit
    # far fewer cells than the Km dense lattice positions the batched round
    # must fetch (2409-3821 ms/frame across Km 32-192 vs 2229 ms for the
    # event scan). Kept as an opt-in: it is exact-parity
    # (tests/test_march_composite.py) and the trade flips on any backend
    # where batched gathers stream.
    infer_lattice_march: bool = False
    # packed-window march round (ops/raymarch.make_window_round): one int32
    # gather fetches a 4-cell skip-field run along the chunk's dominant ray
    # axis, so each scan iteration retires up to 4 march events (exact
    # parity — same lattice, same jump formulas; the per-chunk axis choice
    # is data, not a retrace). Requires dt_gamma == 0, cascades == 1;
    # falls back to the event scan otherwise (and in the distill path,
    # which needs per-event edit-grid lookups).
    infer_window_march: bool = False
    # dtype of the per-frame inference gather view ("" = the model spec's
    # gather_dtype). "f8" (float8_e4m3fn) halves each level's gather
    # operand again vs bf16 — the v5e gather-cost knee sits at ~16 MB of
    # operand per level (docs/PERF.md) — at ~6% relative feature rounding.
    # Inference-only: training always uses the spec dtype.
    infer_view_dtype: str = ""
    # warm-up rounds: the first this-many rounds of a chunk's march run
    # with infer_warmup_slots sample slots instead of infer_chunk_events.
    # Opaque-surface rays saturate transmittance within a handful of dt
    # samples, so full-width first rounds evaluate (K - ~4) samples per
    # surface ray that the composite then discards — the reference's
    # n_step = 1, 2, 4, ... schedule (renderer.py:348-352) exists for the
    # same reason. 0 disables. NOTE: only wired into the single-tier body
    # and the stream/repack paths; ignored when infer_ray_tiers > 1 (the
    # legacy tiered body has no warmup branch).
    infer_warmup_rounds: int = 0
    infer_warmup_slots: int = 4
    # global cross-chunk ray repacking: > 0 makes Trainer.render_image run
    # phased inference — every chunk marches this many rounds, then the
    # still-alive rays of the WHOLE frame are re-packed into dense chunks
    # and marching resumes (the direct analogue of the reference's
    # host-side alive-ray compaction, renderer.py:336-387, done across the
    # frame instead of per launch). Kills the dominant march waste: dead
    # rays inside a live chunk still pay every scan-iteration gather.
    # 0 disables (per-chunk while_loop to completion).
    infer_repack_rounds: int = 0
    # raster-built sample streams (ops/raster.py): per frame, project the
    # occupied cells into the camera and pre-compute every ray's ordered
    # sample list with ONE sort — rendering rounds then pop samples with no
    # skip-field gathers at all (the serialized-march floor disappears).
    # Uses the phased/repack driver; requires dt_gamma == 0, cascades == 1,
    # pinhole frames. Falls back to the march automatically when the
    # builder's static capacities overflow (stream["ok"] False).
    infer_raster: bool = False
    # per-round network-eval compaction: capacity = N*K // this. Dead rays
    # and skip events never reach the MLP/hash encoder (the XLA analogue of
    # the reference's alive-ray compaction, renderer.py:336-387). 1 disables.
    infer_compact_factor: int = 4
    # per-round RAY compaction: alive rays are re-packed to the front and
    # the whole round (march + eval + composite) runs at a static capacity
    # tier of N / 4^k, k < this (the direct analogue of the reference's
    # rays_alive compaction between rounds, renderer.py:375). 1 disables.
    # Default OFF: the sample-capacity ladder in _eval_compacted already
    # absorbs empty rounds (valid-sample count, not alive-ray count, is
    # what shrinks mid-march), and each extra ray tier multiplies the
    # branch graphs the AOT compiler must build.
    infer_ray_tiers: int = 1

    @property
    def march_cfg(self) -> MarchConfig:
        return MarchConfig(
            bound=self.bound,
            cascades=self.cascades,
            grid_size=self.grid_size,
            dt_gamma=self.dt_gamma,
            max_steps=self.max_steps,
            march_iters=self.march_iters,
        )


def _make_round(rays_o, rays_d, skip_flat, edit_flat, cfg,
                pair: bool = False, lattice: bool = False,
                window_packed=None):
    """Pick the march-round implementation for this ray set.

    window_packed (pack_skip_fields output, [3, H*H*H/4]) selects the
    packed-window round: the dominant ray axis of THIS ray set picks the
    matching transposed/packed field variant and the ray components are
    permuted to put that axis last — all traced data, so every chunk shares
    one compiled graph. The batched-lattice round (see
    RenderConfig.infer_lattice_march for its measured trade-off) and the
    pair-sampling relaxation remain opt-ins; both exclude the window.
    """
    if (window_packed is not None and lattice_march_supported(cfg)
            and not pair and edit_flat is None):
        dom = jnp.argmax(jnp.sum(jnp.abs(rays_d), axis=0))
        perm = jnp.asarray(WINDOW_PERMS, jnp.int32)[dom]
        o_p = jnp.take(rays_o, perm, axis=1)
        d_p = jnp.take(rays_d, perm, axis=1)
        packed_flat = jax.lax.dynamic_index_in_dim(window_packed, dom,
                                                   keepdims=False)
        win = make_window_round(o_p, d_p, packed_flat, cfg)

        def rnd(t, fars, alive, K_slots, K_march, with_edit=False):
            return win(t, fars, alive, K_slots, K_march)
        return rnd

    if lattice and lattice_march_supported(cfg) and not pair:
        lat = make_lattice_round(rays_o, rays_d, skip_flat, edit_flat, cfg)

        def rnd(t, fars, alive, K_slots, K_march, with_edit=False):
            return lat(t, fars, alive, K_slots, K_march, with_edit=with_edit)
        return rnd

    event = make_march_event(rays_o, rays_d, skip_flat, edit_flat, cfg)

    def rnd(t, fars, alive, K_slots, K_march, with_edit=False):
        return _march_round(event, t, fars, alive, K_slots, K_march,
                            with_edit=with_edit, pair=pair)
    return rnd


def _march_round(event, t, fars, alive, K_slots: int, K_march: int,
                 with_edit: bool = False, pair: bool = False):
    """March up to K_march events, packing occupied samples into K_slots
    dense per-ray slots (in-scan one-hot writes — a [N, K_slots] select per
    event, pure VPU work).

    Most march events are empty-space skips, so marching more events than
    sample slots cuts the number of while_loop rounds (and their fixed
    eval/composite/dispatch cost) without evaluating extra samples. A ray
    that fills every slot freezes at the overflowing event (t rewinds so the
    sample is re-marched next round). With K_march == K_slots this reduces
    to the plain one-event-per-slot scan.

    Returns (t_next [N], ts [N,Ks], dt [N,Ks], valid [N,Ks], eocc [N,Ks]).
    """
    N = t.shape[0]
    if K_march <= K_slots:
        def step(tc, _):
            t_next, (ts_s, dt_s, occ, eocc) = event(tc)
            done = tc >= fars
            t_next = jnp.where(done, tc, t_next)
            return t_next, (ts_s, dt_s, occ & ~done, eocc)

        t_new, (ts, dt, occ, eocc) = jax.lax.scan(step, t, None,
                                                  length=K_slots)
        return (t_new, ts.T, dt.T, occ.T & alive[:, None],
                eocc.T if with_edit else jnp.zeros((N, K_slots), jnp.bool_))

    slots = jnp.arange(K_slots, dtype=jnp.int32)
    zeros_f = jnp.zeros((N, K_slots), jnp.float32)
    zeros_b = jnp.zeros((N, K_slots), jnp.bool_)

    def step(carry, _):
        tc, cnt, ts_b, dt_b, e_b = carry
        t_next, (ts_s, dt_s, occ, eocc) = event(tc)
        done = tc >= fars
        occ = occ & ~done & alive
        full = occ & (cnt >= K_slots)
        t_next = jnp.where(done | full, tc, t_next)
        write = occ & ~full
        oh = (slots[None, :] == cnt[:, None]) & write[:, None]  # [N, Ks]
        ts_b = jnp.where(oh, ts_s[:, None], ts_b)
        dt_b = jnp.where(oh, dt_s[:, None], dt_b)
        if with_edit:
            e_b = jnp.where(oh, eocc[:, None], e_b)
        cnt = cnt + write.astype(jnp.int32)
        if pair:
            # claim the next dt cell too (one gather per two samples)
            w2 = write & (cnt < K_slots) & (ts_s + dt_s < fars)
            oh2 = (slots[None, :] == cnt[:, None]) & w2[:, None]
            ts_b = jnp.where(oh2, (ts_s + dt_s)[:, None], ts_b)
            dt_b = jnp.where(oh2, dt_s[:, None], dt_b)
            if with_edit:
                e_b = jnp.where(oh2, eocc[:, None], e_b)
            cnt = cnt + w2.astype(jnp.int32)
            t_next = jnp.where(w2, tc + 2.0 * dt_s, t_next)
        return (t_next, cnt, ts_b, dt_b, e_b), None

    (t_new, cnt, ts, dt, eocc), _ = jax.lax.scan(
        step, (t, jnp.zeros((N,), jnp.int32), zeros_f, zeros_f, zeros_b),
        None, length=K_march)
    valid = slots[None, :] < cnt[:, None]
    return t_new, ts, dt, valid, eocc


def _background(params, model_cfg: NeRFConfig, rays_o, rays_d, bg_color):
    """Resolve the per-ray background color (renderer.py:276-282)."""
    if model_cfg.bg_radius > 0:
        sph = sph_from_ray(rays_o, rays_d, model_cfg.bg_radius)
        return nerf_background(params, model_cfg, sph, rays_d)
    if bg_color is None:
        return jnp.ones_like(rays_o)
    if jnp.ndim(bg_color) == 0:
        return jnp.full_like(rays_o, bg_color)
    return jnp.broadcast_to(bg_color, rays_o.shape)


@partial(jax.jit, static_argnames=("model_cfg", "render_cfg", "perturb"))
def render_rays_train(params, occupancy, rays_o, rays_d, key, *,
                      model_cfg: NeRFConfig, render_cfg: RenderConfig,
                      bg_color=None, perturb: bool = True):
    """Training-path rendering (renderer.py:285-334).

    Args:
      params: NeRF parameter pytree.
      occupancy: [CAS, H, H, H] uint8.
      rays_o, rays_d: [N, 3].
      key: PRNG key for march perturbation.
      bg_color: None (white / bg-model), scalar, or [N, 3].
    Returns:
      dict(image [N,3], depth [N], weights_sum [N], nears [N], fars [N],
           n_samples [N]).
    """
    N = rays_o.shape[0]
    cfg = render_cfg.march_cfg
    aabb = jnp.array([-cfg.bound] * 3 + [cfg.bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb,
                                     render_cfg.min_near)
    noises = (jax.random.uniform(key, (N,)) if perturb
              else jnp.zeros((N,), jnp.float32))

    march = march_rays_train(rays_o, rays_d, occupancy, nears, fars, noises,
                             cfg)
    # the march is index work — no gradients flow through it (the reference's
    # CUDA march is likewise non-differentiable)
    march = jax.lax.stop_gradient(march)
    ts, dts, valid = march["ts"], march["dts"], march["valid"]
    S = cfg.march_iters

    # Compact for the network eval (the expensive part), [N*S] -> [M_cap].
    # Two capacity tiers picked at runtime (lax.switch): once the occupancy
    # grid converges, the valid-sample count drops well below the full cap
    # and the cheap tier takes over (the runtime analogue of the reference's
    # EMA'd mean_count buffer, raymarching.py:198-203).
    xyz = sample_positions(rays_o, rays_d, ts, cfg.bound)  # [N, S, 3]
    xyz_flat = xyz.reshape(N * S, 3)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (N, S, 3)).reshape(N * S, 3)

    # Two capacity tiers only. Overflowing samples are truncated and the
    # ray composites its *prefix* — exactly the reference's behavior when
    # the mean_count-sized sample buffer fills early in training
    # (raymarching/raymarching.py:198-203): partial rays still supervise
    # the near content, and random ray sampling rotates which rays
    # truncate. This replaces round 1's N*S/4 top tier, which made every
    # pre-pruning step pay a 4x network eval. Each tier is a full
    # encode+MLP+backward graph that costs ~1 min of AOT compile on the
    # octo path, so the ladder stays at two rungs.
    base_cap = N * render_cfg.m_cap_per_ray
    caps = sorted({max(base_cap // 2, 2048), base_cap})
    n_valid = jnp.sum(valid)
    bucket = jnp.minimum(
        jnp.searchsorted(jnp.array(caps), n_valid, side="left"),
        len(caps) - 1,
    )

    # No remat: with the N*S/4 top tier gone the residuals (gathered rows +
    # MLP activations at <= base_cap samples) fit HBM comfortably, and
    # rematerializing would repeat the encoder's 2M-row gather in the
    # backward (~19 ms/step measured)
    network = lambda p, x, d: nerf_forward(p, model_cfg, x, d)

    def eval_at_cap(m_cap):
        def fn(_):
            gather_idx, gather_mask, dest = compact_samples(valid, m_cap)
            xyz_c = gather_flat(xyz_flat, gather_idx)
            dirs_c = gather_flat(dirs, gather_idx)
            sigmas_c, rgbs_c = network(params, xyz_c, dirs_c)
            sigmas_c = sigmas_c * render_cfg.density_scale
            sigmas_c = jnp.where(gather_mask, sigmas_c, 0.0)
            # one 4-wide row gather instead of separate sig/rgb gathers;
            # gather_idx/mask route the backward through the injective-dest
            # custom VJP (one gather, not a 1M-row scatter-add)
            both = scatter_back(
                jnp.concatenate([sigmas_c[:, None], rgbs_c], axis=1), dest,
                (N, S), gather_idx=gather_idx, gather_mask=gather_mask)
            sig, rgb = both[..., 0], both[..., 1:]
            # truncate capacity-dropped samples: the ray composites only
            # its evaluated prefix (within-ray order is preserved by the
            # flat-order compaction, so drops are a per-ray suffix)
            valid_eval = valid & (dest < m_cap)
            ray_ok = ~jnp.any(valid & (dest >= m_cap), axis=1)
            return sig, rgb, valid_eval, ray_ok
        return fn

    sigmas, rgbs, valid_eval, ray_ok = jax.lax.switch(
        bucket, [eval_at_cap(c) for c in caps], None
    )

    weights_sum, depth, image = composite_rays_train(
        sigmas, rgbs, dts, ts, valid_eval, march["t0"], render_cfg.t_thresh
    )
    bg = _background(params, model_cfg, rays_o, rays_d, bg_color)
    image = image + (1.0 - weights_sum)[:, None] * bg
    return {
        "image": image,
        "depth": depth,
        "weights_sum": weights_sum,
        "nears": nears,
        "fars": fars,
        "n_samples": march["n_samples"],
        "ray_ok": ray_ok,
    }


def _eval_compacted(params, model_cfg, render_cfg, rays_o, rays_d, ts,
                    valid, t_new, N, K):
    """Evaluate the network only on valid round samples.

    Compacts [N, K] valid samples into a fixed [N*K // factor] buffer,
    evaluates, and scatters back (sigma 0 elsewhere). If a round has more
    valid samples than the capacity, the overflowing rays *rewind*: their
    dropped samples are masked out of this round's composite and t resumes
    at the first dropped sample, so they are re-marched next round —
    capacity is a throughput knob, never a correctness one.

    Returns (sig [N,K], rgb [N,K,3], valid_eval [N,K], t_next [N]).
    """
    factor = render_cfg.infer_compact_factor
    if factor <= 1:
        xyz = sample_positions(rays_o, rays_d, ts, render_cfg.bound)
        dirs = jnp.broadcast_to(rays_d[:, None, :], (N, K, 3))
        sig, rgb = nerf_forward(params, model_cfg, xyz.reshape(-1, 3),
                                dirs.reshape(-1, 3))
        return ((sig * render_cfg.density_scale).reshape(N, K),
                rgb.reshape(N, K, 3), valid, t_new)

    # Static shapes mean a compacted eval costs its *capacity*, not the
    # actual sample count — so pick among geometric capacity tiers at
    # runtime with lax.switch (only the chosen branch executes). Most
    # rounds march through mostly-empty space (few VALID samples while all
    # rays stay alive), so the small rungs dominate: measured 65 -> ~25
    # ms/round at 32k rays when the ladder was collapsed vs present.
    base = (N * K) // factor
    caps = [base]
    c = base // 4
    while c >= 2048:
        caps.append(c)
        c //= 4
    caps = sorted(set(caps))

    def eval_at_cap(m_cap):
        def fn(_):
            gather_idx, gather_mask, dest = compact_samples(valid, m_cap)
            ray_ids = gather_idx // K
            ts_c = gather_flat(ts.reshape(-1), gather_idx)
            ro_c = jnp.take(rays_o, ray_ids, axis=0)
            rd_c = jnp.take(rays_d, ray_ids, axis=0)
            xyz_c = jnp.clip(ro_c + ts_c[:, None] * rd_c, -render_cfg.bound,
                             render_cfg.bound)
            sig_c, rgb_c = nerf_forward(params, model_cfg, xyz_c, rd_c)
            sig_c = jnp.where(gather_mask,
                              sig_c * render_cfg.density_scale, 0.0)
            # one 4-wide row gather instead of separate sig/rgb gathers
            # (row gathers are latency-bound per row, not per byte)
            both = scatter_back(
                jnp.concatenate([sig_c[:, None], rgb_c], axis=1), dest,
                (N, K))
            sig, rgb = both[..., 0], both[..., 1:]
            # overflow rewind (within-ray order is preserved by the
            # flat-order compaction, so drops are a per-ray suffix)
            dropped = valid & (dest >= m_cap)
            valid_eval = valid & (dest < m_cap)
            first_drop_ts = jnp.min(jnp.where(dropped, ts, jnp.inf), axis=1)
            t_next = jnp.where(jnp.any(dropped, axis=1), first_drop_ts,
                               t_new)
            return sig, rgb, valid_eval, t_next
        return fn

    if len(caps) == 1:
        return eval_at_cap(caps[0])(None)
    n_valid = jnp.sum(valid)
    bucket = jnp.searchsorted(jnp.array(caps), n_valid, side="left")
    bucket = jnp.minimum(bucket, len(caps) - 1)
    return jax.lax.switch(bucket, [eval_at_cap(c) for c in caps], None)


@partial(jax.jit, static_argnames=("model_cfg", "render_cfg", "perturb"))
def render_rays_infer(params, occupancy, rays_o, rays_d, key, *,
                      model_cfg: NeRFConfig, render_cfg: RenderConfig,
                      bg_color=None, perturb: bool = False):
    """Inference-path rendering (renderer.py:336-392) as a while_loop.

    Each round first re-packs the alive rays to the front and runs the
    entire round (march scan + compacted network eval + composite) at a
    static ray-capacity tier of N / 4^k picked from the live count — the
    XLA analogue of the reference's `rays_alive = rays_alive[rays_alive >=
    0]` compaction (renderer.py:375): once most rays terminate, later
    rounds march and evaluate a fraction of the chunk.

    Returns dict(image [N,3], depth [N], weights_sum [N], nears [N]).
    """
    N = rays_o.shape[0]
    cfg = render_cfg.march_cfg
    K = render_cfg.infer_chunk_events
    params = _with_encoder_view(params, model_cfg)
    aabb = jnp.array([-cfg.bound] * 3 + [cfg.bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb,
                                     render_cfg.min_near)
    noises = (jax.random.uniform(key, (N,)) if perturb
              else jnp.zeros((N,), jnp.float32))
    t0 = nears + jnp.clip(nears * cfg.dt_gamma, cfg.dt_min, cfg.dt_max) * noises

    skip_field = build_skip_field(occupancy, bound=cfg.bound)
    skip_flat = skip_field.reshape(-1)
    window_packed = (
        pack_skip_fields(skip_field)
        if (render_cfg.infer_window_march and lattice_march_supported(cfg)
            and not render_cfg.infer_pair_samples)
        else None)

    # ascending ray-capacity tiers: N, N/4, N/16, ... (floor 2048)
    ray_caps = [N]
    for _ in range(max(render_cfg.infer_ray_tiers, 1) - 1):
        c = ray_caps[-1] // 4
        if c < 2048 or c == ray_caps[-1]:
            break
        ray_caps.append(c)
    ray_caps = sorted(set(ray_caps))

    init = {
        "t": t0,
        "acc": {
            "T": jnp.ones((N,), jnp.float32),
            "ws": jnp.zeros((N,), jnp.float32),
            "depth": jnp.zeros((N,), jnp.float32),
            "rgb": jnp.zeros((N, 3), jnp.float32),
        },
        "round": jnp.zeros((), jnp.int32),
    }

    # rewinds consume rounds; scaling by the compaction factor keeps
    # the total evaluated-sample budget at N * max_steps
    max_rounds = (cfg.max_steps // K) * max(render_cfg.infer_compact_factor, 1)

    def cond(c):
        alive = (c["acc"]["T"] >= render_cfg.t_thresh) & (c["t"] < fars)
        return jnp.any(alive) & (c["round"] < max_rounds)

    K_march = render_cfg.infer_march_events or K
    march_round = _make_round(rays_o, rays_d, skip_flat, None, cfg,
                              pair=render_cfg.infer_pair_samples,
                              lattice=render_cfg.infer_lattice_march,
                              window_packed=window_packed)

    def body_single(c):
        """No-reorder round at full ray capacity (infer_ray_tiers=1): the
        per-round argsort/takes/scatter of the tiered path cost several
        ms/round of pure data movement when there is only one tier."""
        t, acc = c["t"], c["acc"]
        alive = (acc["T"] >= render_cfg.t_thresh) & (t < fars)

        def run_round(K_s, K_m):
            def fn(_):
                t_new, ts, dt, valid, _ = march_round(t, fars, alive,
                                                      K_s, K_m)
                sig, rgb, valid_e, t_new = _eval_compacted(
                    params, model_cfg, render_cfg, rays_o, rays_d, ts,
                    valid, t_new, N, K_s)
                return composite_chunk(acc, sig, rgb, dt, ts, valid_e, t0,
                                       render_cfg.t_thresh), t_new
            return fn

        W = render_cfg.infer_warmup_rounds
        if W > 0:
            Kw = min(render_cfg.infer_warmup_slots, K)
            acc_new, t_new = jax.lax.cond(
                c["round"] < W, run_round(Kw, 2 * Kw), run_round(K, K_march),
                operand=None)
        else:
            acc_new, t_new = run_round(K, K_march)(None)
        return {"t": t_new, "acc": acc_new, "round": c["round"] + 1}

    def body(c):
        t, acc = c["t"], c["acc"]
        alive = (acc["T"] >= render_cfg.t_thresh) & (t < fars)
        n_alive = jnp.sum(alive)
        # order-preserving compaction mapping (shared by every tier)
        pos = jnp.cumsum(alive) - 1  # [N]
        order = jnp.argsort(~alive, stable=True)  # alive ids first

        def round_at(A):
            def fn(_):
                ids = order[:A] if A < N else order
                mask = jnp.arange(A, dtype=jnp.int32) < n_alive
                ro = jnp.take(rays_o, ids, axis=0)
                rd = jnp.take(rays_d, ids, axis=0)
                fars_a = jnp.take(fars, ids)
                t0_a = jnp.take(t0, ids)
                t_a = jnp.take(t, ids)
                acc_a = jax.tree.map(lambda s: jnp.take(s, ids, axis=0),
                                     acc)
                tier_round = _make_round(
                    ro, rd, skip_flat, None, cfg,
                    pair=render_cfg.infer_pair_samples,
                    lattice=render_cfg.infer_lattice_march,
                    window_packed=window_packed)
                alive_a = mask & (acc_a["T"] >= render_cfg.t_thresh)
                t_new, ts, dt, valid, _ = tier_round(
                    t_a, fars_a, alive_a, K, K_march)
                sig, rgb, valid, t_new = _eval_compacted(
                    params, model_cfg, render_cfg, ro, rd, ts, valid,
                    t_new, A, K)
                acc_new = composite_chunk(acc_a, sig, rgb, dt, ts, valid,
                                          t0_a, render_cfg.t_thresh)
                # scatter the tier results back into the [N] state
                dest = jnp.where(alive & (pos < A), pos, A).astype(jnp.int32)
                taken = dest < A
                safe = jnp.minimum(dest, A - 1)

                def put(new, old):
                    g = jnp.take(new, safe, axis=0)
                    m = taken.reshape((N,) + (1,) * (new.ndim - 1))
                    return jnp.where(m, g, old)

                return (put(t_new, t), jax.tree.map(put, acc_new, acc))
            return fn

        bucket = jnp.minimum(
            jnp.searchsorted(jnp.array(ray_caps), n_alive, side="left"),
            len(ray_caps) - 1)
        t_out, acc_out = jax.lax.switch(
            bucket, [round_at(a) for a in ray_caps], None)
        return {"t": t_out, "acc": acc_out, "round": c["round"] + 1}

    out = jax.lax.while_loop(
        cond, body_single if len(ray_caps) == 1 else body, init)
    acc = out["acc"]
    bg = _background(params, model_cfg, rays_o, rays_d, bg_color)
    image = acc["rgb"] + (1.0 - acc["ws"])[:, None] * bg
    return {
        "image": image,
        "depth": acc["depth"],
        "weights_sum": acc["ws"],
        "nears": nears,
        "fars": fars,
        "rounds": out["round"],
    }


@partial(jax.jit, static_argnames=("render_cfg",))
def build_march_tables(occupancy, *, render_cfg: RenderConfig):
    """Per-frame march acceleration tables: the flat skip field and (when
    infer_window_march) the packed axis variants. Built ONCE per frame by
    phased inference instead of once per chunk call."""
    cfg = render_cfg.march_cfg
    field = build_skip_field(occupancy, bound=cfg.bound)
    packed = (pack_skip_fields(field)
              if (render_cfg.infer_window_march
                  and lattice_march_supported(cfg)
                  and not render_cfg.infer_pair_samples)
              else None)
    return field.reshape(-1), packed


@partial(jax.jit, static_argnames=("model_cfg", "render_cfg", "max_rounds",
                                   "warmup"))
def render_rays_infer_rounds(params, skip_flat, window_packed, rays_o,
                             rays_d, t, acc, t0, fars, *,
                             model_cfg: NeRFConfig,
                             render_cfg: RenderConfig, max_rounds: int,
                             warmup: bool = False):
    """March up to max_rounds inference rounds from explicit per-ray state.

    The phased building block behind RenderConfig.infer_repack_rounds:
    unlike render_rays_infer (which owns its loop to completion), state
    (t, accumulators, t0, fars) is caller-managed so the caller can re-pack
    the frame's surviving rays into dense chunks between phases.

    Returns (t, acc, alive) with alive = (T >= t_thresh) & (t < fars).
    """
    N = rays_o.shape[0]
    cfg = render_cfg.march_cfg
    K = render_cfg.infer_chunk_events
    K_march = render_cfg.infer_march_events or K
    params = _with_encoder_view(params, model_cfg)

    march_round = _make_round(rays_o, rays_d, skip_flat, None, cfg,
                              pair=render_cfg.infer_pair_samples,
                              lattice=render_cfg.infer_lattice_march,
                              window_packed=window_packed)

    def cond(c):
        alive = (c["acc"]["T"] >= render_cfg.t_thresh) & (c["t"] < fars)
        return jnp.any(alive) & (c["round"] < max_rounds)

    def body(c):
        t, acc_c = c["t"], c["acc"]
        alive = (acc_c["T"] >= render_cfg.t_thresh) & (t < fars)

        def run_round(K_s, K_m):
            def fn(_):
                t_new, ts, dt, valid, _ = march_round(t, fars, alive,
                                                      K_s, K_m)
                sig, rgb, valid_e, t_new = _eval_compacted(
                    params, model_cfg, render_cfg, rays_o, rays_d, ts,
                    valid, t_new, N, K_s)
                return composite_chunk(acc_c, sig, rgb, dt, ts, valid_e,
                                       t0, render_cfg.t_thresh), t_new
            return fn

        W = render_cfg.infer_warmup_rounds if warmup else 0
        if W > 0:
            Kw = min(render_cfg.infer_warmup_slots, K)
            acc_new, t_new = jax.lax.cond(
                c["round"] < W, run_round(Kw, 2 * Kw),
                run_round(K, K_march), operand=None)
        else:
            acc_new, t_new = run_round(K, K_march)(None)
        return {"t": t_new, "acc": acc_new, "round": c["round"] + 1}

    out = jax.lax.while_loop(
        cond, body, {"t": t, "acc": acc, "round": jnp.zeros((), jnp.int32)})
    alive = (out["acc"]["T"] >= render_cfg.t_thresh) & (out["t"] < fars)
    return out["t"], out["acc"], alive


@partial(jax.jit, static_argnames=("model_cfg", "render_cfg", "max_rounds",
                                   "warmup"))
def render_rays_stream_rounds(params, k16, rays_o, rays_d, base, count,
                              cursor, acc, t0, *,
                              model_cfg: NeRFConfig,
                              render_cfg: RenderConfig, max_rounds: int,
                              warmup: bool = False):
    """March-free rounds over a raster-built sample stream (ops/raster.py).

    Each round pops the next K sample keys per alive ray from the sorted
    stream — the per-sample key gather rides the compacted network eval's
    existing gather stage, so the serialized skip-field lookups of the
    event scan disappear entirely. Capacity overflow rewinds the cursor to
    the first dropped sample (same semantics as _eval_compacted's t
    rewind). State is caller-held for frame-global repacking.

    Returns (cursor, acc, alive).
    """
    N = rays_o.shape[0]
    cfg = render_cfg.march_cfg
    dt = cfg.dt_min
    K = render_cfg.infer_chunk_events
    params = _with_encoder_view(params, model_cfg)
    factor = max(render_cfg.infer_compact_factor, 1)

    def run_round(c, K_s):
        cur = c["cursor"]
        acc_c = c["acc"]
        alive = (acc_c["T"] >= render_cfg.t_thresh) & (cur < count)
        offs = jnp.arange(K_s, dtype=jnp.int32)[None, :]
        valid = (cur[:, None] + offs < count[:, None]) & alive[:, None]

        # same geometric capacity-tier ladder as _eval_compacted: a round
        # costs its chosen CAPACITY, and most rounds carry few samples
        cbase = max((N * K_s) // factor, 2048)
        tiers = [cbase]
        cc = cbase // 4
        while cc >= 2048:
            tiers.append(cc)
            cc //= 4
        tiers = sorted(set(tiers))

        def eval_at_cap(m_cap):
            def fn(_):
                gather_idx, gather_mask, dest = compact_samples(valid,
                                                                m_cap)
                ray_ids = gather_idx // K_s
                slot = gather_idx - ray_ids * K_s
                kidx = (jnp.take(base, ray_ids) + jnp.take(cur, ray_ids)
                        + slot)
                k = jnp.take(k16, jnp.minimum(kidx, k16.shape[0] - 1)
                             ).astype(jnp.float32)
                ts_c = jnp.take(t0, ray_ids) + k * dt
                ro_c = jnp.take(rays_o, ray_ids, axis=0)
                rd_c = jnp.take(rays_d, ray_ids, axis=0)
                xyz_c = jnp.clip(ro_c + ts_c[:, None] * rd_c,
                                 -render_cfg.bound, render_cfg.bound)
                sig_c, rgb_c = nerf_forward(params, model_cfg, xyz_c,
                                            rd_c)
                sig_c = jnp.where(gather_mask,
                                  sig_c * render_cfg.density_scale, 0.0)
                packed = scatter_back(
                    jnp.concatenate(
                        [sig_c[:, None], rgb_c,
                         jnp.where(gather_mask, ts_c, 0.0)[:, None]],
                        axis=1), dest, (N, K_s))
                sig, rgb, tsg = (packed[..., 0], packed[..., 1:4],
                                 packed[..., 4])
                valid_eval = valid & (dest < m_cap)
                dtg = jnp.where(valid_eval, dt, 0.0)
                acc_new = composite_chunk(acc_c, sig, rgb, dtg, tsg,
                                          valid_eval, t0,
                                          render_cfg.t_thresh)
                adv = jnp.sum(valid_eval.astype(jnp.int32), axis=1)
                return acc_new, jnp.where(alive, cur + adv, cur)
            return fn

        if len(tiers) == 1:
            return eval_at_cap(tiers[0])(None)
        bucket = jnp.minimum(
            jnp.searchsorted(jnp.array(tiers), jnp.sum(valid),
                             side="left"), len(tiers) - 1)
        return jax.lax.switch(bucket, [eval_at_cap(c) for c in tiers],
                              None)

    def cond(c):
        alive = (c["acc"]["T"] >= render_cfg.t_thresh) \
            & (c["cursor"] < count)
        return jnp.any(alive) & (c["round"] < max_rounds)

    def body(c):
        W = render_cfg.infer_warmup_rounds if warmup else 0
        if W > 0:
            Kw = min(render_cfg.infer_warmup_slots, K)
            acc_new, cur_new = jax.lax.cond(
                c["round"] < W,
                lambda _: run_round(c, Kw),
                lambda _: run_round(c, K), None)
        else:
            acc_new, cur_new = run_round(c, K)
        return {"cursor": cur_new, "acc": acc_new,
                "round": c["round"] + 1}

    out = jax.lax.while_loop(
        cond, body,
        {"cursor": cursor, "acc": acc, "round": jnp.zeros((), jnp.int32)})
    alive = (out["acc"]["T"] >= render_cfg.t_thresh) \
        & (out["cursor"] < count)
    return out["cursor"], out["acc"], alive


@partial(jax.jit, static_argnames=("model_cfg",))
def finalize_infer_image(params, rays_o, rays_d, acc, bg_color, *,
                         model_cfg: NeRFConfig):
    """Apply the background model/color to phased-inference accumulators."""
    bg = _background(params, model_cfg, rays_o, rays_d, bg_color)
    image = acc["rgb"] + (1.0 - acc["ws"])[:, None] * bg
    return image, acc["depth"]


@partial(jax.jit, static_argnames=("model_cfg", "render_cfg",
                                   "max_rounds"))
def render_rays_distill_stream_rounds(params, k16, edit_flat, rays_o,
                                      rays_d, base, count, cursor, acc,
                                      ws_edit, depth_edit, t0, *,
                                      model_cfg: NeRFConfig,
                                      render_cfg: RenderConfig,
                                      max_rounds: int):
    """Distill-path rounds over a raster-built sample stream: the
    march-free analogue of render_rays_distill. Each compacted sample adds
    one edit-grid lookup (2 MB int8 operand) next to its network eval.

    NOTE: the compaction/eval/tier-ladder body intentionally mirrors
    render_rays_stream_rounds — keep edits to either in sync (the shared
    piece that differs only in composite is _composite_distill).

    Returns (cursor, acc, ws_edit, depth_edit, alive).
    """
    N = rays_o.shape[0]
    cfg = render_cfg.march_cfg
    dt = cfg.dt_min
    K = render_cfg.infer_chunk_events
    params = _with_encoder_view(params, model_cfg)
    factor = max(render_cfg.infer_compact_factor, 1)
    Hg = cfg.grid_size
    mb = min(1.0, cfg.bound)
    scale = 0.5 * Hg / mb

    def run_round(c):
        cur = c["cursor"]
        acc_c = c["acc"]
        alive = (acc_c["T"] >= render_cfg.t_thresh) & (cur < count)
        offs = jnp.arange(K, dtype=jnp.int32)[None, :]
        valid = (cur[:, None] + offs < count[:, None]) & alive[:, None]

        cbase = max((N * K) // factor, 2048)
        tiers = [cbase]
        cc = cbase // 4
        while cc >= 2048:
            tiers.append(cc)
            cc //= 4
        tiers = sorted(set(tiers))

        def eval_at_cap(m_cap):
            def fn(_):
                gather_idx, gather_mask, dest = compact_samples(valid,
                                                                m_cap)
                ray_ids = gather_idx // K
                slot = gather_idx - ray_ids * K
                kidx = (jnp.take(base, ray_ids) + jnp.take(cur, ray_ids)
                        + slot)
                k = jnp.take(k16, jnp.minimum(kidx, k16.shape[0] - 1)
                             ).astype(jnp.float32)
                ts_c = jnp.take(t0, ray_ids) + k * dt
                ro_c = jnp.take(rays_o, ray_ids, axis=0)
                rd_c = jnp.take(rays_d, ray_ids, axis=0)
                xyz_c = jnp.clip(ro_c + ts_c[:, None] * rd_c,
                                 -render_cfg.bound, render_cfg.bound)
                # edit-grid membership (march event's edit_occ analogue)
                cell = jnp.clip((xyz_c + mb) * scale, 0.0,
                                Hg - 1.0).astype(jnp.int32)
                flat = (cell[:, 0] * Hg + cell[:, 1]) * Hg + cell[:, 2]
                e_c = (jnp.take(edit_flat, flat) > 0) & gather_mask
                sig_c, rgb_c = nerf_forward(params, model_cfg, xyz_c,
                                            rd_c)
                sig_c = jnp.where(gather_mask,
                                  sig_c * render_cfg.density_scale, 0.0)
                packed = scatter_back(
                    jnp.concatenate(
                        [sig_c[:, None], rgb_c,
                         jnp.where(gather_mask, ts_c, 0.0)[:, None],
                         e_c[:, None].astype(jnp.float32)], axis=1),
                    dest, (N, K))
                sig, rgb = packed[..., 0], packed[..., 1:4]
                tsg, eg = packed[..., 4], packed[..., 5] > 0.5
                valid_eval = valid & (dest < m_cap)
                dtg = jnp.where(valid_eval, dt, 0.0)
                acc_new, we, de = _composite_distill(
                    acc_c, c["ws_edit"], c["depth_edit"], sig, rgb, dtg,
                    tsg, valid_eval, eg, render_cfg.t_thresh)
                adv = jnp.sum(valid_eval.astype(jnp.int32), axis=1)
                return acc_new, we, de, jnp.where(alive, cur + adv, cur)
            return fn

        if len(tiers) == 1:
            return eval_at_cap(tiers[0])(None)
        bucket = jnp.minimum(
            jnp.searchsorted(jnp.array(tiers), jnp.sum(valid),
                             side="left"), len(tiers) - 1)
        return jax.lax.switch(bucket, [eval_at_cap(t) for t in tiers],
                              None)

    def cond(c):
        alive = (c["acc"]["T"] >= render_cfg.t_thresh) \
            & (c["cursor"] < count)
        return jnp.any(alive) & (c["round"] < max_rounds)

    def body(c):
        acc_new, we, de, cur_new = run_round(c)
        return {"cursor": cur_new, "acc": acc_new, "ws_edit": we,
                "depth_edit": de, "round": c["round"] + 1}

    out = jax.lax.while_loop(
        cond, body,
        {"cursor": cursor, "acc": acc, "ws_edit": ws_edit,
         "depth_edit": depth_edit, "round": jnp.zeros((), jnp.int32)})
    alive = (out["acc"]["T"] >= render_cfg.t_thresh) \
        & (out["cursor"] < count)
    return (out["cursor"], out["acc"], out["ws_edit"], out["depth_edit"],
            alive)


def _composite_distill(acc, ws_edit, depth_edit, sig, rgb, dt, ts,
                       valid, eocc, t_thresh):
    """One distill round's accumulation (raymarching.cu:1038-1142
    semantics): standard transmittance compositing plus edit-flagged
    weight/depth sums. Shared by the march and stream distill paths.
    Depth here is the ABSOLUTE ray parameter (t_abs = ts + dt)."""
    sd = jnp.where(valid, sig * dt, 0.0)
    csum = jnp.cumsum(sd, axis=1)
    T_in = acc["T"][:, None]
    T_incl = T_in * jnp.exp(-csum)
    T_excl = T_in * jnp.exp(-(csum - sd))
    alpha = 1.0 - jnp.exp(-sd)
    weights = alpha * T_excl
    prev_T = jnp.concatenate([T_in, T_incl[:, :-1]], axis=1)
    keep = (prev_T >= t_thresh).astype(weights.dtype)
    weights = weights * keep
    t_abs = ts + dt  # post-increment absolute t (deltas[1]-accumulated)
    e = (eocc & valid).astype(weights.dtype)
    new_acc = {
        "T": T_incl[:, -1],
        "ws": acc["ws"] + jnp.sum(weights, axis=1),
        "depth": acc["depth"] + jnp.sum(weights * t_abs, axis=1),
        "rgb": acc["rgb"] + jnp.sum(weights[..., None] * rgb, axis=1),
    }
    return (new_acc, ws_edit + jnp.sum(weights * e, axis=1),
            depth_edit + jnp.sum(weights * t_abs * e, axis=1))


@partial(jax.jit, static_argnames=("model_cfg", "render_cfg", "perturb",
                                   "grow_grid"))
def render_rays_distill(params, occupancy, edit_grid, rays_o, rays_d, key, *,
                        model_cfg: NeRFConfig, render_cfg: RenderConfig,
                        perturb: bool = False, grow_grid: bool = False):
    """Distillation-path rendering with a second (edit) grid.

    Equivalent of run_cuda_distill (renderer.py:394-480) +
    march/composite_rays_distill (raymarching.cu:811-945,1038-1142): marches
    the density grid (or the edit grid itself when grow_grid), flags samples
    inside the edit grid, and accumulates separate edit weight/depth sums.
    Depth here is the *absolute* ray parameter (sum w * t), matching the
    reference, so `x_term = rays_o + depth * rays_d`.

    Returns dict(image, depth, depth_edit, weights, weights_edit, x_term,
    nears, min_near).
    """
    N = rays_o.shape[0]
    cfg = render_cfg.march_cfg
    K = render_cfg.infer_chunk_events
    params = _with_encoder_view(params, model_cfg)
    aabb = jnp.array([-cfg.bound] * 3 + [cfg.bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb,
                                     render_cfg.min_near)
    noises = (jax.random.uniform(key, (N,)) if perturb
              else jnp.zeros((N,), jnp.float32))
    t0 = nears + jnp.clip(nears * cfg.dt_gamma, cfg.dt_min, cfg.dt_max) * noises

    march_src = edit_grid if grow_grid else occupancy
    skip_flat = build_skip_field(march_src, bound=cfg.bound).reshape(-1)
    edit_flat = edit_grid.reshape(-1)
    march_round = _make_round(rays_o, rays_d, skip_flat, edit_flat, cfg)
    K_march = render_cfg.infer_march_events or K

    zeros = jnp.zeros((N,), jnp.float32)
    init = {
        "t": t0,
        "acc": {"T": jnp.ones((N,), jnp.float32), "ws": zeros,
                "depth": zeros, "rgb": jnp.zeros((N, 3), jnp.float32)},
        "ws_edit": zeros,
        "depth_edit": zeros,
        "round": jnp.zeros((), jnp.int32),
    }
    # rewinds consume rounds; scaling by the compaction factor keeps
    # the total evaluated-sample budget at N * max_steps
    max_rounds = (cfg.max_steps // K) * max(render_cfg.infer_compact_factor, 1)

    def cond(c):
        alive = (c["acc"]["T"] >= render_cfg.t_thresh) & (c["t"] < fars)
        return jnp.any(alive) & (c["round"] < max_rounds)

    def body(c):
        alive = (c["acc"]["T"] >= render_cfg.t_thresh) & (c["t"] < fars)
        t_new, ts, dt, valid, eocc = march_round(
            c["t"], fars, alive, K, K_march, with_edit=True)
        sig, rgb, valid, t_new = _eval_compacted(
            params, model_cfg, render_cfg, rays_o, rays_d, ts, valid, t_new,
            N, K)

        new_acc, ws_edit, depth_edit = _composite_distill(
            c["acc"], c["ws_edit"], c["depth_edit"], sig, rgb, dt, ts,
            valid, eocc, render_cfg.t_thresh)
        return {
            "t": t_new,
            "acc": new_acc,
            "ws_edit": ws_edit,
            "depth_edit": depth_edit,
            "round": c["round"] + 1,
        }

    out = jax.lax.while_loop(cond, body, init)
    acc = out["acc"]
    x_term = rays_o + acc["depth"][:, None] * rays_d
    return {
        "image": acc["rgb"],
        "depth": acc["depth"],
        "depth_edit": out["depth_edit"],
        "weights": acc["ws"],
        "weights_edit": out["ws_edit"],
        "x_term": x_term,
        "nears": nears,
        "min_near": jnp.min(nears),
    }
