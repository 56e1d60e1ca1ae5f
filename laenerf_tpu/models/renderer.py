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
from ..ops.raymarch import (MarchConfig, build_skip_field, make_march_event,
                            march_rays_train, near_far_from_aabb,
                            sample_positions, sph_from_ray)
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
    # per-round network-eval compaction: capacity = N*K // this. Dead rays
    # and skip events never reach the MLP/hash encoder (the XLA analogue of
    # the reference's alive-ray compaction, renderer.py:336-387). 1 disables.
    #
    # NOTE (r5): this file used to carry a portfolio of alternative fast
    # paths — pair-sampling, batched-lattice and packed-window march
    # rounds, f8 gather views, warm-up rounds, frame-global alive-ray
    # repacking, raster-built sample streams, and per-round ray tiers.
    # Round-5 A/Bs on v5e (perf/r5_render_sweep.py) measured EVERY one of
    # them slower than the plain event-scan march at 800^2 (f8 +10%,
    # warmup +24%, pair +31%, repack/raster combos +31..63% in BENCH_r04),
    # so per the round-4 verdict they were deleted. The winners that
    # remain: the chebyshev skip-field event scan, event packing
    # (infer_march_events > slots), the compacted-eval capacity ladder,
    # 16k tile-ordered chunks, and the per-frame skip-field hoist.
    infer_compact_factor: int = 4
    # Two round-5 structural levers were built here and DELETED after the
    # on-silicon A/Bs (docs/PERF.md round 5): Morton-sorting the compacted
    # samples before the network forward (index ORDER does not change XLA
    # TPU gather cost — the engine is latency-bound per row; 1675 vs
    # 1529 ms/frame end-to-end), and a Pallas whole-round march kernel
    # (Mosaic cannot lower the [128,128]->[16384,1] shape cast its
    # two-step skip-field gather needs on this toolchain).

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


def _make_round(rays_o, rays_d, skip_flat, edit_flat, cfg):
    """Build the event-scan march round for this ray set."""
    event = make_march_event(rays_o, rays_d, skip_flat, edit_flat, cfg)

    def rnd(t, fars, alive, K_slots, K_march, with_edit=False):
        return _march_round(event, t, fars, alive, K_slots, K_march,
                            with_edit=with_edit)
    return rnd


def _march_round(event, t, fars, alive, K_slots: int, K_march: int,
                 with_edit: bool = False):
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
                      bg_color=None, perturb: bool = False,
                      skip_flat=None):
    """Inference-path rendering (renderer.py:336-392) as a while_loop.

    Every round marches K_march events per ray (packing occupied samples
    into K dense slots), evaluates the network on the compacted valid
    samples, and folds them into per-ray accumulators. Rays die by
    transmittance; the caller chunks rays in spatial-tile order so whole
    chunks retire early (the XLA analogue of the reference's alive-ray
    compaction loop).

    skip_flat: optional prebuilt flat skip field (build_march_tables) —
    callers rendering many chunks per frame pass it so the chebyshev
    dilation runs once per FRAME, not once per chunk. None builds it here.

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

    if skip_flat is None:
        skip_flat = build_skip_field(occupancy, bound=cfg.bound).reshape(-1)

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
    march_round = _make_round(rays_o, rays_d, skip_flat, None, cfg)

    def body(c):
        t, acc = c["t"], c["acc"]
        alive = (acc["T"] >= render_cfg.t_thresh) & (t < fars)
        t_new, ts, dt, valid, _ = march_round(t, fars, alive, K, K_march)
        sig, rgb, valid_e, t_new = _eval_compacted(
            params, model_cfg, render_cfg, rays_o, rays_d, ts,
            valid, t_new, N, K)
        acc_new = composite_chunk(acc, sig, rgb, dt, ts, valid_e, t0,
                                  render_cfg.t_thresh)
        return {"t": t_new, "acc": acc_new, "round": c["round"] + 1}

    out = jax.lax.while_loop(cond, body, init)
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
    """Per-frame march acceleration table: the flat chebyshev skip field,
    built ONCE per frame by Trainer.render_image and passed to every
    chunk's render_rays_infer call (the dilation passes over the full grid
    would otherwise run per chunk)."""
    cfg = render_cfg.march_cfg
    return build_skip_field(occupancy, bound=cfg.bound).reshape(-1)


def _composite_distill(acc, ws_edit, depth_edit, sig, rgb, dt, ts,
                       valid, eocc, t_thresh):
    """One distill round's accumulation (raymarching.cu:1038-1142
    semantics): standard transmittance compositing plus edit-flagged
    weight/depth sums.
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
                        perturb: bool = False, grow_grid: bool = False,
                        skip_flat=None):
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

    if skip_flat is None:
        # callers rendering many chunks per frame pass a prebuilt field
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
