"""Pallas TPU march-round kernel: a whole Km-event scan in ONE kernel with
the skip field resident in VMEM.

Why: the XLA event scan pays ~8 ns/ray/event, all of it per-gather latency
on the [H^3] skip-field lookup (docs/PERF.md r3 microbenches — the math
fuses to noise, the dependent gather does not). The 128^3 int8 field is
2 MB: it fits VMEM whole, where a vectorized lookup costs VPU cycles, not
HBM latency. One kernel invocation marches 16384 rays x Km events —
replacing Km serialized XLA gathers with Km in-VMEM gathers.

Equivalent of the reference's per-ray CUDA march loop
(raymarching/src/raymarching.cu:345-430) at the round granularity of
models/renderer._march_round (K_march events -> K_slots packed samples,
freeze on done/full). Single-cascade, no edit grid (the distill path keeps
the XLA round).

Layout: per-ray state lives as [128, 128] f32 tiles (ray r = i*128 + j) so
event math runs on full VPU lanes; only the field lookup round-trips
through the [NR, 1] sublane layout that tpu.dynamic_gather requires
(take_along_axis axis=0 with idx.shape == table.shape, then a lane select
on axis=1). The skip field is passed as [H*H, H] int8 (x*H+y rows, z
lanes).

Parity note: the exit-face math is algebraically identical to
ops/raymarch.make_march_event but reassociated (c*A + D instead of
((c+b)*k - pos) * rd), so floats differ in the last ulp; every sample
still lands exactly on the t0 + k*dt lattice and the conservative skip
field keeps the occupied-sample set correct (a short jump re-skips, the
self-correction make_march_event already relies on).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R0 = R1 = 128
NR = R0 * R1  # rays per kernel call == skip-field rows (same-shape gather)


def _march_kernel(field_ref, rays_ref, ts_ref, cnt_ref, tnext_ref, *,
                  H, Km, Ks, dt_min, dt_max, gamma, cell_world, scale, mb):
    """rays_ref: [15, 128, 128] f32 pages:
    0 t0, 1 fars, 2 alive, 3-5 P (d*scale), 6-8 Q ((o+mb)*scale),
    9-11 A (cell->t slope), 12-14 D (cell->t offset).
    Outputs: ts_ref [Ks, 128, 128] f32, cnt_ref [128,128] i32,
    tnext_ref [128, 128] f32.
    """
    fars = rays_ref[1]
    alive = rays_ref[2] > 0.5
    Px, Py, Pz = rays_ref[3], rays_ref[4], rays_ref[5]
    Qx, Qy, Qz = rays_ref[6], rays_ref[7], rays_ref[8]
    Ax, Ay, Az = rays_ref[9], rays_ref[10], rays_ref[11]
    Dx, Dy, Dz = rays_ref[12], rays_ref[13], rays_ref[14]

    for s in range(Ks):
        ts_ref[s] = jnp.zeros((R0, R1), jnp.float32)

    def event(carry):
        e, t, cnt = carry
        # cell of the current position (folded: clip((o + t*d + mb)*scale))
        cx = jnp.clip(t * Px + Qx, 0.0, H - 1.0)
        cy = jnp.clip(t * Py + Qy, 0.0, H - 1.0)
        cz = jnp.clip(t * Pz + Qz, 0.0, H - 1.0)
        nx = cx.astype(jnp.int32)
        ny = cy.astype(jnp.int32)
        nz = cz.astype(jnp.int32)

        # skip-field lookup: [128,128] -> sublane layout -> row gather
        # (axis=0, idx.shape == field.shape) -> lane select (axis=1) -> back
        rows = nx * H + ny
        rows_b = jnp.broadcast_to(rows.reshape(NR, 1), (NR, H))
        got = jnp.take_along_axis(field_ref[:], rows_b, axis=0,
                                  mode="promise_in_bounds")
        z_b = jnp.broadcast_to(nz.reshape(NR, 1), (NR, H))
        sel = jnp.take_along_axis(got, z_b, axis=1,
                                  mode="promise_in_bounds")
        f = sel[:, 0:1].reshape(R0, R1).astype(jnp.int32)

        if gamma == 0.0:
            dt = dt_min
        else:
            dt = jnp.clip(t * gamma, dt_min, dt_max)

        # exit face of the current cell: tt_fine = max(t, min_a(c_a*A + D))
        tv = jnp.minimum(jnp.minimum(nx.astype(jnp.float32) * Ax + Dx,
                                     ny.astype(jnp.float32) * Ay + Dy),
                         nz.astype(jnp.float32) * Az + Dz)
        tt_fine = jnp.maximum(t, tv)

        # distance-field jump (2^(f-1) - 1 free cells in any direction)
        m = (jnp.left_shift(1, jnp.maximum(f - 1, 0)) - 1).astype(
            jnp.float32)
        tt = jnp.maximum(tt_fine, t + m * cell_world)
        n_skip = jnp.floor((tt - t) / dt) + 1.0
        t_skip = t + jnp.maximum(n_skip, 1.0) * dt

        occ = f == 0
        done = t >= fars
        occ = occ & ~done & alive
        full = occ & (cnt >= Ks)
        write = occ & ~full
        t_next = jnp.where(occ, t + dt, t_skip)
        t_next = jnp.where(done | full, t, t_next)

        # pack the sample into slot cnt (masked one-hot over Ks slots);
        # skipped entirely when this event sampled nothing (common case)
        @pl.when(jnp.any(write))
        def _():
            for s in range(Ks):
                pred = write & (cnt == s)
                ts_ref[s] = jnp.where(pred, t, ts_ref[s])

        return e + 1, t_next, cnt + write.astype(jnp.int32)

    def cond(carry):
        e, t, cnt = carry
        active = alive & (t < fars) & (cnt < Ks)
        return (e < Km) & jnp.any(active)

    _, t_fin, cnt_fin = jax.lax.while_loop(
        cond, event, (jnp.zeros((), jnp.int32), rays_ref[0],
                      jnp.zeros((R0, R1), jnp.int32)))
    cnt_ref[:] = cnt_fin
    tnext_ref[:] = t_fin


@functools.partial(jax.jit, static_argnames=("H", "Km", "Ks", "dt_min",
                                             "dt_max", "gamma", "bound",
                                             "interpret"))
def march_round_pallas(t, fars, alive, rays_o, rays_d, field2d, *, H, Km,
                       Ks, dt_min, dt_max, gamma, bound, interpret=False):
    """One packed march round for exactly NR=16384 rays.

    Args:
      t, fars: [NR] f32; alive: [NR] bool; rays_o/d: [NR, 3] f32.
      field2d: [H*H, H] int8 skip field (build_skip_field reshaped).
    Returns (t_next [NR], ts [NR, Ks], dts [NR, Ks], valid [NR, Ks]).
    """
    assert t.shape[0] == NR and H * H == NR
    mb = min(1.0, bound)
    scale = 0.5 * H / mb
    cell_world = (2.0 / H) * mb
    # zero direction components: the XLA event subtracts before dividing
    # (finite * inf = inf, harmless), but the kernel's reassociated
    # c*A + D form would compute inf - inf = NaN — clamp |d| away from 0
    # so the axis just never wins the exit-face min.
    sgn0 = jnp.where(rays_d >= 0, 1.0, -1.0)
    d_safe = jnp.where(jnp.abs(rays_d) < 1e-12, sgn0 * 1e-12, rays_d)
    rd = 1.0 / d_safe
    sgn = jnp.sign(rays_d)
    # tv_a = ((c_a + 0.5 + 0.5*sgn_a) * (2/H) - 1) * mb * rd_a - pos_a*rd_a
    # with pos_a*rd_a = o_a*rd_a + t:  tv_a = c_a*A_a + D_a - t  (the -t and
    # +t cancel against tt = t + max(0, tv - t) => tt = max(t, c*A + D))
    A = cell_world * rd  # [NR, 3]
    D = (((0.5 + 0.5 * sgn) * (2.0 / H) - 1.0) * mb) * rd - rays_o * rd
    P = rays_d * scale
    Q = (rays_o + mb) * scale

    pages = jnp.stack([
        t, fars, alive.astype(jnp.float32),
        P[:, 0], P[:, 1], P[:, 2],
        Q[:, 0], Q[:, 1], Q[:, 2],
        A[:, 0], A[:, 1], A[:, 2],
        D[:, 0], D[:, 1], D[:, 2],
    ]).reshape(15, R0, R1)

    kern = functools.partial(_march_kernel, H=H, Km=Km, Ks=Ks,
                             dt_min=dt_min, dt_max=dt_max, gamma=gamma,
                             cell_world=cell_world, scale=scale, mb=mb)
    ts_pages, cnt, t_next = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((Ks, R0, R1), jnp.float32),
            jax.ShapeDtypeStruct((R0, R1), jnp.int32),
            jax.ShapeDtypeStruct((R0, R1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
        interpret=interpret,
    )(field2d, pages)

    ts = ts_pages.reshape(Ks, NR).T
    if gamma == 0.0:
        dts = jnp.full_like(ts, dt_min)
    else:
        dts = jnp.clip(ts * gamma, dt_min, dt_max)
    cnt = cnt.reshape(NR)
    valid = jnp.arange(Ks, dtype=jnp.int32)[None, :] < cnt[:, None]
    return t_next.reshape(NR), ts, dts, valid
