"""TPU A/B: Pallas march-round kernel vs the XLA event-scan round.

Uses the warm bench occupancy (real ~2% grid) and a full 800^2 frame's
rays in 16384-ray chunks — the exact inference workload shape. Reports
per-round ms for both paths and the projected frame-level march saving.

Compile risk: earlier Mosaic builds crashed on sublane dynamic_gather and
the packed-window march compile-hung; run under `timeout` and treat a
failure as "keep the XLA round".

Usage: python -u perf/microbench_march_pallas.py [--platform cpu]
"""

import argparse
import sys
import time

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None)
parser.add_argument("--rounds", type=int, default=6)
args = parser.parse_args()

import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/perf")
from warmstate import get_warm_trainer  # noqa: E402

from laenerf_tpu.models.renderer import _march_round  # noqa: E402
from laenerf_tpu.ops.march_pallas import NR, march_round_pallas  # noqa: E402
from laenerf_tpu.ops.raymarch import (build_skip_field,  # noqa: E402
                                      make_march_event, near_far_from_aabb)

tr, ds = get_warm_trainer()
cfg = tr.render_cfg.march_cfg
H = cfg.grid_size
skip = build_skip_field(tr.occ_state.occupancy, bound=cfg.bound)
field2d = skip.reshape(H * H, H)
skip_flat = skip.reshape(-1)
print(f"occ={float(jnp.mean(tr.occ_state.occupancy > 0)):.4f} "
      f"device={jax.devices()[0].device_kind}", flush=True)

# one 800^2 frame's central chunk of rays
from laenerf_tpu.data.rays import get_rays

pose = jnp.asarray(ds.poses[0])
intr = jnp.asarray(ds.intrinsics * (800 / ds.H))
intr = intr.at[2].set(400.0).at[3].set(400.0)
inds = jnp.arange(800 * 390, 800 * 390 + NR, dtype=jnp.int32)
ro, rd = get_rays(pose, intr, inds, 800, 800)
aabb = jnp.array([-cfg.bound] * 3 + [cfg.bound] * 3, jnp.float32)
nears, fars = near_far_from_aabb(ro, rd, aabb)
alive = jnp.ones((NR,), bool)
Ks, Km = tr.render_cfg.infer_chunk_events, tr.render_cfg.infer_march_events
if Km <= Ks:
    Km = 2 * Ks
print(f"Ks={Ks} Km={Km}", flush=True)


@jax.jit
def xla_round(t):
    event = make_march_event(ro, rd, skip_flat, None, cfg)
    return _march_round(event, t, fars, alive, Ks, Km)


INTERP = jax.default_backend() != "tpu"


def pallas_round(t):
    return march_round_pallas(t, fars, alive, ro, rd, field2d, H=H, Km=Km,
                              Ks=Ks, dt_min=cfg.dt_min, dt_max=cfg.dt_max,
                              gamma=cfg.dt_gamma, bound=cfg.bound,
                              interpret=INTERP)


def time_chain(fn, label):
    t = nears
    try:
        r = fn(t)
        jax.block_until_ready(r)
    except Exception as e:  # noqa: BLE001
        msg = (str(e).splitlines() or ["<no message>"])[0][:140]
        print(f"{label:28s} FAILED: {type(e).__name__}: {msg}", flush=True)
        return None, None
    t0 = time.time()
    outs = []
    t = nears
    for _ in range(args.rounds):
        r = fn(t)
        t = r[0]
        outs.append(r)
    jax.block_until_ready(t)
    per = (time.time() - t0) / args.rounds
    print(f"{label:28s} {per * 1e3:8.3f} ms/round "
          f"({per / NR * 1e9:6.2f} ns/ray/round)", flush=True)
    return per, outs


px, pout = time_chain(pallas_round, "pallas march round")
xx, xout = time_chain(xla_round, "xla march round")

if pout is not None and xout is not None:
    # agreement on the first round's sample pattern
    vp = np.asarray(pout[0][3])
    vx = np.asarray(xout[0][3])
    same = (vp == vx).all(1).mean()
    print(f"round-0 sample-pattern agreement: {same:.4f}", flush=True)
    if px and xx:
        # ~99 rounds/frame measured r3; march was 873 ms of 2134
        print(f"projected frame march: {873 * px / xx:.0f} ms "
              f"(from 873 ms XLA)", flush=True)
print("done", flush=True)
