"""Measure the fused warp+splat prototype vs the production two-kernel path.

VERDICT r2 item 8: before declaring ~4.4 ms fwd / 1.5M events the
formulation floor, measure a fused form where warped coordinates are
generated inside the splat kernel grid and never hit HBM.

DSEC scale, row-sorted events (the row-banded regime: bc = full width on
both paths so the comparison isolates fusion, not column banding). Prints
per-path forward times; results recorded in docs/ARCHITECTURE.md.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache")
)

import jax
import jax.numpy as jnp
import numpy as np

from eincm_tpu.ops import splat as tpu_splat
from eincm_tpu.experimental.splat_fused import (
    fused_warp_splat_frame,
    fully_fused_warp_splat_frame,
)
from eincm_tpu.ops.warp import (
    interp_theta_at_events,
    warp_events_multi_ref_coarse,
)

H, W = 480, 640
N = 1_500_000
N_REFS = 2

print("backend:", jax.default_backend(), file=sys.stderr)
rng = np.random.default_rng(0)
ys = np.sort(rng.uniform(0, H - 1, N)).astype(np.float32)  # row-sorted
xs = rng.uniform(0, W - 1, N).astype(np.float32)
ts = rng.uniform(0, 1, N).astype(np.float32)
xi, yi = np.round(xs), np.round(ys)
theta = rng.normal(0, 4, (16, 16, 2)).astype(np.float32)
t_refs = np.linspace(0, 1, N_REFS).astype(np.float32)

jxs, jys, jts = jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ts)
jxi, jyi = jnp.asarray(xi), jnp.asarray(yi)
jtheta = jnp.asarray(theta)
jtrefs = jnp.asarray(t_refs)


def timeit(fn, *args, iters=20, rounds=3):
    out = fn(*args)  # compile
    float(jax.tree_util.tree_leaves(out)[0].sum())
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        acc = None
        for i in range(iters):
            out = fn(*args, seed=jnp.float32(i))
            leaf = jax.tree_util.tree_leaves(out)[0]
            acc = leaf.sum() if acc is None else acc + leaf.sum()
        float(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


# ---- path A: production two-kernel (warp kernel -> banded splat) ---------
tpu_splat.set_splat_impl("pallas_banded")


@jax.jit
def path_a(theta, seed=jnp.float32(0.0)):
    wx, wy = warp_events_multi_ref_coarse(
        theta + seed * 1e-9, jxs, jys, jts, jtrefs, (H, W)
    )
    return tpu_splat.splat_multi_ref(wx, wy, (H, W))


# ---- warp alone / splat alone (attribution) ------------------------------
@jax.jit
def warp_only(theta, seed=jnp.float32(0.0)):
    wx, wy = warp_events_multi_ref_coarse(
        theta + seed * 1e-9, jxs, jys, jts, jtrefs, (H, W)
    )
    return wx.sum() + wy.sum()


wx0, wy0 = jax.jit(
    lambda th: warp_events_multi_ref_coarse(th, jxs, jys, jts, jtrefs, (H, W))
)(jtheta)
wx0, wy0 = jnp.asarray(wx0), jnp.asarray(wy0)


@jax.jit
def splat_only(wx, wy, seed=jnp.float32(0.0)):
    return tpu_splat.splat_multi_ref(wx + seed * 1e-9, wy, (H, W))


# ---- path B: fused (velocities interp'd once, warp inside the kernel) ----
@jax.jit
def path_b(theta, seed=jnp.float32(0.0)):
    th = interp_theta_at_events(theta + seed * 1e-9, jxs, jys, (H, W))
    frames = []
    oks = []
    for r in range(N_REFS):
        f, ok = fused_warp_splat_frame(
            jxi, jyi, jts, th[:, 0], th[:, 1], t_refs[r], (H, W)
        )
        frames.append(f)
        oks.append(ok)
    return jnp.stack(frames), jnp.stack(oks)


# interp alone (the part path B keeps outside the kernel)
@jax.jit
def interp_only(theta, seed=jnp.float32(0.0)):
    return interp_theta_at_events(theta + seed * 1e-9, jxs, jys, (H, W)).sum()


# ---- path C: FULLY fused (interp + warp + splat all in-kernel) -----------
@jax.jit
def path_c(theta, seed=jnp.float32(0.0)):
    th = theta + seed * 1e-9
    frames = []
    oks = []
    for r in range(N_REFS):
        f, ok = fully_fused_warp_splat_frame(
            jxi, jyi, jts, th, t_refs[r], (H, W)
        )
        frames.append(f)
        oks.append(ok)
    return jnp.stack(frames), jnp.stack(oks)


frames_b, oks = path_b(jtheta)
assert bool(oks.all()), "fused banding invalid — bench void"
frames_a = path_a(jtheta)
err = float(jnp.max(jnp.abs(frames_a - frames_b)))
print(f"numeric agreement B (max abs): {err:.2e}", file=sys.stderr)
# identical math, identical inputs: must match to f32 accumulation noise —
# a silent mis-splat would otherwise still produce "valid" timings
assert err <= 1e-3, f"fused prototype disagrees: {err}"
frames_c, oks_c = path_c(jtheta)
assert bool(oks_c.all()), "fully-fused banding invalid — bench void"
err_c = float(jnp.max(jnp.abs(frames_a - frames_c)))
print(f"numeric agreement C (max abs): {err_c:.2e}", file=sys.stderr)
# path C's in-kernel f32 interp vs XLA HIGHEST interp shifts coordinates
# ~1e-5, occasionally flipping a round() and moving ~0.4 of one event's
# splat mass (measured 2e-1) — bound it at a few events' worth so a band
# bug (which drops thousands of mass) still fails loudly
assert err_c <= 2.0, f"fully-fused prototype grossly disagrees: {err_c}"

res = {
    "path_a_two_kernel_ms": round(timeit(path_a, jtheta), 3),
    "warp_only_ms": round(timeit(warp_only, jtheta), 3),
    "splat_only_ms": round(timeit(splat_only, wx0, wy0), 3),
    "interp_only_ms": round(timeit(interp_only, jtheta), 3),
    "path_b_fused_ms": round(timeit(path_b, jtheta), 3),
    "path_c_fully_fused_ms": round(timeit(path_c, jtheta), 3),
    "n_events": N,
    "n_refs": N_REFS,
}
import json

print(json.dumps(res))
