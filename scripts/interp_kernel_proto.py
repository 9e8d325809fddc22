"""Prototype: standalone Pallas kernel for coarse-grid theta interpolation.

The round-3 fused study rejected fusing the interp INTO the splat kernel
(it joined that kernel's issue-bound instruction stream); this measures the
un-tried variant: a DEDICATED interp kernel, so the (E, 16) bilinear weight
matrices and the (E, w*c) intermediate never round-trip HBM.

Iteration 2 lesson (measured): a per-subrow loop building (128, 128) weight
planes is 3x SLOWER than XLA (6.7 vs 2.0 ms) — issue-bound on thousands of
tiny ops. This version lays the whole chunk along lanes: weight planes are
(hp, CHUNK) with grid rows on SUBLANES, one (2*wp, hp) x (hp, CHUNK) MXU
dot serves both channels, and the per-event outputs are cross-sublane
reductions. Also measured here: Mosaic supports precision=HIGHEST in-kernel
and reproduces the XLA interp EXACTLY (0.0 max abs err at DSEC scale).

Run on the real TPU:  python scripts/interp_kernel_proto.py
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eincm_tpu.ops.warp import interp_theta_at_events, set_interp_impl

# this proto BENCHMARKS AGAINST the XLA path — without this the production
# default would route interp_theta_at_events to the landed Pallas kernel
# and the baseline would be the kernel itself
set_interp_impl("xla")


def _dot3(a, b, dims):
    """f32-accurate dot via 3-pass bf16 split."""
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    al = a - ah
    bh = b.astype(jnp.bfloat16).astype(jnp.float32)
    bl = b - bh
    d = lambda x, y: jax.lax.dot_general(
        x, y, dims, preferred_element_type=jnp.float32
    )
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _axis_weights(coords_row, n, npad, scale, ncols, norm=True, dtype=jnp.float32):
    """(npad, ncols) triangle weights of one axis, rows = grid indices."""
    u = (coords_row + 0.5) * scale - 0.5  # (1, ncols)
    k = jax.lax.broadcasted_iota(jnp.int32, (npad, ncols), 0).astype(jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(k - u))  # broadcast (1,nc)->(npad,nc)
    if npad > n:
        w = jnp.where(k < n, w, 0.0)
    if norm:
        w = w / jnp.maximum(jnp.sum(w, axis=0, keepdims=True), 1e-20)
    return w.astype(dtype)


def _fwd_kernel(
    xi_ref, yi_ref, th_ref, o0_ref, o1_ref, *, h, w, hp, wp, sh, sw, ck8, mode
):
    dims = (((1,), (0,)), ((), ()))
    norm = "nonorm" not in mode
    wdt = jnp.bfloat16 if "bf16" in mode else jnp.float32
    for r in range(8):
        uy = _axis_weights(yi_ref[r : r + 1, :], h, hp, sh, ck8, norm, wdt)
        vx = _axis_weights(xi_ref[r : r + 1, :], w, wp, sw, ck8, norm, wdt)
        if mode == "dot3":
            m = _dot3(th_ref[:], uy, dims)  # (2*wp, ck8)
        elif mode.startswith("highest"):
            m = jax.lax.dot_general(
                th_ref[:], uy, dims,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            m = jax.lax.dot_general(
                th_ref[:].astype(wdt), uy, dims,
                preferred_element_type=jnp.float32,
            )
        o0_ref[r, :] = jnp.sum(m[:wp, :] * vx.astype(jnp.float32), axis=0)
        o1_ref[r, :] = jnp.sum(m[wp:, :] * vx.astype(jnp.float32), axis=0)


def interp_pallas(theta, xs, ys, sensor_size, mode="highest", chunk=4096):
    h, w, c = theta.shape
    H, W = sensor_size
    assert c == 2 and h <= 128 and w <= 128
    hp = max(8, -(-h // 8) * 8)
    wp = max(8, -(-w // 8) * 8)
    assert chunk % (8 * 128) == 0
    ck8 = chunk // 8
    e = xs.shape[0]
    n_chunks = max(1, -(-e // chunk))
    pad = n_chunks * chunk - e
    xi = jnp.round(xs)
    yi = jnp.round(ys)
    if pad:
        fill = jnp.full((pad,), -1e4, jnp.float32)
        xi = jnp.concatenate([xi, fill])
        yi = jnp.concatenate([yi, fill])
    xi = xi.reshape(n_chunks * 8, ck8)
    yi = yi.reshape(n_chunks * 8, ck8)
    # (2*wp, hp): [theta0^T ; theta1^T], so one dot serves both channels
    thT = jnp.zeros((2 * wp, hp), jnp.float32)
    thT = thT.at[:w, :h].set(theta[..., 0].T).at[wp : wp + w, :h].set(
        theta[..., 1].T
    )
    kernel = partial(
        _fwd_kernel, h=h, w=w, hp=hp, wp=wp,
        sh=float(h) / H, sw=float(w) / W, ck8=ck8, mode=mode,
    )
    spec_ev = pl.BlockSpec((8, ck8), lambda i: (i, 0), memory_space=pltpu.VMEM)
    o0, o1 = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            spec_ev,
            spec_ev,
            pl.BlockSpec((2 * wp, hp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(spec_ev, spec_ev),
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks * 8, ck8), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks * 8, ck8), jnp.float32),
        ),
    )(xi, yi, thT)
    return jnp.stack([o0.reshape(-1)[:e], o1.reshape(-1)[:e]], axis=-1)


def main():
    H, W = 480, 640
    n_ev = 1_500_000
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.uniform(0, W - 1, n_ev).astype(np.float32))
    ys = jnp.asarray(rng.uniform(0, H - 1, n_ev).astype(np.float32))
    theta = jnp.asarray(rng.normal(0, 4, (16, 16, 2)).astype(np.float32))

    ref_fn = jax.jit(lambda t: interp_theta_at_events(t, xs, ys, (H, W)))
    ref = np.asarray(ref_fn(theta))

    variants = [
        ("highest", 65536),
        ("dot3", 65536),
    ]
    fns = {}
    for mode, chunk in variants:
        try:
            fn = jax.jit(
                lambda t, m=mode, ck=chunk: interp_pallas(
                    t, xs, ys, (H, W), mode=m, chunk=ck
                )
            )
            out = np.asarray(fn(theta))
        except Exception as exc:  # noqa: BLE001
            print(f"mode={mode} chunk={chunk}: FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:200]}")
            continue
        err = np.abs(out - ref)
        rel = err.max() / (np.abs(ref).max() + 1e-20)
        print(f"mode={mode} chunk={chunk}: max abs err {err.max():.3e} rel {rel:.3e}")
        fns[(mode, chunk)] = fn

    # INTERLEAVED A/B: alternate XLA / kernel rounds so relay drift hits
    # both sides equally; report per-side best-of-rounds.
    def one_round(f, iters=30):
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for i in range(iters):
            acc = acc + f(theta + i * 1e-6).sum()
        float(acc)
        return (time.perf_counter() - t0) / iters * 1e3

    sides = [("xla", ref_fn)] + [(str(k), f) for k, f in fns.items()]
    for _, f in sides:
        float(f(theta).sum())  # compile+sync
    best = {name: float("inf") for name, _ in sides}
    for _ in range(6):
        for name, f in sides:
            best[name] = min(best[name], one_round(f))
    for name, t in best.items():
        print(f"fwd {name}: {t:.3f} ms")

    # fwd+bwd comparison (XLA only has a bwd; kernel bwd not built yet —
    # this bounds the fwd-side gain available to the solve path)
    vg = jax.jit(jax.grad(lambda t: ref_fn(t).sum()))
    np.asarray(vg(theta))
    tb = min(one_round(vg) for _ in range(6))
    print(f"XLA interp fwd+bwd(grad): {tb:.3f} ms")


if __name__ == "__main__":
    main()
