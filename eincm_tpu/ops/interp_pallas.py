"""Pallas kernel for coarse-grid theta interpolation at event coordinates.

Computes the same quantity as the XLA path in `ops/warp.py:
interp_theta_at_events` — per-event bilinear samples of the coarse (h, w, 2)
theta grid, `scale_and_translate(method='bilinear')` semantics (reference
counterpart: gather from the materialized full-sensor field,
src/eincm/event_warpers.py:6-37 + src/utils/theta_utils.py upsampling) —
but keeps the (E, h)/(E, w) triangle-weight matrices and the (E, w*c)
intermediate in VMEM instead of round-tripping them through HBM.

Measured at DSEC scale (1.5M events, 16x16 grid, real TPU v5e, interleaved
A/B, round 3): forward 1.43-1.48 ms vs 1.62 ms XLA (~10%), and the XLA
BACKWARD (grad wrt theta) costs 3.2 ms on top of its forward — the
transpose contraction re-reads the saved (E, 16) weight matrices from HBM —
while the kernel backward rebuilds the weights in VMEM and contracts with a
lane-dim K, landing fwd+bwd at ~2.9 ms vs ~4.9 ms.

Layout (iteration-2 lesson, scripts/interp_kernel_proto.py): a per-subrow
loop over (128-lane) rows building (128, 128) weight planes is 3x SLOWER
than XLA — issue-bound on thousands of small ops. Here each grid step takes
an (8, ck8) block of events (chunk = 8*ck8), loops the 8 sublane rows, and
builds (hp, ck8)/(wp, ck8) weight planes with grid indices on SUBLANES —
wide-lane vector ops, and one (2*wp, hp) x (hp, ck8) MXU dot serves both
velocity channels. `precision=HIGHEST` inside the kernel reproduces the
XLA path to ~4e-8 relative (Mosaic supports the 6-pass f32 emulation).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Events per grid step. Bigger chunks amortize grid-step overhead; VMEM use
# at 65536 (blocks + two weight planes + the dot intermediate, double
# buffered) stays under ~8 MB for solver-sized grids. 4k/16k/64k all
# measured within noise at DSEC scale; 64k has the fewest grid steps.
# `_prep_events` shrinks the chunk when the per-iteration weight planes
# ((hp, ck8) + (wp, ck8) + the (2wp, ck8) intermediate) would overflow the
# VMEM budget — at the gate's h = w = 128 ceiling the planes are 32x a
# 16x16 grid's. (Production 16x16 grids keep the full 64k chunk.)
_CHUNK = 65_536
_SUBL = 8
_PLANE_VMEM_BUDGET = 6 * 1024 * 1024  # bytes
# NOTE (round 3, measured): fusing the two per-axis weight normalizations
# into one 1/max(su*sv, eps) multiply on the outputs/cotangents — two fewer
# plane-wide divides per subrow — is a NO-WIN on hardware (fwd 3.05 vs
# 3.08 ms, bwd slightly worse; grad maxrel 5.7e-7): this kernel is
# issue-bound like the splat kernel, not VPU-op-count-bound. Keep the
# per-axis normalization (it matches ops/warp.py association exactly).

_HIGHEST = jax.lax.Precision.HIGHEST

# Far-off-sensor fill for chunk padding: weights come out identically zero
# (guarded normalization), so padded events contribute nothing to the
# forward rows (discarded anyway) nor to the backward dtheta accumulation.
# NaN would poison dtheta (NaN * zero cotangent); see loss._sanitize_events.
_PAD_FILL = -1e4


def _axis_weights(coords_row, n, npad, scale, ncols):
    """(npad, ncols) normalized triangle weights; rows = coarse grid index.

    Matches `ops/warp.py:_bilinear_axis_weights` exactly (same constants,
    same f32 elementwise ops, <= 2 adjacent nonzeros per event so the
    normalizing sum is order-exact); rows k >= n are masked before the
    normalization, mirroring the XLA path's implicit [0, n) support.
    """
    u = (coords_row + 0.5) * scale - 0.5  # (1, ncols)
    k = jax.lax.broadcasted_iota(jnp.int32, (npad, ncols), 0).astype(
        jnp.float32
    )
    w = jnp.maximum(0.0, 1.0 - jnp.abs(k - u))
    if npad > n:
        w = jnp.where(k < n, w, 0.0)
    return w / jnp.maximum(jnp.sum(w, axis=0, keepdims=True), 1e-20)


def _fwd_kernel(
    xi_ref, yi_ref, th_ref, o0_ref, o1_ref, *, h, w, hp, wp, sh, sw, ck8
):
    dims = (((1,), (0,)), ((), ()))
    for r in range(_SUBL):
        uy = _axis_weights(yi_ref[r : r + 1, :], h, hp, sh, ck8)  # (hp, ck8)
        vx = _axis_weights(xi_ref[r : r + 1, :], w, wp, sw, ck8)  # (wp, ck8)
        # (2*wp, ck8): rows [0, wp) = channel 0, [wp, 2wp) = channel 1
        m = jax.lax.dot_general(
            th_ref[:], uy, dims,
            preferred_element_type=jnp.float32, precision=_HIGHEST,
        )
        o0_ref[r, :] = jnp.sum(m[:wp, :] * vx, axis=0)
        o1_ref[r, :] = jnp.sum(m[wp:, :] * vx, axis=0)


def _bwd_kernel(
    xi_ref, yi_ref, g0_ref, g1_ref, out_ref, acc, *, h, w, hp, wp, sh, sw, ck8
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    # contract over events (lanes): (2*wp, ck8) x (hp, ck8) -> (2*wp, hp)
    dims = (((1,), (1,)), ((), ()))
    for r in range(_SUBL):
        uy = _axis_weights(yi_ref[r : r + 1, :], h, hp, sh, ck8)
        vx = _axis_weights(xi_ref[r : r + 1, :], w, wp, sw, ck8)
        rhs = jnp.concatenate(
            [vx * g0_ref[r : r + 1, :], vx * g1_ref[r : r + 1, :]], axis=0
        )  # (2*wp, ck8)
        acc[:, :] += jax.lax.dot_general(
            rhs, uy, dims,
            preferred_element_type=jnp.float32, precision=_HIGHEST,
        )

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        out_ref[:, :] = acc[:, :]


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _prep_events(xs, ys, chunk, hp, wp):
    """Round, pad with the off-sensor fill, lay out as (n_chunks*8, ck8)."""
    e = xs.shape[0]
    # cap the lane width so (hp + 3*wp) f32 plane rows fit the VMEM budget
    max_ck8 = _PLANE_VMEM_BUDGET // (4 * (hp + 3 * wp))
    max_ck8 = max(128, (max_ck8 // 128) * 128)
    chunk = min(chunk, max_ck8 * _SUBL, _round_up(max(e, 1), 1024))
    ck8 = chunk // _SUBL
    n_chunks = max(1, -(-e // chunk))
    pad = n_chunks * chunk - e
    xi = jnp.round(xs.astype(jnp.float32))
    yi = jnp.round(ys.astype(jnp.float32))
    if pad:
        fill = jnp.full((pad,), _PAD_FILL, jnp.float32)
        xi = jnp.concatenate([xi, fill])
        yi = jnp.concatenate([yi, fill])
    shape = (n_chunks * _SUBL, ck8)
    return xi.reshape(shape), yi.reshape(shape), n_chunks, ck8


def _theta_planes(theta, hp, wp):
    """(2*wp, hp) operand: [theta0^T ; theta1^T], zero padded."""
    h, w, _ = theta.shape
    thT = jnp.zeros((2 * wp, hp), jnp.float32)
    return (
        thT.at[:w, :h]
        .set(theta[..., 0].T.astype(jnp.float32))
        .at[wp : wp + w, :h]
        .set(theta[..., 1].T.astype(jnp.float32))
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def interp_theta_at_events_pallas(
    theta: jax.Array,
    xs: jax.Array,
    ys: jax.Array,
    sensor_size: Tuple[int, int],
    interpret: bool = False,
) -> jax.Array:
    """Per-event coarse-theta bilinear sample -> (E, 2), f32, on the MXU/VPU.

    Drop-in for the XLA `interp_theta_at_events` when theta is f32 with
    h, w <= 128 and c == 2 (every solver pyramid level qualifies). Gradients
    flow to theta only; event coordinates enter through round() and carry
    zero cotangent, exactly like the XLA path.
    """
    out, _ = _interp_fwd(theta, xs, ys, sensor_size, interpret)
    return out


def _interp_fwd(theta, xs, ys, sensor_size, interpret):
    h, w, c = theta.shape
    H, W = sensor_size
    assert c == 2 and h <= 128 and w <= 128, (h, w, c)
    hp = max(8, _round_up(h, 8))
    wp = max(8, _round_up(w, 8))
    e = xs.shape[0]
    xi, yi, n_chunks, ck8 = _prep_events(xs, ys, _CHUNK, hp, wp)
    thT = _theta_planes(theta, hp, wp)
    kernel = partial(
        _fwd_kernel, h=h, w=w, hp=hp, wp=wp,
        sh=float(h) / H, sw=float(w) / W, ck8=ck8,
    )
    spec_ev = pl.BlockSpec(
        (_SUBL, ck8), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    o0, o1 = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            spec_ev,
            spec_ev,
            pl.BlockSpec(
                (2 * wp, hp), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(spec_ev, spec_ev),
        out_shape=(
            jax.ShapeDtypeStruct(xi.shape, jnp.float32),
            jax.ShapeDtypeStruct(xi.shape, jnp.float32),
        ),
        interpret=interpret,
    )(xi, yi, thT)
    out = jnp.stack([o0.reshape(-1)[:e], o1.reshape(-1)[:e]], axis=-1)
    return out.astype(theta.dtype), (theta, xs, ys)


def _interp_bwd(sensor_size, interpret, res, g):
    theta, xs, ys = res
    h, w, _ = theta.shape
    H, W = sensor_size
    hp = max(8, _round_up(h, 8))
    wp = max(8, _round_up(w, 8))
    e = xs.shape[0]
    xi, yi, n_chunks, ck8 = _prep_events(xs, ys, _CHUNK, hp, wp)
    g = g.astype(jnp.float32)
    pad = xi.size - e
    g0 = jnp.concatenate([g[:, 0], jnp.zeros((pad,), jnp.float32)])
    g1 = jnp.concatenate([g[:, 1], jnp.zeros((pad,), jnp.float32)])
    g0 = g0.reshape(xi.shape)
    g1 = g1.reshape(xi.shape)
    kernel = partial(
        _bwd_kernel, h=h, w=w, hp=hp, wp=wp,
        sh=float(h) / H, sw=float(w) / W, ck8=ck8,
    )
    spec_ev = pl.BlockSpec(
        (_SUBL, ck8), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    dthT = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[spec_ev, spec_ev, spec_ev, spec_ev],
        out_specs=pl.BlockSpec(
            (2 * wp, hp), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * wp, hp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * wp, hp), jnp.float32)],
        interpret=interpret,
    )(xi, yi, g0, g1)
    dtheta = jnp.stack(
        [dthT[:w, :h].T, dthT[wp : wp + w, :h].T], axis=-1
    ).astype(theta.dtype)
    return dtheta, jnp.zeros_like(xs), jnp.zeros_like(ys)


interp_theta_at_events_pallas.defvjp(_interp_fwd, _interp_bwd)
