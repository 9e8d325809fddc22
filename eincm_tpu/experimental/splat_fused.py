"""EXPERIMENTAL: fused warp+splat forward kernel (prototype, VERDICT r2 #8).

The production path computes warped coordinates in one kernel
(ops/warp.py `warp_events_multi_ref_coarse`: coarse-grid bilinear interp +
displacement) and splats them in another (ops/splat_banded.py), so the
(n_refs, E) warped coordinates round-trip HBM between the two. This
prototype generates the warped coordinates INSIDE the splat kernel grid —
per 128-lane subrow: cx = xi - thx*dt, cy = yi - thy*dt (2 FMAs/event) —
so they never exist in HBM. The per-event velocities (thx, thy) come from
the (cheap, MXU-friendly) coarse-grid interpolation, are t_ref-independent,
and are read once per ref instead of fresh warped coordinates per ref.

Row-banded configuration only (bc = padded width), no fallback cond tree:
this is a measurement vehicle, not a shipping path. Band starts/validity are
computed in XLA exactly like ops/splat_banded.py (the warped rows needed for
them fuse into a reduction without materializing the full array).

Measured (scripts/fused_splat_bench.py) — see docs/ARCHITECTURE.md roofline
section for the numbers and the resulting decision.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eincm_tpu.ops.splat_banded import (
    _a_max,
    _band_starts,
    _hpad,
    _row_stats,
    _wpad,
)
from eincm_tpu.ops.splat_pallas import _CHUNK, _LANES, _SUBROWS

_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _fused_fwd_kernel(
    r0_ref, tref_ref, xi_ref, yi_ref, ts_ref, thx_ref, thy_ref,
    out_ref, acc, cur_ref, sem, *, w, hw, n_zero_blocks, b, a_max,
):
    i = pl.program_id(0)

    def flush_block():
        cur = pl.multiple_of(cur_ref[0], b)
        dma = pltpu.make_async_copy(
            acc.at[pl.ds(0, b), :], out_ref.at[pl.ds(cur, b), :], sem
        )
        dma.start()
        dma.wait()

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        for k in range(n_zero_blocks):
            dma = pltpu.make_async_copy(
                acc.at[pl.ds(0, b), :], out_ref.at[pl.ds(k * b, b), :], sem
            )
            dma.start()
            dma.wait()
        cur_ref[0] = 0

    r0 = r0_ref[i, 0]
    t_ref = tref_ref[0]

    for _ in range(a_max):
        @pl.when(r0 > cur_ref[0] + b)
        def _adv():
            flush_block()
            acc[pl.ds(0, b), :] = acc[pl.ds(b, b), :]
            acc[pl.ds(b, b), :] = jnp.zeros((b, acc.shape[1]), jnp.float32)
            cur_ref[0] = cur_ref[0] + b

    off = r0 - cur_ref[0]
    base = r0.astype(jnp.float32)

    part = jnp.zeros((b, w), jnp.float32)
    gidx = base + jax.lax.broadcasted_iota(jnp.int32, (b, _LANES), 0).astype(
        jnp.float32
    )
    widx = jax.lax.broadcasted_iota(jnp.int32, (_LANES, w), 1).astype(
        jnp.float32
    )
    for j in range(_SUBROWS):
        # ---- the fused warp: 2 FMAs per event, no HBM round-trip ----
        dt = ts_ref[j, :] - t_ref
        cx = xi_ref[j, :] - thx_ref[j, :] * dt
        cy = yi_ref[j, :] - thy_ref[j, :] * dt
        ry = jnp.round(cy)
        rx = jnp.round(cx)
        qy = gidx - cy[None, :]
        uy = jnp.where(
            jnp.abs(gidx - ry[None, :]) <= (hw + 0.5),
            jnp.exp(-0.5 * qy * qy) * _INV_SQRT_2PI,
            0.0,
        )
        qx = widx - cx[:, None]
        vx = jnp.where(
            jnp.abs(widx - rx[:, None]) <= (hw + 0.5),
            jnp.exp(-0.5 * qx * qx) * _INV_SQRT_2PI,
            0.0,
        )
        part += jax.lax.dot_general(
            uy, vx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    off = pl.multiple_of(off, 8)
    acc[pl.ds(off, b), :] += part

    @pl.when(i == pl.num_programs(0) - 1)
    def _drain():
        flush_block()
        cur = pl.multiple_of(cur_ref[0] + b, b)
        dma = pltpu.make_async_copy(
            acc.at[pl.ds(b, b), :], out_ref.at[pl.ds(cur, b), :], sem
        )
        dma.start()
        dma.wait()


def _fully_fused_fwd_kernel(
    r0_ref, tref_ref, xi_ref, yi_ref, ts_ref, thxg_ref, thyg_ref,
    out_ref, acc, cur_ref, sem, *, w, w_real, h_real, hw, n_zero_blocks, b,
    a_max,
):
    """Forward splat with BOTH the coarse-grid interpolation and the warp
    computed in-kernel: inputs are raw (xi, yi, ts) plus the (ch, cw) theta
    grids; neither per-event velocities nor warped coordinates ever exist
    in HBM."""
    i = pl.program_id(0)
    ch = thxg_ref.shape[0]
    cw = thxg_ref.shape[1]

    def flush_block():
        cur = pl.multiple_of(cur_ref[0], b)
        dma = pltpu.make_async_copy(
            acc.at[pl.ds(0, b), :], out_ref.at[pl.ds(cur, b), :], sem
        )
        dma.start()
        dma.wait()

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        for k in range(n_zero_blocks):
            dma = pltpu.make_async_copy(
                acc.at[pl.ds(0, b), :], out_ref.at[pl.ds(k * b, b), :], sem
            )
            dma.start()
            dma.wait()
        cur_ref[0] = 0

    r0 = r0_ref[i, 0]
    t_ref = tref_ref[0]

    for _ in range(a_max):
        @pl.when(r0 > cur_ref[0] + b)
        def _adv():
            flush_block()
            acc[pl.ds(0, b), :] = acc[pl.ds(b, b), :]
            acc[pl.ds(b, b), :] = jnp.zeros((b, acc.shape[1]), jnp.float32)
            cur_ref[0] = cur_ref[0] + b

    off = r0 - cur_ref[0]
    base = r0.astype(jnp.float32)

    part = jnp.zeros((b, w), jnp.float32)
    gidx = base + jax.lax.broadcasted_iota(jnp.int32, (b, _LANES), 0).astype(
        jnp.float32
    )
    widx = jax.lax.broadcasted_iota(jnp.int32, (_LANES, w), 1).astype(
        jnp.float32
    )
    ky = jax.lax.broadcasted_iota(jnp.int32, (ch, _LANES), 0).astype(
        jnp.float32
    )
    kx = jax.lax.broadcasted_iota(jnp.int32, (cw, _LANES), 0).astype(
        jnp.float32
    )
    thxg = thxg_ref[:]
    thyg = thyg_ref[:]
    for j in range(_SUBROWS):
        xiv = xi_ref[j, :]
        yiv = yi_ref[j, :]
        # ---- in-kernel bilinear interp from the coarse grid ----
        # (matches ops/warp.py _bilinear_axis_weights exactly)
        uy = (yiv + 0.5) * (ch / h_real) - 0.5
        wyw = jnp.maximum(0.0, 1.0 - jnp.abs(ky - uy[None, :]))  # (ch, 128)
        wyw = wyw / jnp.maximum(jnp.sum(wyw, axis=0, keepdims=True), 1e-20)
        ux = (xiv + 0.5) * (cw / w_real) - 0.5
        wxw = jnp.maximum(0.0, 1.0 - jnp.abs(kx - ux[None, :]))  # (cw, 128)
        wxw = wxw / jnp.maximum(jnp.sum(wxw, axis=0, keepdims=True), 1e-20)
        tmpx = jax.lax.dot_general(  # (cw, 128) = thxg^T @ Wy
            thxg, wyw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        tmpy = jax.lax.dot_general(
            thyg, wyw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        thx = jnp.sum(wxw * tmpx, axis=0)  # (128,)
        thy = jnp.sum(wxw * tmpy, axis=0)
        # ---- in-kernel warp ----
        dt = ts_ref[j, :] - t_ref
        cx = xiv - thx * dt
        cy = yiv - thy * dt
        # ---- band-weight splat (identical to the banded kernel) ----
        ry = jnp.round(cy)
        rx = jnp.round(cx)
        qy = gidx - cy[None, :]
        uy2 = jnp.where(
            jnp.abs(gidx - ry[None, :]) <= (hw + 0.5),
            jnp.exp(-0.5 * qy * qy) * _INV_SQRT_2PI,
            0.0,
        )
        qx = widx - cx[:, None]
        vx = jnp.where(
            jnp.abs(widx - rx[:, None]) <= (hw + 0.5),
            jnp.exp(-0.5 * qx * qx) * _INV_SQRT_2PI,
            0.0,
        )
        part += jax.lax.dot_general(
            uy2, vx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    off = pl.multiple_of(off, 8)
    acc[pl.ds(off, b), :] += part

    @pl.when(i == pl.num_programs(0) - 1)
    def _drain():
        flush_block()
        cur = pl.multiple_of(cur_ref[0] + b, b)
        dma = pltpu.make_async_copy(
            acc.at[pl.ds(b, b), :], out_ref.at[pl.ds(cur, b), :], sem
        )
        dma.start()
        dma.wait()


def fully_fused_warp_splat_frame(
    xi: jax.Array,
    yi: jax.Array,
    ts: jax.Array,
    theta: jax.Array,
    t_ref,
    sensor_size: Tuple[int, int],
    window_size: int = 3,
    b: int = 128,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Forward IWE for ONE reference time with interp + warp + splat in one
    kernel. Band starts come from conservative per-chunk bounds (bilinear
    interp is a convex combination, so per-event velocity is bounded by the
    grid's min/max), so no per-event warped array is needed anywhere.

    Returns (frame (H, W), ok () bool); no fallback (prototype)."""
    H, W = sensor_size
    hw = window_size // 2
    hpad = _hpad(H, b)
    wpad = _wpad(W)

    arrs, n_chunks = _pad_to_chunks(
        [
            xi.astype(jnp.float32),
            yi.astype(jnp.float32),
            ts.astype(jnp.float32),
        ],
        [jnp.nan, jnp.nan, 0.0],
        _CHUNK,
    )
    # conservative per-chunk warped-row interval from raw rows + the theta
    # grid's velocity bounds: warped_y in [ymin - smax, ymax - smin] where
    # s = thy * (t - t_ref) over the chunk's time range
    yr = arrs[1].reshape(n_chunks, _CHUNK)
    tr = arrs[2].reshape(n_chunks, _CHUNK)
    finite = jnp.isfinite(yr)
    big = jnp.float32(1e9)
    ymin = jnp.min(jnp.where(finite, yr, big), axis=1)
    ymax = jnp.max(jnp.where(finite, yr, -big), axis=1)
    any_f = jnp.any(finite, axis=1)
    tmin = jnp.min(jnp.where(finite, tr, big), axis=1) - t_ref
    tmax = jnp.max(jnp.where(finite, tr, -big), axis=1) - t_ref
    thy_min = jnp.min(theta[..., 1])
    thy_max = jnp.max(theta[..., 1])
    s_cands = jnp.stack(
        [thy_min * tmin, thy_min * tmax, thy_max * tmin, thy_max * tmax]
    )
    smin = jnp.min(s_cands, axis=0)
    smax = jnp.max(s_cands, axis=0)
    # +0.5 slack: the kernel splats around round(cy), which can move the
    # center up to half a row beyond the unrounded interval (and
    # _band_starts truncates the fractional rmax, erasing sub-row slack) —
    # without it boundary-row splat mass is silently dropped with ok=True
    top = jnp.clip(ymax - smin + hw + 0.5, 0, H - 1)
    bot = jnp.clip(ymin - smax - hw - 0.5, 0, H - 1)
    # synthesize 2-pseudo-event row stats per chunk and reuse the banded
    # kernel's band-start/validity machinery
    inside = jnp.stack([any_f, any_f], axis=1)
    lo_eff = jnp.stack([bot, bot], axis=1)
    hi_eff = jnp.stack([top, top], axis=1)
    rmax = jnp.where(any_f, top, -big)
    stats = (inside, lo_eff, hi_eff, rmax, any_f)
    r0, ok = _band_starts(stats, H, b)
    r0c0 = jnp.stack([r0, jnp.zeros_like(r0)], axis=1)

    kernel = partial(
        _fully_fused_fwd_kernel,
        w=wpad,
        w_real=W,
        h_real=H,
        hw=hw,
        n_zero_blocks=hpad // b,
        b=b,
        a_max=_a_max(H, b),
    )
    spec_ev = pl.BlockSpec(
        (_SUBROWS, _LANES),
        lambda i, r0_ref, tref_ref: (i, 0),
        memory_space=pltpu.VMEM,
    )
    ch, cw = theta.shape[0], theta.shape[1]
    spec_grid = pl.BlockSpec(
        (ch, cw),
        lambda i, r0_ref, tref_ref: (0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[spec_ev] * 3 + [spec_grid] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2 * b, wpad), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hpad, wpad), jnp.float32),
        interpret=interpret,
    )(
        r0c0,
        jnp.asarray([t_ref], jnp.float32),
        *arrs,
        theta[..., 0].astype(jnp.float32),
        theta[..., 1].astype(jnp.float32),
    )
    return out[:H, :W], ok


def _pad_to_chunks(arrs, fill_vals, chunk):
    n = arrs[0].shape[0]
    n_chunks = max(1, -(-n // chunk))
    pad = n_chunks * chunk - n
    out = []
    for a, f in zip(arrs, fill_vals):
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), f, a.dtype)])
        out.append(a.reshape(n_chunks * _SUBROWS, _LANES))
    return out, n_chunks


def fused_warp_splat_frame(
    xi: jax.Array,
    yi: jax.Array,
    ts: jax.Array,
    thx: jax.Array,
    thy: jax.Array,
    t_ref,
    sensor_size: Tuple[int, int],
    window_size: int = 3,
    b: int = 128,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Forward IWE for ONE reference time with in-kernel warping.

    Args:
        xi, yi: rounded integer event coordinates (float dtype).
        ts: event timestamps.
        thx, thy: per-event velocities (from `interp_theta_at_events`).
        t_ref: scalar reference time.

    Returns:
        (frame (H, W), ok () bool) — `ok` is the banding validity flag;
        the prototype does NOT fall back (measurement vehicle only).
    """
    H, W = sensor_size
    hw = window_size // 2
    hpad = _hpad(H, b)
    wpad = _wpad(W)

    # band starts from the warped rows; the elementwise warp fuses into the
    # per-chunk reductions (XLA), no (E,) warped array is materialized
    wy = yi - thy * (ts - t_ref)
    (arrs, n_chunks) = _pad_to_chunks(
        [
            xi.astype(jnp.float32),
            yi.astype(jnp.float32),
            ts.astype(jnp.float32),
            thx.astype(jnp.float32),
            thy.astype(jnp.float32),
        ],
        [jnp.nan, jnp.nan, 0.0, 0.0, 0.0],
        _CHUNK,
    )
    wy_pad = jnp.concatenate(
        [
            wy.astype(jnp.float32),
            jnp.full((n_chunks * _CHUNK - wy.shape[0],), jnp.nan, jnp.float32),
        ]
    ).reshape(n_chunks, _CHUNK)
    stats = _row_stats(wy_pad, H, hw)
    r0, ok = _band_starts(stats, H, b)
    r0c0 = jnp.stack([r0, jnp.zeros_like(r0)], axis=1)

    kernel = partial(
        _fused_fwd_kernel,
        w=wpad,
        hw=hw,
        n_zero_blocks=hpad // b,
        b=b,
        a_max=_a_max(H, b),
    )
    spec_ev = pl.BlockSpec(
        (_SUBROWS, _LANES),
        lambda i, r0_ref, tref_ref: (i, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[spec_ev] * 5,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2 * b, wpad), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hpad, wpad), jnp.float32),
        interpret=interpret,
    )(r0c0, jnp.asarray([t_ref], jnp.float32), *arrs)
    return out[:H, :W], ok
