"""Row-banded Pallas splat with scalar-prefetched band offsets.

The full-height Pallas kernel (ops/splat_pallas.py) contracts every event
chunk against the whole (H, W) frame: H*W MACs per event. When events arrive
sorted by (unwarped) sensor row, a chunk's *warped* rows span a narrow range,
so the contraction only needs a B-row band anchored per chunk:

    MACs/event: B*W   vs   H*W    (7.5x fewer at DSEC scale, B=64, H=480)

Design (TODO.md round-1 item, landed round 2; adaptive B landed later):
  - per-chunk band start rows r0 (8-aligned) are computed in XLA from the
    warped coordinates and passed as a scalar-prefetch argument;
  - the kernel keeps a 2B-row sliding accumulator in VMEM; the band's
    (B, W) partial products land at a dynamic 8-aligned sublane offset;
  - as the window advances (B-aligned), finished rows are DMA-flushed to the
    HBM-resident output (memory_space=ANY) — each output block is written
    exactly once, plus a step-0 zeroing pass, so no scatter/accumulate in
    HBM is ever needed;
  - the backward kernel DMAs the needed (B, W) slab of the cotangent into
    VMEM per chunk (skipped when consecutive chunks share a band);
  - the band height is adaptive: candidates _ROW_BANDS are validated in XLA
    narrowest-first (the VPU band-weight construction, the kernel's measured
    bottleneck, scales with B + BC per event), and band starts need NOT be
    monotone — they may regress up to B rows below the running maximum,
    which is exactly what the 2B sliding window tolerates. Row flushes stay
    write-once because no later chunk's band may start below the slid-past
    rows (validity-checked).

Correctness is guarded, not assumed: the wrapper checks per event that every
in-sensor splat row falls inside its chunk's band and that band starts never
regress below the kernel's sliding-window floor; if violated (unsorted
events, extreme vertical flow) it falls back to a taller band and finally
the full-height kernel via lax.cond. Semantics match `events_to_pdf_frame`
exactly (drop at every sensor edge).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eincm_tpu.ops.splat_pallas import (
    _CHUNK,
    _LANES,
    _SUBROWS,
    _pad_chunks,
    events_to_pdf_frame_pallas,
)

_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)

# Band-row candidates, narrowest (cheapest) first. Each is a sliding-window
# advance quantum; all must be multiples of 8 (sublane alignment).
# MEASURED (DSEC scale, real TPU): a 64-row candidate is NOT faster than 128
# (fwd 4.82 vs 4.76 ms, bwd 9.07 vs 8.90) — the kernel is not bound by the
# row-band weight construction, so narrower rows only buy compile time and
# earlier fallbacks. Do not re-add 64 without new evidence.
_ROW_BANDS = (128,)
# Staging row-tile height (data/staging.py tile_sort_events): half the
# narrowest band so the remaining rows absorb the warp-induced row spread.
_TILE_H = _ROW_BANDS[0] // 2
# ALIGNED column band width candidates (used with tile-sorted staging).
# Aligned band starts must be 128-lane-aligned for the VMEM accumulator
# slice, so an aligned candidate only validates when every chunk's splat
# columns fit inside one aligned bc-wide window — which makes 256 the
# narrowest useful ALIGNED width (any chunk straddling an alignment
# boundary kills a 128 candidate).
_BCS = (256,)
# The UNALIGNED narrow band sidesteps the alignment floor: each chunk
# contracts against a 128-wide band starting at ANY column c0 (validity =
# spread <= 128, no alignment slack), accumulates its (B, 128) partial
# normally, and a per-CHUNK epilogue places it into the aligned 256-wide
# accumulator window through a one-hot shift matrix on the MXU. This halves
# both the column-weight VPU work AND the per-subrow MXU tile count
# relative to bc=256; the epilogue costs ~one extra subrow per chunk.
# MEASURED (DSEC scale): fwd 4.41 vs 4.54 ms, bwd flat — so the kernel is
# bound by neither term (every structural lever tried — B, bc, chunk size,
# MXU tiles — moves it <5%). Kept for the small win and because it
# validates under any spread <= 128 regardless of alignment straddle.
_BCU = 128


def _hpad(h: int, b: int) -> int:
    # one spare block above the sensor so the final 2B flush stays in range
    return (-(-h // b) + 1) * b


def _wpad(w: int) -> int:
    # DMA slabs require lane-dimension alignment to 128
    return -(-w // _LANES) * _LANES


def _a_max(h: int, b: int) -> int:
    # max window advances per chunk: enough to jump from cur=0 to the
    # highest reachable cur = hpad - 3b (so ok_adv below never fires for
    # sorted data of any row distribution)
    return max(1, (_hpad(h, b) - 3 * b) // b)


# --------------------------------------------------------------------- fwd


def _fwd_kernel(
    r0_ref, wx_ref, wy_ref, out_ref, acc, cur_ref, sem, *, w, hw, n_zero_blocks, bc, b, a_max, unaligned=False
):
    """Forward splat over a (b, bc) band per chunk.

    `bc == w` is the row-banded configuration (column offsets are all zero);
    `bc < w` additionally restricts the columns to a band whose start
    arrives with the row offsets in the prefetched (n, 2) array — valid
    when events are tile-sorted (data/staging.py tile_sort_events). With
    `unaligned` the start is an arbitrary column (bc == 128) and the
    accumulated partial is shifted into the aligned 256-wide accumulator
    window by a one-hot matmul once per chunk.
    """
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
        # zero the whole HBM output by flushing the (zero) band over it
        for k in range(n_zero_blocks):
            dma = pltpu.make_async_copy(
                acc.at[pl.ds(0, b), :],
                out_ref.at[pl.ds(k * b, b), :],
                sem,
            )
            dma.start()
            dma.wait()
        cur_ref[0] = 0

    r0 = r0_ref[i, 0]
    c0 = r0_ref[i, 1]

    # advance the sliding window (at most a_max b-row steps per chunk)
    for _ in range(a_max):
        @pl.when(r0 > cur_ref[0] + b)
        def _adv():
            flush_block()
            acc[pl.ds(0, b), :] = acc[pl.ds(b, b), :]
            acc[pl.ds(b, b), :] = jnp.zeros((b, acc.shape[1]), jnp.float32)
            cur_ref[0] = cur_ref[0] + b

    off = r0 - cur_ref[0]  # in [0, b], multiple of 8
    base = r0.astype(jnp.float32)
    cbase = c0.astype(jnp.float32)

    part = jnp.zeros((b, bc), jnp.float32)
    gidx = base + jax.lax.broadcasted_iota(jnp.int32, (b, _LANES), 0).astype(
        jnp.float32
    )
    widx = cbase + jax.lax.broadcasted_iota(jnp.int32, (_LANES, bc), 1).astype(
        jnp.float32
    )
    for j in range(_SUBROWS):
        cy = wy_ref[j, :]
        cx = wx_ref[j, :]
        ry = jnp.round(cy)
        rx = jnp.round(cx)
        # U^T: (b, 128) weights for global rows [r0, r0 + b)
        qy = gidx - cy[None, :]
        uy = jnp.where(
            jnp.abs(gidx - ry[None, :]) <= (hw + 0.5),
            jnp.exp(-0.5 * qy * qy) * _INV_SQRT_2PI,
            0.0,
        )
        # V: (128, bc) weights for global cols [c0, c0 + bc)
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
    off = pl.multiple_of(off, 8)  # r0 is 8-aligned, cur is b-aligned
    if unaligned:
        # place the (b, 128) partial at unaligned column c0 inside the
        # aligned [calign, calign + 256) window: part256 = part @ E with
        # E[i, j] = 1[j == i + shift] (one extra MXU pass per CHUNK)
        calign = jnp.minimum((c0 // _LANES) * _LANES, w - 2 * _LANES)
        shift = c0 - calign  # in [0, 128]
        ei = jax.lax.broadcasted_iota(jnp.int32, (bc, 2 * _LANES), 0)
        ej = jax.lax.broadcasted_iota(jnp.int32, (bc, 2 * _LANES), 1)
        emb = (ej == ei + shift).astype(jnp.float32)  # (128, 256)
        part256 = jax.lax.dot_general(
            part, emb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        coff = pl.multiple_of(calign, _LANES)
        acc[pl.ds(off, b), pl.ds(coff, 2 * _LANES)] += part256
    elif bc == w:
        acc[pl.ds(off, b), :] += part
    else:
        coff = pl.multiple_of(c0, _LANES)
        acc[pl.ds(off, b), pl.ds(coff, bc)] += part

    @pl.when(i == pl.num_programs(0) - 1)
    def _drain():
        flush_block()
        cur = pl.multiple_of(cur_ref[0] + b, b)
        dma = pltpu.make_async_copy(
            acc.at[pl.ds(b, b), :], out_ref.at[pl.ds(cur, b), :], sem
        )
        dma.start()
        dma.wait()


def _row_stats(wy_r: jax.Array, h: int, hw: int):
    """Shared per-chunk row statistics for band-start candidates (XLA)."""
    ry = jnp.round(wy_r)
    row_lo = ry - hw
    row_hi = ry + hw
    inside = jnp.isfinite(ry) & (row_hi >= 0) & (row_lo <= h - 1)

    big = jnp.float32(1e9)
    lo_eff = jnp.maximum(row_lo, 0)
    hi_eff = jnp.minimum(row_hi, jnp.float32(h - 1))
    rmax = jnp.max(jnp.where(inside, hi_eff, -big), axis=1)
    any_inside = jnp.any(inside, axis=1)
    return inside, lo_eff, hi_eff, rmax, any_inside


def _band_starts(row_stats, h: int, b: int):
    """Per-chunk 8-aligned band starts + validity flag for band height b.

    Band starts anchor each chunk at its TOP in-sensor row (r0 >= rmax-(b-1),
    ceil to 8). They need not be monotone: the kernel's sliding window only
    requires r0 >= cur, where cur is the running window floor it would reach
    (the smallest b-multiple >= running_max(r0) - b). Chunks with no
    in-sensor event inherit the running max so they never constrain cur.

    Returns:
        (r0 (n_chunks,) int32, ok () bool)
    """
    inside, lo_eff, hi_eff, rmax, any_inside = row_stats
    hpad = _hpad(h, b)
    r0 = jnp.clip(rmax - (b - 1), 0, hpad - 2 * b)
    r0 = -(-r0.astype(jnp.int32) // 8) * 8  # ceil to 8
    m = jax.lax.cummax(jnp.where(any_inside, r0, 0))
    r0 = jnp.where(any_inside, r0, m)  # empty chunks ride the window

    # the kernel's window floor after each chunk: smallest b-multiple
    # placing the chunk's band inside [cur, cur + 2b)
    cur = jnp.maximum(jnp.int32(0), -(-(m - b) // b) * b)
    # a regressed chunk may anchor anywhere in [cur, its lowest row]: lift
    # it to the window floor (never triggers an advance, so the cur
    # trajectory is unchanged) and let the coverage check below decide
    r0 = jnp.maximum(r0, cur)

    # every in-sensor splat row must fall inside its chunk's band (bands
    # never start below rows the window has already flushed: r0 >= cur)
    r0f = r0.astype(jnp.float32)[:, None]
    ok_rows = jnp.all(
        jnp.where(inside, (lo_eff >= r0f) & (hi_eff < r0f + b), True)
    )
    # window advance per chunk bounded by the kernel's unrolled a_max
    prev = jnp.concatenate([jnp.zeros((1,), cur.dtype), cur[:-1]])
    ok_adv = jnp.all((cur - prev) <= _a_max(h, b) * b)
    return r0, ok_rows & ok_adv


def _col_starts(wx_r: jax.Array, w: int, hw: int, wpad: int, bcs):
    """Per-chunk 128-aligned column-band starts + validity flags (XLA).

    Unlike rows, columns need no sliding window (the accumulator spans the
    full width) — c0 is absolute per chunk. A candidate width `bc` is valid
    when tile-sorted staging keeps every chunk's in-sensor splat columns
    inside one bc-wide band.

    Returns:
        (c0s (n_chunks, len(bcs)) int32, oks (len(bcs),) bool)
    """
    rx = jnp.round(wx_r)
    col_lo = rx - hw
    col_hi = rx + hw
    inside = jnp.isfinite(rx) & (col_hi >= 0) & (col_lo <= w - 1)

    big = jnp.float32(1e9)
    cmin = jnp.min(jnp.where(inside, col_lo, big), axis=1)
    lo_eff = jnp.maximum(col_lo, 0)
    hi_eff = jnp.minimum(col_hi, jnp.float32(w - 1))

    c0s, oks = [], []
    for bc in bcs:
        c0 = jnp.clip(cmin, 0, wpad - bc)
        c0 = (c0 / _LANES).astype(jnp.int32) * _LANES
        c0f = c0.astype(jnp.float32)[:, None]
        oks.append(
            jnp.all(
                jnp.where(inside, (lo_eff >= c0f) & (hi_eff < c0f + bc), True)
            )
        )
        c0s.append(c0)
    return jnp.stack(c0s, axis=1), jnp.stack(oks)


def _col_starts_unaligned(wx_r: jax.Array, w: int, hw: int, wpad: int):
    """Per-chunk UNALIGNED 128-wide column-band starts + validity (XLA).

    Validity only needs each chunk's in-sensor splat columns to span at
    most 128 columns — no alignment slack; the kernel's shift-matrix
    epilogue handles the aligned-accumulator placement. Empty chunks get
    c0 = 0 and contribute nothing.
    """
    rx = jnp.round(wx_r)
    col_lo = rx - hw
    col_hi = rx + hw
    inside = jnp.isfinite(rx) & (col_hi >= 0) & (col_lo <= w - 1)

    big = jnp.float32(1e9)
    cmin = jnp.min(jnp.where(inside, jnp.maximum(col_lo, 0), big), axis=1)
    lo_eff = jnp.maximum(col_lo, 0)
    hi_eff = jnp.minimum(col_hi, jnp.float32(w - 1))

    c0 = jnp.clip(cmin, 0, wpad - _BCU).astype(jnp.int32)
    c0 = jnp.where(jnp.any(inside, axis=1), c0, 0)
    c0f = c0.astype(jnp.float32)[:, None]
    ok = jnp.all(
        jnp.where(inside, (lo_eff >= c0f) & (hi_eff < c0f + _BCU), True)
    )
    return c0, ok


def _banded_fwd_call(xs, ys, r0c0, sensor_size, window_size, b, bc, unaligned=False, interpret=False):
    H, W = sensor_size
    hw = window_size // 2
    hpad = _hpad(H, b)
    wpad = _wpad(W)
    xsr, ysr, n_chunks = _pad_chunks(xs, ys, _CHUNK)
    xsr = xsr.reshape(n_chunks * _SUBROWS, _LANES)
    ysr = ysr.reshape(n_chunks * _SUBROWS, _LANES)

    kernel = partial(
        _fwd_kernel,
        w=wpad,
        hw=hw,
        n_zero_blocks=hpad // b,
        bc=bc,
        b=b,
        a_max=_a_max(H, b),
        unaligned=unaligned,
    )
    spec_ev = pl.BlockSpec(
        (_SUBROWS, _LANES), lambda i, r0_ref: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[spec_ev, spec_ev],
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
    )(r0c0, xsr, ysr)
    return out[:H, :W]


# --------------------------------------------------------------------- bwd


def _bwd_kernel(
    r0_ref, wx_ref, wy_ref, g_ref, dwx_ref, dwy_ref, gband, prev_ref, sem, *, w, hw, bc, b, unaligned=False
):
    i = pl.program_id(0)
    r0 = r0_ref[i, 0]
    c0 = r0_ref[i, 1]

    @pl.when((i == 0) | (r0 != prev_ref[0]))
    def _load():
        dma = pltpu.make_async_copy(
            g_ref.at[pl.ds(pl.multiple_of(r0, 8), b), :], gband, sem
        )
        dma.start()
        dma.wait()

    prev_ref[0] = r0
    base = r0.astype(jnp.float32)
    cbase = c0.astype(jnp.float32)

    if unaligned:
        # slice the cotangent band at the unaligned column start: take the
        # aligned 256 window and shift-select 128 columns via the same
        # one-hot matrix as the forward epilogue (once per chunk)
        calign = jnp.minimum((c0 // _LANES) * _LANES, w - 2 * _LANES)
        shift = c0 - calign
        g256 = gband[:, pl.ds(pl.multiple_of(calign, _LANES), 2 * _LANES)]
        ei = jax.lax.broadcasted_iota(jnp.int32, (bc, 2 * _LANES), 0)
        ej = jax.lax.broadcasted_iota(jnp.int32, (bc, 2 * _LANES), 1)
        emb = (ej == ei + shift).astype(jnp.float32)  # (128, 256)
        gsl = jax.lax.dot_general(  # (b, 128) = G256 selected at c0
            g256, emb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    elif bc == w:
        gsl = gband[:]
    else:
        gsl = gband[:, pl.ds(pl.multiple_of(c0, _LANES), bc)]

    gidx = base + jax.lax.broadcasted_iota(jnp.int32, (_LANES, b), 1).astype(
        jnp.float32
    )
    widx = cbase + jax.lax.broadcasted_iota(jnp.int32, (_LANES, bc), 1).astype(
        jnp.float32
    )
    for j in range(_SUBROWS):
        cy = wy_ref[j, :]
        cx = wx_ref[j, :]
        ry = jnp.round(cy)
        rx = jnp.round(cx)

        # u, du: (128, b) band weights for global rows [r0, r0+b)
        qy = gidx - cy[:, None]
        inb = jnp.abs(gidx - ry[:, None]) <= (hw + 0.5)
        gy = jnp.exp(-0.5 * qy * qy) * _INV_SQRT_2PI
        u = jnp.where(inb, gy, 0.0)
        du = jnp.where(inb, qy * gy, 0.0)

        qx = widx - cx[:, None]
        inbx = jnp.abs(widx - rx[:, None]) <= (hw + 0.5)
        gx = jnp.exp(-0.5 * qx * qx) * _INV_SQRT_2PI
        v = jnp.where(inbx, gx, 0.0)
        dv = jnp.where(inbx, qx * gx, 0.0)

        m = jax.lax.dot_general(  # (128, bc) = U @ Gband[:, c0:c0+bc]
            u, gsl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwx_ref[j, :] = jnp.sum(m * dv, axis=1)
        mt = jax.lax.dot_general(  # (128, b) = V @ Gband[:, c0:c0+bc]^T
            v, gsl, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwy_ref[j, :] = jnp.sum(mt * du, axis=1)


def _banded_bwd_call(xs32, ys32, r0c0, g, sensor_size, window_size, b, bc, unaligned=False, interpret=False):
    H, W = sensor_size
    hw = window_size // 2
    hpad = _hpad(H, b)
    wpad = _wpad(W)
    n = xs32.shape[0]
    xsr, ysr, n_chunks = _pad_chunks(xs32, ys32, _CHUNK)
    xsr = xsr.reshape(n_chunks * _SUBROWS, _LANES)
    ysr = ysr.reshape(n_chunks * _SUBROWS, _LANES)
    gpad = jnp.zeros((hpad, wpad), jnp.float32).at[:H, :W].set(g)

    kernel = partial(_bwd_kernel, w=wpad, hw=hw, bc=bc, b=b, unaligned=unaligned)
    spec_ev = pl.BlockSpec(
        (_SUBROWS, _LANES), lambda i, r0_ref: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            spec_ev,
            spec_ev,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(spec_ev, spec_ev),
        scratch_shapes=[
            pltpu.VMEM((b, wpad), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    dwx, dwy = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks * _SUBROWS, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks * _SUBROWS, _LANES), jnp.float32),
        ),
        interpret=interpret,
    )(r0c0, xsr, ysr, gpad)
    return dwx.reshape(-1)[:n], dwy.reshape(-1)[:n]


# ----------------------------------------------------------- public entry


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def events_to_pdf_frame_pallas_banded(
    xs: jax.Array,
    ys: jax.Array,
    sensor_size: Tuple[int, int],
    window_size: int = 3,
    try_col_band: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Banded-splat IWE; falls back to the full-height kernel when the
    banding precondition does not hold (see module docstring).

    With `try_col_band` (wants tile-sorted staging,
    data/staging.py `tile_sort_events`) the contraction additionally
    restricts columns to a narrow band (width candidates _BCS, narrowest
    valid one wins) — B*BC instead of B*W MACs/event —
    degrading gracefully: narrow band -> taller band -> row band -> full
    height, ordered by per-event VPU cost (B + BC).
    """
    out, _ = _fwd(xs, ys, sensor_size, window_size, try_col_band, interpret)
    return out


def _col_candidates(wpad: int):
    """Column-band widths worth trying for a given padded sensor width."""
    return tuple(bc for bc in _BCS if bc < wpad)


def _candidates(h: int, wpad: int, try_col_band: bool):
    """(b, bc, unaligned) kernel configurations, cheapest first (per-event
    cost ∝ b + bc in both VPU weight work and MXU tiles)."""
    bcs = _col_candidates(wpad) if try_col_band else ()
    cands = [
        (b, bc, False)
        for b in _ROW_BANDS
        for bc in tuple(bcs) + (wpad,)
        if 2 * b < _hpad(h, b)  # degenerate: band taller than the sensor
    ]
    if try_col_band and wpad >= 2 * _LANES:
        cands += [
            (b, _BCU, True) for b in _ROW_BANDS if 2 * b < _hpad(h, b)
        ]
    return sorted(cands, key=lambda c: c[0] + c[1])


def _precompute(xs, ys, sensor_size, window_size, try_col_band):
    H, W = sensor_size
    hw = window_size // 2
    wpad = _wpad(W)
    xsr, ysr, n_chunks = _pad_chunks(
        xs.astype(jnp.float32), ys.astype(jnp.float32), _CHUNK
    )
    stats = _row_stats(ysr, H, hw)
    r0s, ok_rows = {}, {}
    for b in _ROW_BANDS:
        r0s[b], ok_rows[b] = _band_starts(stats, H, b)
    bcs = _col_candidates(wpad) if try_col_band else ()
    if bcs:
        c0s, ok_cols = _col_starts(xsr, W, hw, wpad, bcs)
    else:
        c0s = jnp.zeros((n_chunks, 0), jnp.int32)
        ok_cols = jnp.zeros((0,), jnp.bool_)
    if try_col_band and wpad >= 2 * _LANES:
        c0u, ok_u = _col_starts_unaligned(xsr, W, hw, wpad)
    else:
        c0u = jnp.zeros((n_chunks,), jnp.int32)
        ok_u = jnp.bool_(False)
    return r0s, c0s, ok_rows, ok_cols, c0u, ok_u


def _cand_arrays(cand, r0s, c0s, ok_rows, ok_cols, c0u, ok_u, wpad, bcs):
    b, bc, unaligned = cand
    r0 = r0s[b]
    if unaligned:
        c0 = c0u
        ok = ok_rows[b] & ok_u
    elif bc == wpad:
        c0 = jnp.zeros_like(r0)
        ok = ok_rows[b]
    else:
        j = bcs.index(bc)
        c0 = c0s[:, j]
        ok = ok_rows[b] & ok_cols[j]
    return jnp.stack([r0, c0], axis=1), ok


def _fwd(xs, ys, sensor_size, window_size, try_col_band, interpret=False):
    xs32 = xs.astype(jnp.float32)
    ys32 = ys.astype(jnp.float32)
    r0s, c0s, ok_rows, ok_cols, c0u, ok_u = _precompute(
        xs32, ys32, sensor_size, window_size, try_col_band
    )
    wpad = _wpad(sensor_size[1])
    bcs = _col_candidates(wpad) if try_col_band else ()

    def full():
        return events_to_pdf_frame_pallas(
            xs32, ys32, sensor_size, window_size, interpret
        )

    out = full
    for cand in reversed(_candidates(sensor_size[0], wpad, try_col_band)):
        r0c0, ok = _cand_arrays(
            cand, r0s, c0s, ok_rows, ok_cols, c0u, ok_u, wpad, bcs
        )
        call = partial(
            _banded_fwd_call,
            xs32, ys32, r0c0, sensor_size, window_size, cand[0], cand[1],
            cand[2], interpret,
        )
        out = partial(jax.lax.cond, ok, call, out)
    out = out()
    return out, (xs, ys, r0s, c0s, ok_rows, ok_cols, c0u, ok_u)


def _bwd(sensor_size, window_size, try_col_band, interpret, res, g):
    xs, ys, r0s, c0s, ok_rows, ok_cols, c0u, ok_u = res
    xs32 = xs.astype(jnp.float32)
    ys32 = ys.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    wpad = _wpad(sensor_size[1])
    bcs = _col_candidates(wpad) if try_col_band else ()

    def full():
        # reuse the full kernel's custom VJP body
        from eincm_tpu.ops.splat_pallas import _bwd_pallas

        return _bwd_pallas(xs32, ys32, g32, sensor_size, window_size, interpret)

    dwx_dwy = full
    for cand in reversed(_candidates(sensor_size[0], wpad, try_col_band)):
        r0c0, ok = _cand_arrays(
            cand, r0s, c0s, ok_rows, ok_cols, c0u, ok_u, wpad, bcs
        )
        call = partial(
            _banded_bwd_call,
            xs32, ys32, r0c0, g32, sensor_size, window_size, cand[0], cand[1],
            cand[2], interpret,
        )
        dwx_dwy = partial(jax.lax.cond, ok, call, dwx_dwy)
    dwx, dwy = dwx_dwy()
    dwx = jnp.where(jnp.isfinite(dwx), dwx, 0.0).astype(xs.dtype)
    dwy = jnp.where(jnp.isfinite(dwy), dwy, 0.0).astype(ys.dtype)
    return dwx, dwy


events_to_pdf_frame_pallas_banded.defvjp(_fwd, _bwd)
