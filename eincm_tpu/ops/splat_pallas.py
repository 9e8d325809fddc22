"""Pallas TPU kernel: fused banded-weight construction + MXU splat.

The XLA path (eincm_tpu.ops.splat) materializes the banded one-hot matrices
U (E, H) and V (E, W) between fusions; this kernel builds both directly in
VMEM per event chunk and accumulates the (H, W) frame in a VMEM-resident
output block, so HBM sees only the event coordinates (8 bytes/event) and the
final frame. Grid = event chunks; the output block is revisited by every
program and zero-initialized on the first.

Backward (custom VJP) reuses the same separable structure in plain XLA:
    dL/dwx_e = sum_hw G[h,w] * u_e[h] * v'_e[w] = <(u_e^T G), v'_e>
computed as chunked MXU matmuls — no scatter anywhere.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)

# events per grid step (weights are built 128 events at a time, so VMEM use
# is ~(H+W)*128*4 + H*W*4 bytes regardless); 4096 measured ~8% faster than
# 1024 at DSEC scale (amortizes grid-step overhead), and 8192 measured ~6%
# SLOWER (banded fwd 5.16 vs 4.89 ms) — grid-step overhead is not the
# remaining bottleneck, so don't raise this further
_CHUNK = 4096


# events are laid out (rows_of_128, 128): each grid step consumes a
# (_SUBROWS, 128) tile = _CHUNK events, unrolling one contraction-128 MXU
# matmul per sub-row.
_LANES = 128
_SUBROWS = _CHUNK // _LANES


def _banded_from_row(coords_row: jax.Array, n: int, hw: int, rows_layout: bool):
    """Banded Gaussian weights against a (128,) coordinate row.

    Returns (n, 128) when rows_layout (U^T, matmul LHS) else (128, n) (V,
    matmul RHS).
    """
    rounded = jnp.round(coords_row)
    # Mosaic iota must be integer-typed; cast after
    if rows_layout:
        idx = jax.lax.broadcasted_iota(jnp.int32, (n, _LANES), 0).astype(
            jnp.float32
        )
        c = coords_row[None, :]
        r = rounded[None, :]
    else:
        idx = jax.lax.broadcasted_iota(jnp.int32, (_LANES, n), 1).astype(
            jnp.float32
        )
        c = coords_row[:, None]
        r = rounded[:, None]
    in_band = jnp.abs(idx - r) <= (hw + 0.5)
    q = idx - c
    g = jnp.exp(-0.5 * q * q) * _INV_SQRT_2PI
    return jnp.where(in_band, g, 0.0)


def _splat_kernel(wx_ref, wy_ref, out_ref, *, h, w, hw):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc = jnp.zeros((h, w), jnp.float32)
    for j in range(_SUBROWS):
        cy = wy_ref[j, :]
        cx = wx_ref[j, :]
        ut = _banded_from_row(cy, h, hw, rows_layout=True)  # (H, 128)
        v = _banded_from_row(cx, w, hw, rows_layout=False)  # (128, W)
        acc += jax.lax.dot_general(
            ut,
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] += acc


def _pad_chunks(xs, ys, chunk):
    n = xs.shape[0]
    n_chunks = max(1, -(-n // chunk))
    pad = n_chunks * chunk - n
    if pad:
        fill = jnp.full((pad,), jnp.nan, xs.dtype)
        xs = jnp.concatenate([xs, fill])
        ys = jnp.concatenate([ys, fill])
    return xs.reshape(n_chunks, chunk), ys.reshape(n_chunks, chunk), n_chunks


@partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4)
)
def events_to_pdf_frame_pallas(
    xs: jax.Array,
    ys: jax.Array,
    sensor_size: Tuple[int, int] = (260, 346),
    window_size: int = 3,
    interpret: bool = False,
) -> jax.Array:
    """IWE accumulation as a single fused Pallas kernel.

    Semantics identical to `eincm_tpu.ops.splat.events_to_pdf_frame` (the XLA
    path), which itself matches the reference kernel
    (src/utils/event_utils.py:13-61) with drop-at-every-edge behavior.
    """
    H, W = sensor_size
    hw = window_size // 2
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    xsr, ysr, n_chunks = _pad_chunks(xs, ys, _CHUNK)
    xsr = xsr.reshape(n_chunks * _SUBROWS, _LANES)
    ysr = ysr.reshape(n_chunks * _SUBROWS, _LANES)

    kernel = partial(_splat_kernel, h=H, w=W, hw=hw)
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (_SUBROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_SUBROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=interpret,
    )(xsr, ysr)


def _bwd_kernel(wx_ref, wy_ref, g_ref, dwx_ref, dwy_ref, *, h, w, hw):
    """Fused backward: per-event coordinate gradients.

    dwx_e = <(u_e @ G), v'_e>,  dwy_e = <(v_e @ G^T), u'_e> — both contractions
    run on the MXU with G resident in VMEM; band + band-derivative
    construction is VPU work fused in the same kernel.
    """
    for j in range(_SUBROWS):
        cy = wy_ref[j, :]
        cx = wx_ref[j, :]

        def band_pair(coords, n):
            rounded = jnp.round(coords)
            idx = jax.lax.broadcasted_iota(jnp.int32, (_LANES, n), 1).astype(
                jnp.float32
            )
            in_band = jnp.abs(idx - rounded[:, None]) <= (hw + 0.5)
            q = idx - coords[:, None]
            gk = jnp.exp(-0.5 * q * q) * _INV_SQRT_2PI
            return (
                jnp.where(in_band, gk, 0.0),
                jnp.where(in_band, q * gk, 0.0),
            )

        u, du = band_pair(cy, h)  # (128, H)
        v, dv = band_pair(cx, w)  # (128, W)
        m = jax.lax.dot_general(  # (128, W) = U @ G
            u, g_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwx_ref[j, :] = jnp.sum(m * dv, axis=1)
        mt = jax.lax.dot_general(  # (128, H) = V @ G^T
            v, g_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwy_ref[j, :] = jnp.sum(mt * du, axis=1)


def _bwd_pallas(xs32, ys32, g, sensor_size, window_size, interpret=False):
    H, W = sensor_size
    hw = window_size // 2
    n = xs32.shape[0]
    xsr, ysr, n_chunks = _pad_chunks(xs32, ys32, _CHUNK)
    xsr = xsr.reshape(n_chunks * _SUBROWS, _LANES)
    ysr = ysr.reshape(n_chunks * _SUBROWS, _LANES)

    kernel = partial(_bwd_kernel, h=H, w=W, hw=hw)
    spec_ev = pl.BlockSpec(
        (_SUBROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    dwx, dwy = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            spec_ev,
            spec_ev,
            pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(spec_ev, spec_ev),
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks * _SUBROWS, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks * _SUBROWS, _LANES), jnp.float32),
        ),
        interpret=interpret,
    )(xsr, ysr, g)
    return dwx.reshape(-1)[:n], dwy.reshape(-1)[:n]


def _fwd(xs, ys, sensor_size, window_size, interpret):
    out = events_to_pdf_frame_pallas(xs, ys, sensor_size, window_size, interpret)
    return out, (xs, ys)


def _bwd(sensor_size, window_size, interpret, res, g):
    xs, ys = res
    H, W = sensor_size
    hw = window_size // 2
    xs32 = xs.astype(jnp.float32)
    ys32 = ys.astype(jnp.float32)
    n = xs32.shape[0]
    g = g.astype(jnp.float32)

    if not interpret and jax.default_backend() == "tpu":
        dwx, dwy = _bwd_pallas(xs32, ys32, g, sensor_size, window_size)
        dwx = jnp.where(jnp.isfinite(dwx), dwx, 0.0).astype(xs.dtype)
        dwy = jnp.where(jnp.isfinite(dwy), dwy, 0.0).astype(ys.dtype)
        return dwx, dwy

    xsr, ysr, n_chunks = _pad_chunks(xs32, ys32, _CHUNK)

    def band_pair(coords, n_axis):
        """(chunk, n_axis) banded weights and their d/dcoord."""
        rounded = jnp.round(coords)
        idx = jax.lax.broadcasted_iota(jnp.float32, (coords.shape[0], n_axis), 1)
        in_band = jnp.abs(idx - rounded[:, None]) <= (hw + 0.5)
        q = idx - coords[:, None]
        gk = jnp.exp(-0.5 * q * q) * _INV_SQRT_2PI
        w0 = jnp.where(in_band, gk, 0.0)
        dw = jnp.where(in_band, q * gk, 0.0)  # d/dcoord g(idx - coord)
        return w0, dw

    def chunk_grads(cx, cy):
        u, du = band_pair(cy, H)  # (chunk, H)
        v, dv = band_pair(cx, W)  # (chunk, W)
        m = jax.lax.dot_general(  # (chunk, W) = U @ G
            u, g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # single-pass bf16, consistent with the forward kernel's accuracy
            precision=jax.lax.Precision.DEFAULT,
        )
        dwx = jnp.sum(m * dv, axis=1)
        mt = jax.lax.dot_general(  # (chunk, H) = V @ G^T
            v, g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        dwy = jnp.sum(mt * du, axis=1)
        return dwx, dwy

    if n_chunks == 1:
        dwx, dwy = chunk_grads(xsr[0], ysr[0])
    else:
        dwx, dwy = jax.lax.map(lambda a: chunk_grads(*a), (xsr, ysr))
        dwx = dwx.reshape(-1)
        dwy = dwy.reshape(-1)
    dwx = jnp.where(jnp.isfinite(dwx), dwx, 0.0)[:n].astype(xs.dtype)
    dwy = jnp.where(jnp.isfinite(dwy), dwy, 0.0)[:n].astype(ys.dtype)
    return dwx, dwy


events_to_pdf_frame_pallas.defvjp(_fwd, _bwd)
