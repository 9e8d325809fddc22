"""Datasample staging: raw loader dict -> fixed-shape device-ready sample.

Port of `EINCMExperiment.stage_datasample` (src/experiments/e00/exp_mgr.py:
278-376): timestamp normalization to [0, 1], eval-event sub-slicing when the
optimization window was padded beyond the eval span, and per-frame edge
extraction. TPU-specific addition: optional padding of the event arrays to a
fixed length (NaN events contribute nothing to any splat/mask) so a whole
sequence compiles one solver program.
"""

from __future__ import annotations

import sys
from typing import Callable, Dict, NamedTuple, Optional

import numpy as np

from eincm_tpu.edge.pipeline import extract_edges
from eincm_tpu.models.pyramid import WindowSample

EPSN = sys.float_info.epsilon


class StagedSample(NamedTuple):
    """Device-ready window plus host-side evaluation data."""

    window: WindowSample  # solver inputs (normalized times, edges)
    images: np.ndarray  # (n_imgs, H, W) float64, preprocessed+normalized
    eval_events: Dict[str, np.ndarray]  # eval-consistent event subset
    gt_flow: Optional[np.ndarray]  # (H, W, 2) or None
    polarities: np.ndarray  # (E,) bool
    t_ref: float
    eval_ts: tuple  # (start, end) raw units
    eval_ts_units: str
    file_idx: Optional[int]
    n_event_deficiency: int


def _normalize_img(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, np.float64)
    return (img - img.min()) / (img.max() - img.min() + EPSN)


def _row_sort_perm(ys: np.ndarray) -> np.ndarray:
    """Stable row-local event permutation for the row-banded splat.

    Uses the native multithreaded counting sort (native/events.cpp) when it
    built — for the integer-valued rows real loaders produce it yields the
    IDENTICAL permutation to a stable argsort, in O(n); falls back to numpy
    argsort otherwise.
    """
    try:
        from eincm_tpu.native import events as ne

        if len(ys) and ne.available() and np.isfinite(ys).all():
            n_rows = max(1, int(ys.max()) + 1)
            return ne.sort_events_by_row_perm(ys.astype(np.float32), n_rows)
    except Exception:
        pass
    return np.argsort(ys, kind="stable")


def tile_sort_events(xs, ys, ts, ps, sensor_h: int, tile_h: int = None):
    """Reorder events into (row-block, column)-sorted, block-chunk-padded
    layout for the column-banded splat kernel (ops/splat_banded.py).

    Events are stably sorted by (y // tile_h, x) so every fixed-size kernel
    chunk sees a narrow row AND column range; each row-block's event run is
    padded with NaNs to a multiple of the kernel chunk so no chunk straddles
    two blocks. Blocks default to HALF the kernel's narrowest row band so
    the remaining rows absorb the warp-induced row spread. The output length
    is a static function of the input length
    (ceil(n/CHUNK)*CHUNK + n_blocks*CHUNK), keeping one compile per
    sequence. All loss reductions are permutation-invariant and NaN events
    contribute nothing, so this is value-preserving.
    """
    from eincm_tpu.ops.splat_banded import _CHUNK, _TILE_H

    if tile_h is None:
        tile_h = _TILE_H
    n = len(xs)
    nb = -(-sensor_h // tile_h)
    out_len = -(-n // _CHUNK) * _CHUNK + nb * _CHUNK

    finite = np.isfinite(ys)
    block = np.full(n, nb - 1, np.int64)
    block[finite] = np.clip(
        (ys[finite].astype(np.int64)) // tile_h, 0, nb - 1
    )
    order = np.lexsort((np.where(np.isfinite(xs), xs, np.inf), block))
    xs, ys, ts, ps = xs[order], ys[order], ts[order], ps[order]
    block = block[order]

    out = [
        np.full(out_len, np.nan, xs.dtype),
        np.full(out_len, np.nan, ys.dtype),
        np.full(out_len, np.nan, ts.dtype),
        np.zeros(out_len, bool),
    ]
    pos = 0
    for b in range(nb):
        lo, hi = np.searchsorted(block, [b, b + 1])
        cnt = hi - lo
        for o, src in zip(out, (xs, ys, ts, ps)):
            o[pos : pos + cnt] = src[lo:hi]
        pos += -(-cnt // _CHUNK) * _CHUNK if cnt else 0
    assert pos <= out_len
    return tuple(out)


def stage_datasample(
    datasample: Dict,
    edge_fn: Optional[Callable] = None,
    preprocess: bool = True,
    pad_to: Optional[int] = None,
    sort_by_row: bool = False,
    sort_by_tile: bool = False,
    dtype=np.float32,
) -> StagedSample:
    """Stage one raw loader sample.

    Args:
        datasample: loader dict (contract of dsec_loader.py:327-347 /
            mvsec_loader.py:309-319 / ecd_loader.py:124-131).
        edge_fn: images -> (n_imgs, H, W) edge maps; defaults to the full
            preprocess->canny->smoothen pipeline.
        pad_to: optionally pad events to this fixed count with NaNs.
        sort_by_row: reorder events by sensor row (stable) so the row-banded
            splat (`set_splat_impl('banded')`) sees row-local chunks. All
            loss reductions are permutation-invariant; the eval-event subset
            keeps its time order.
    """
    ev = datasample["events"]
    xs = np.asarray(ev["x"], np.float64)
    ys = np.asarray(ev["y"], np.float64)
    ts = np.asarray(ev["t"], np.float64)
    ps = np.asarray(ev["p"], bool)
    images = np.asarray(datasample["images"], np.float64)
    image_ts = np.asarray(datasample["image_ts"], np.float64)

    if "eval_ts_us" in datasample:
        start_time, end_time = np.asarray(datasample["eval_ts_us"], np.float64)
        ts_units = "us"
    else:
        start_time, end_time = np.asarray(datasample["eval_ts"], np.float64)
        ts_units = "s"

    gt_flow = (
        np.asarray(datasample["flow_gt"], np.float64)
        if "flow_gt" in datasample and datasample["flow_gt"] is not None
        else None
    )
    file_idx = datasample.get("file_idx")
    deficiency = int(datasample.get("n_event_deficiency") or 0)

    # eval-consistent event subset (exp_mgr.py:301-315): when the window was
    # padded (deficiency > 0) the eval set is the interior [start, end] span.
    if deficiency > 0:
        i0, i1 = np.searchsorted(ts, [start_time, end_time])
        sl = slice(max(0, i0 + 1), min(len(xs), i1 - 1))
    else:
        sl = slice(None)
    eval_events = {"x": xs[sl], "y": ys[sl], "t": ts[sl], "p": ps[sl]}

    # normalize all timestamps to the eval span (exp_mgr.py:321-327)
    span = end_time - start_time + EPSN
    ts_n = (ts - start_time) / span
    image_ts_n = (image_ts - start_time) / span
    eval_events["t"] = (eval_events["t"] - start_time) / span

    if sort_by_row:
        order = _row_sort_perm(ys)
        xs, ys, ts_n, ps = xs[order], ys[order], ts_n[order], ps[order]

    # edge extraction (exp_mgr.py:335-350)
    images_pp = np.stack([_normalize_img(im) for im in images])
    if edge_fn is None:
        edge_fn = lambda ims: extract_edges(ims, preprocess=preprocess)
    edges = edge_fn(images)

    if pad_to is not None and len(xs) < pad_to:
        pad = pad_to - len(xs)
        fill = np.full(pad, np.nan)
        xs = np.concatenate([xs, fill])
        ys = np.concatenate([ys, fill])
        ts_n = np.concatenate([ts_n, fill])
        ps = np.concatenate([ps, np.zeros(pad, bool)])

    if sort_by_tile:
        xs, ys, ts_n, ps = tile_sort_events(
            xs, ys, ts_n, ps, images.shape[-2]
        )

    window = WindowSample(
        xs=xs.astype(dtype),
        ys=ys.astype(dtype),
        ts=ts_n.astype(dtype),
        edges=np.asarray(edges, dtype),
        edge_ts=image_ts_n.astype(dtype),
    )
    return StagedSample(
        window=window,
        images=images_pp,
        eval_events=eval_events,
        gt_flow=gt_flow,
        polarities=ps,
        t_ref=0.0,
        eval_ts=(float(start_time), float(end_time)),
        eval_ts_units=ts_units,
        file_idx=None if file_idx is None else int(file_idx),
        n_event_deficiency=deficiency,
    )
