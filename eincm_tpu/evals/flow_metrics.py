"""Sparse optical-flow error metrics (AEE / AREE / N-PE).

Port of the reference evaluator (src/evaluations/flow_eval.py:14-75) with one
structural change: the reference gathers valid pixels with boolean indexing
(dynamic shapes); here every statistic is a masked reduction over the full
(H, W) grid, so the whole bundle is static-shape and jittable — evaluation can
run fused with the solve and batch/shard over windows.
"""

from __future__ import annotations

import sys
from typing import Dict, Optional

import jax
import jax.numpy as jnp

EPSN = sys.float_info.epsilon

N_PIXEL_THRESHOLDS = (1, 2, 3, 5, 10, 20)


def _valid_mask(flow: jax.Array) -> jax.Array:
    """Valid = finite in both channels and nonzero norm (flow_eval.py:31-45)."""
    finite = ~jnp.isinf(flow[..., 0]) & ~jnp.isinf(flow[..., 1])
    return finite & (jnp.linalg.norm(flow, axis=-1) > 0)


def sparse_flow_error(
    pred_flow: jax.Array,
    gt_flow: jax.Array,
    event_mask: Optional[jax.Array] = None,
) -> Dict[str, Dict[str, jax.Array]]:
    """Masked endpoint-error statistics between predicted and GT flow.

    Args:
        pred_flow: (H, W, 2) predicted displacements.
        gt_flow: (H, W, 2) ground-truth displacements.
        event_mask: optional (H, W) bool, restrict evaluation to event pixels.

    Returns:
        {'errors': {AEE, AREE, A{1,2,3,5,10,20}PE}, 'counts': {n_ee, n_pred, n_gt}}
        — same schema as the reference (flow_eval.py:60-75).
    """
    dtype = pred_flow.dtype
    epsn = jnp.asarray(EPSN, dtype)

    mask_pred = _valid_mask(pred_flow)
    if event_mask is not None:
        mask_pred = mask_pred & event_mask
    mask_gt = _valid_mask(gt_flow)
    mask = mask_pred & mask_gt

    diff = jnp.where(mask[..., None], pred_flow - gt_flow, 0.0)
    epe = jnp.linalg.norm(diff, axis=-1)  # (H, W), 0 outside mask
    gt_norm = jnp.linalg.norm(jnp.where(mask[..., None], gt_flow, 0.0), axis=-1)
    rel_epe = epe / (gt_norm + epsn)

    n_ee = mask.sum()
    denom = jnp.maximum(n_ee, 1).astype(dtype)

    errs = {
        "AEE": jnp.where(mask, epe, 0.0).sum() / denom,
        "AREE": jnp.where(mask, rel_epe, 0.0).sum() / denom,
    }
    for n in N_PIXEL_THRESHOLDS:
        errs[f"A{n}PE"] = (
            (mask & (epe > n)).sum() * 100.0 / (n_ee.astype(dtype) + epsn)
        )

    cnts = {"n_ee": n_ee, "n_pred": mask_pred.sum(), "n_gt": mask_gt.sum()}
    return {"errors": errs, "counts": cnts}
