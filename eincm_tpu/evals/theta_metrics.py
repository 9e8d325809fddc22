"""Full per-window metric bundle for a solved theta field.

Port of src/evaluations/theta_eval.py:14-95 (`evaluate_theta_array`): loss
recomputation, FWL, IWE variance, and — when ground truth is available — the
sparse flow errors. Returns the same `evals` dict keys as the reference plus
the formatted strings for log parity.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from eincm_tpu.models.loss import LossParams, compute_loss_objectives
from eincm_tpu.ops.splat import event_counts, events_to_pdf_frame

from eincm_tpu.evals.flow_metrics import sparse_flow_error


def per_pix_theta_to_flow(
    theta: jax.Array, xs: jax.Array, ys: jax.Array, ts: jax.Array
) -> jax.Array:
    """Flow displacement field at event pixels with dt == 1.

    Reference: src/utils/theta_utils.py:40-73 — scatter-free (theta masked to
    event pixels; the scattered value is the local theta itself).
    """
    mask = event_counts(xs, ys, (theta.shape[0], theta.shape[1])) > 0
    return theta * mask[..., None].astype(theta.dtype)


def evaluate_theta_array(
    theta_array: jax.Array,
    eval_xs: jax.Array,
    eval_ys: jax.Array,
    eval_ts: jax.Array,
    edges: jax.Array,
    edge_ts: jax.Array,
    gt_flow: Optional[jax.Array],
    params: LossParams,
    sensor_size: Tuple[int, int],
    err_eval_event_mask: Optional[jax.Array] = None,
) -> Tuple[str, str, Dict, Dict]:
    """Evaluate a full-sensor theta over one window.

    Returns:
        (time_str, eval_str, evals, loss_objectives) like the reference.
    """
    loss_obj = compute_loss_objectives(
        theta_array, eval_xs, eval_ys, eval_ts, edges, edge_ts, sensor_size
    )
    # Materialize the whole bundle with ONE host transfer: the string
    # formatting below would otherwise trigger ~20 scalar readbacks, each a
    # full round-trip on relayed backends (~30 ms apiece).
    import jax

    loss_obj = jax.device_get(loss_obj)

    mean_rel_contrast = loss_obj["rel_contrasts"].mean()
    mean_rel_corr = loss_obj["rel_correlations"].mean()
    mean_rel_iwe_div = loss_obj["rel_iwe_divergences"].mean()
    tot_var = loss_obj["theta_total_variation"]
    theta_div = loss_obj["theta_divergence"]
    fwl = loss_obj["flow_warp_losses"][0]

    iwe = events_to_pdf_frame(
        loss_obj["warped_xs"][0], loss_obj["warped_ys"][0], sensor_size
    )
    loss = (
        params.alpha * (-mean_rel_contrast)
        + params.beta * (-mean_rel_corr)
        + params.gamma * tot_var
        + params.delta * mean_rel_iwe_div
    )

    evals: Dict = {}
    acc_eval_str = ""
    if gt_flow is not None:
        pred_flow = per_pix_theta_to_flow(theta_array, eval_xs, eval_ys, eval_ts)
        fe = jax.device_get(
            sparse_flow_error(pred_flow, gt_flow, err_eval_event_mask)
        )
        evals.update({k: v for k, v in fe["errors"].items()})
        evals.update({k: v for k, v in fe["counts"].items()})
        evals["n_pixels"] = sensor_size[0] * sensor_size[1]
        e, c = fe["errors"], fe["counts"]
        acc_eval_str = (
            f', AEE(↓): {float(e["AEE"]):8.6f}, AREE(↓): {float(e["AREE"]):8.6f}, '
            + ", ".join(
                f'A{n}PE(↓): {float(e[f"A{n}PE"]):8.6f}' for n in (1, 2, 3, 5, 10, 20)
            )
            + f', | n_pixels:{evals["n_pixels"]:,}, n_gt_mask:{int(c["n_gt"]):,}, '
            + f'n_event_mask:{int(c["n_pred"]):,}, n_ee: {int(c["n_ee"]):,}\n'
        )

    iwe_var = jnp.var(iwe)
    time_str = f'[{time.strftime("%Y-%m-%d %H:%M:%S")}]'
    eval_str = (
        f"total_loss(↓): {float(loss):8.6f}, iwe_var(↑): {float(iwe_var):8.6f}, "
        f"mean_rel_contrast(↑): {float(mean_rel_contrast):8.6f}, "
        f"mean_rel_corr(↑): {float(mean_rel_corr):8.6f}, "
        f"theta_tot_var(↓): {float(tot_var):8.6f}, "
        f"theta_div(↓): {float(theta_div):8.6f}, "
        f"mean_rel_iwe_div(↓): {float(mean_rel_iwe_div):8.6f}, "
        f"FWL(↑): {float(fwl):8.6f}"
        f"{acc_eval_str}"
    )

    evals.update(
        {
            "loss": loss,
            "iwe_var": iwe_var,
            "mean_rel_contrast": mean_rel_contrast,
            "mean_rel_corr": mean_rel_corr,
            "theta_tot_var": tot_var,
            "theta_div": theta_div,
            "fwl": fwl,
            "mean_rel_iwe_div": mean_rel_iwe_div,
            "rel_iwe_divergences": loss_obj["rel_iwe_divergences"],
            "rel_contrasts": loss_obj["rel_contrasts"],
            "rel_correlations": loss_obj["rel_correlations"],
            "flow_warp_losses": loss_obj["flow_warp_losses"],
            "multi_ref_weights": loss_obj["multi_ref_weights"],
        }
    )
    return time_str, eval_str, evals, loss_obj
