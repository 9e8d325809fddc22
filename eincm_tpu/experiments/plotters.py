"""Experiment plotting: per-window end-result figures, metric sequences, video.

Functional equivalent of `EINCMExperimentPlotter`
(src/experiments/e00/plotters.py:26-974): polarity event frames, IWE
before/after warping, edge/image/flow blends, the end-result figure grid, and
FWL/AEE/ANPE sequence charts. Video assembly writes an animated GIF via PIL
(no OpenCV/ffmpeg dependency).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from eincm_tpu.data.staging import StagedSample
from eincm_tpu.ops.splat import events_to_pdf_frame
from eincm_tpu.ops.warp import warp_events_multi_ref
from eincm_tpu.utils.flow_vis import embed_flow_code_in_img, flow_uv_to_img


def construct_event_frame(
    xs, ys, ps, sensor_size, polarity_colors=True
) -> np.ndarray:
    """Accumulate events into an RGB frame, red/blue by polarity
    (reference: plotters.py:174-225)."""
    h, w = sensor_size
    frame = np.full((h, w, 3), 255, np.uint8)
    xi = np.clip(np.round(np.asarray(xs)).astype(int), 0, w - 1)
    yi = np.clip(np.round(np.asarray(ys)).astype(int), 0, h - 1)
    pol = np.asarray(ps, bool)
    if polarity_colors:
        frame[yi[pol], xi[pol]] = (220, 40, 40)
        frame[yi[~pol], xi[~pol]] = (40, 40, 220)
    else:
        frame[yi, xi] = (0, 0, 0)
    return frame


class EINCMExperimentPlotter:
    def __init__(self, cfg, plot_dir):
        self.cfg = cfg
        self.plot_dir = Path(plot_dir)
        os.makedirs(self.plot_dir, exist_ok=True)
        self.end_result_paths = []

    # --------------------------------------------------------- end results

    def plot_end_results(
        self, idx: int, staged: StagedSample, theta_full
    ) -> Path:
        """3x4 end-result grid: events, edges, IWE before/after, flow map
        (reference: plotters.py:648-857)."""
        w = staged.window
        sensor = tuple(self.cfg.dataset.sensor_size)
        xs, ys, ts = w.xs, w.ys, w.ts

        zero_iwe = np.asarray(events_to_pdf_frame(xs, ys, sensor))
        wx, wy = warp_events_multi_ref(
            jnp.asarray(theta_full), xs, ys, ts, w.edge_ts
        )
        iwe = np.asarray(events_to_pdf_frame(wx[0], wy[0], sensor))

        flow = np.asarray(theta_full)
        flow_img = embed_flow_code_in_img(flow_uv_to_img(flow))

        fig, axes = plt.subplots(3, 4, figsize=(16, 9))
        panels = [
            ("events (polarity)", construct_event_frame(
                xs, ys, staged.polarities[: len(np.asarray(xs))], sensor)),
            ("image[0]", staged.images[0]),
            ("image[-1]", staged.images[-1]),
            ("edges[0]", np.asarray(w.edges[0])),
            ("IUE (zero warp)", zero_iwe),
            ("IWE (final theta)", iwe),
            ("theta flow", flow_img),
            ("edges[-1]", np.asarray(w.edges[-1])),
        ]
        if staged.gt_flow is not None:
            panels.append(
                ("GT flow", embed_flow_code_in_img(flow_uv_to_img(staged.gt_flow)))
            )
            epe = np.linalg.norm(flow - staged.gt_flow, axis=-1)
            panels.append(("EPE map", epe))
        for ax, (title, img) in zip(axes.ravel(), panels):
            if img.ndim == 2:
                ax.imshow(img, cmap="viridis")
            else:
                ax.imshow(img)
            ax.set_title(title, fontsize=9)
        for ax in axes.ravel():
            ax.axis("off")
        fig.suptitle(f"window {idx}")
        path = self.plot_dir / f"end_result_{idx:06d}.png"
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        self.end_result_paths.append(path)
        return path

    # ----------------------------------------------------- metric sequences

    def _plot_sequence(self, values, name: str, better: str) -> Path:
        fig, ax = plt.subplots(figsize=(10, 3.2))
        ax.plot(values, lw=1.2)
        ax.set_xlabel("window")
        ax.set_ylabel(f"{name} ({better})")
        ax.grid(alpha=0.3)
        m = float(np.mean(values))
        ax.axhline(m, color="tab:red", ls="--", lw=0.8)
        ax.set_title(f"{name}: mean {m:.4f}")
        path = self.plot_dir / f"seq_{name.lower()}.png"
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return path

    def plot_metric_sequences(self, eval_results: Dict):
        """FWL / AEE / ANPE charts over the sequence
        (reference: plotters.py:860-974)."""
        keys = sorted(
            eval_results, key=lambda k: int(k.replace("datasample_idx_", ""))
        )

        def series(metric):
            vals = [
                float(np.asarray(eval_results[k]["evals"][metric]))
                for k in keys
                if metric in eval_results[k]["evals"]
            ]
            return vals

        made = []
        fwl = series("fwl")
        if fwl:
            made.append(self._plot_sequence(fwl, "FWL", "↑"))
        aee = series("AEE")
        if aee:
            made.append(self._plot_sequence(aee, "AEE", "↓"))
        for n in (1, 2, 3):
            s = series(f"A{n}PE")
            if s:
                made.append(self._plot_sequence(s, f"A{n}PE", "↓"))
        return made

    # ------------------------------------------------------- diagnostics

    def plot_nan_theta(self, idx: int, theta: np.ndarray) -> Optional[Path]:
        """Visualize NaN/Inf locations in a theta field.

        Numerical-debug aid mirroring the reference's NaN visualizer
        (plotters.py:299-381); returns None when the field is clean.
        """
        theta = np.asarray(theta)
        bad = ~np.isfinite(theta)
        if not bad.any():
            return None
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        for c, ax in enumerate(axes):
            ax.imshow(bad[..., c], cmap="Reds", interpolation="nearest")
            ax.set_title(f"non-finite theta[..., {c}] ({bad[..., c].sum()} px)")
            ax.axis("off")
        path = self.plot_dir / f"nan_theta_{idx:06d}.png"
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return path

    def plot_step_results(
        self, idx: int, staged: StagedSample, thetas, losses
    ) -> Path:
        """Optimization-trajectory figure for one window: loss curve plus the
        flow field at a few intermediate iterates.

        On-device-history analogue of the reference's per-step plots
        (plotters.py:493-645); `thetas` is (n_steps, D) flat iterates at the
        finest level, `losses` is (n_steps,).
        """
        thetas = np.asarray(thetas)
        losses = np.asarray(losses)
        n = len(losses)
        picks = sorted(set([0, n // 3, 2 * n // 3, n - 1])) if n else []

        fig = plt.figure(figsize=(14, 4))
        ax0 = fig.add_subplot(1, len(picks) + 1, 1)
        ax0.plot(losses, lw=1.2)
        ax0.set_xlabel("iteration")
        ax0.set_ylabel("loss")
        ax0.grid(alpha=0.3)

        h = int(np.sqrt(thetas.shape[1] // 2)) if thetas.size else 0
        for i, p in enumerate(picks):
            ax = fig.add_subplot(1, len(picks) + 1, i + 2)
            theta = thetas[p].reshape(h, h, 2)
            ax.imshow(flow_uv_to_img(theta))
            ax.set_title(f"iter {p}", fontsize=9)
            ax.axis("off")
        path = self.plot_dir / f"step_results_{idx:06d}.png"
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return path

    def plot_grad_quiver(
        self, idx: int, theta_full: np.ndarray, grad: np.ndarray, stride: int = 16
    ) -> Path:
        """Negative-gradient quiver over the flow map (reference
        plotters.py neg-grad-loss images)."""
        theta_full = np.asarray(theta_full)
        grad = np.asarray(grad)
        h, w = theta_full.shape[:2]
        ys, xs = np.mgrid[0:h:stride, 0:w:stride]
        fig, ax = plt.subplots(figsize=(7, 5))
        ax.imshow(flow_uv_to_img(theta_full))
        g = grad[::stride, ::stride] if grad.shape[:2] == (h, w) else None
        if g is not None:
            ax.quiver(xs, ys, -g[..., 0], -g[..., 1], color="k", scale=None)
        ax.set_title(f"flow + negative loss gradient (window {idx})")
        ax.axis("off")
        path = self.plot_dir / f"grad_quiver_{idx:06d}.png"
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return path

    # ------------------------------------------------------------- video

    def assemble_video(self, fps: int = 2) -> Optional[Path]:
        """Animated GIF of the per-window end-result frames
        (reference uses cv.VideoWriter AVI, exp_mgr.py:758-792)."""
        if not self.end_result_paths:
            return None
        from PIL import Image

        frames = [Image.open(p) for p in self.end_result_paths]
        path = self.plot_dir / "end_results.gif"
        frames[0].save(
            path,
            save_all=True,
            append_images=frames[1:],
            duration=int(1000 / fps),
            loop=0,
        )
        return path
