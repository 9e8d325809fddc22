"""Tiny but complete on-disk dataset trees for loader and full-pipeline tests.

Each builder writes the exact directory/file layout the corresponding loader
expects (the datasample contracts of dsec_loader.py:327-347,
mvsec_loader.py:309-319, ecd_loader.py:124-131) with synthetic content, so
the real CLI can run SOLVE -> EVAL -> PLOT -> submission export against it.
"""

import numpy as np


def make_mvsec_tree(root, seed=0, sequence="outdoor_day2", polarity="01",
                    gt_mode="const", gt_margin=0.0):
    """Minimal MVSEC tree: hdf5 data + Flow GT npz.

    polarity="01" writes 0/1 polarities (historical default); "pm1" writes
    the real MVSEC -1/+1 encoding (exercises the documented loader
    deviation: reference `.astype(bool)` maps -1 to True, ours keeps the
    sign via `> 0`). gt_mode="varying" writes a smooth spatially-varying GT
    flow with an exact-zero patch, so GT temporal propagation exercises the
    remap gather AND the zero-flow mask path (mvsec_loader.py:426-427).
    gt_margin > 0 keeps the GT timestamp span strictly inside the image
    span, like real MVSEC — required by the reference loader, whose
    prune_data indexes image_ts[idx_stop_images] unguarded
    (mvsec_loader.py:221) and crashes when GT reaches the last image."""
    import h5py

    base = sequence[:-1]
    rng = np.random.default_rng(seed)
    (root / f"hdf5/{base}").mkdir(parents=True)
    (root / f"Flow GT/{base}").mkdir(parents=True)

    t0, t1 = 100.0, 104.0
    n_ev = 20000
    ts = np.sort(rng.uniform(t0, t1, n_ev))
    xs = rng.integers(5, 341, n_ev)  # raw sensor coords (346 wide)
    ys = rng.integers(2, 258, n_ev)
    ps = rng.integers(0, 2, n_ev)
    if polarity == "pm1":
        ps = 2 * ps - 1
    events = np.stack([xs, ys, ts, ps], axis=-1).astype(np.float64)

    n_img = 42
    img_ts = np.linspace(t0, t1, n_img)
    images = rng.integers(0, 255, (n_img, 260, 346)).astype(np.uint8)

    with h5py.File(root / f"hdf5/{base}/{sequence}_data.hdf5", "w") as f:
        f["davis/left/events"] = events
        f["davis/left/image_raw"] = images
        f["davis/left/image_raw_event_inds"] = np.searchsorted(ts, img_ts)
        f["davis/left/image_raw_ts"] = img_ts
        f["davis/left/imu"] = rng.normal(0, 1, (100, 6))
        f["davis/left/imu_ts"] = np.linspace(t0, t1, 100)

    n_gt = 40
    gt_ts = np.linspace(t0 + gt_margin, t1 - gt_margin, n_gt)
    if gt_mode == "varying":
        yy, xx = np.meshgrid(np.arange(260), np.arange(346), indexing="ij")
        fx = 1.5 + np.sin(xx / 40.0) * np.cos(yy / 30.0)
        fy = -0.5 + np.cos(xx / 35.0) * np.sin(yy / 25.0)
        fx, fy = fx.copy(), fy.copy()
        fx[40:70, 60:100] = 0.0  # exact-zero patch -> propagation mask path
        fy[40:70, 60:100] = 0.0
        scale = 1.0 + 0.01 * np.arange(n_gt)[:, None, None]
        x_gt = fx[None] * scale
        y_gt = fy[None] * scale
        x_gt[:, 40:70, 60:100] = 0.0
        y_gt[:, 40:70, 60:100] = 0.0
    else:
        x_gt = np.full((n_gt, 260, 346), 1.5)
        y_gt = np.full((n_gt, 260, 346), -0.5)
    np.savez(
        root / f"Flow GT/{base}/{sequence}_gt_flow_dist.npz",
        timestamps=gt_ts,
        x_flow_dist=x_gt,
        y_flow_dist=y_gt,
    )
    return root


def make_dsec_tree(
    root,
    seed=1,
    geometry="identity",
    sensor=(480, 640),
    n_ev=30000,
    n_eval_windows=2,
):
    """Minimal DSEC train-split tree.

    geometry="identity" (default): identity rectify map and calibration.
    geometry="warped": a smooth non-identity rectify map that pushes some
    border events out of sensor (exercises the round+filter drop path,
    dsec_loader.py:158-167), real distortion coefficients, and a slightly
    rotated/translated camera chain (non-identity homography mapping).

    sensor/n_ev/n_eval_windows (<= 3) scale the tree — the quarter-DSEC CLI
    test uses (240, 320) with 200k events.

    Returns (root, sequence_name)."""
    import h5py
    import yaml
    from PIL import Image

    from eincm_tpu.utils.png16 import write_png16

    assert 1 <= n_eval_windows <= 3
    rng = np.random.default_rng(seed)
    seq = "mini_seq"
    ev_dir = root / f"Train/train_events/{seq}/events/left"
    img_dir = root / f"Train/train_images/{seq}/images"
    cal_dir = root / f"Train/train_calibration/{seq}/calibration"
    flow_dir = root / f"Train/train_optical_flow/{seq}/flow"
    for d in [ev_dir, img_dir / "left/rectified", cal_dir, flow_dir / "forward"]:
        d.mkdir(parents=True)

    H, W = sensor
    t_offset = 1_000_000
    ts = np.sort(rng.integers(0, 300_000, n_ev)).astype(np.int64)
    xs = rng.integers(0, W, n_ev).astype(np.uint16)
    ys = rng.integers(0, H, n_ev).astype(np.uint16)
    with h5py.File(ev_dir / "events.h5", "w") as f:
        f["events/x"] = xs
        f["events/y"] = ys
        f["events/t"] = ts
        f["events/p"] = rng.integers(0, 2, n_ev).astype(np.uint8)
        f["ms_to_idx"] = np.searchsorted(ts, np.arange(300) * 1000)
        f["t_offset"] = t_offset

    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    if geometry == "warped":
        # smooth displacement up to ~4 px; shifts border pixels out of the
        # sensor so the in-sensor filter actually drops events
        rect = np.stack(
            [
                gx + 4.0 * np.sin(gy / 37.0) - 2.5,
                gy + 4.0 * np.cos(gx / 53.0) - 2.5,
            ],
            axis=-1,
        ).astype(np.float32)
    else:
        rect = np.stack([gx, gy], axis=-1).astype(np.float32)  # identity
    with h5py.File(ev_dir / "rectify_map.h5", "w") as f:
        f["rectify_map"] = rect

    if geometry == "warped":
        from scipy.spatial.transform import Rotation as _Rot

        dist = [-0.1, 0.02, 0.001, -0.001]
        R_rect0 = _Rot.from_euler(
            "xyz", [0.3, -0.2, 0.1], degrees=True
        ).as_matrix()
        R_rect1 = _Rot.from_euler(
            "xyz", [-0.1, 0.25, -0.05], degrees=True
        ).as_matrix()
        T_10 = np.eye(4)
        T_10[:3, :3] = _Rot.from_euler(
            "xyz", [0.05, -0.4, 0.02], degrees=True
        ).as_matrix()
        T_10[:3, 3] = [-0.6, 0.002, 0.01]  # stereo-like baseline
        cam0_K = [380.0, 382.0, 318.0, 242.0]
        camr1_K = [398.0, 401.0, 322.0, 238.0]
    else:
        dist = [0.0, 0.0, 0.0, 0.0]
        R_rect0 = R_rect1 = np.eye(3)
        T_10 = np.eye(4)
        cam0_K = [400.0, 400.0, W / 2.0, H / 2.0]
        camr1_K = [400.0, 400.0, W / 2.0, H / 2.0]

    cam = {
        "intrinsics": {
            "cam0": {
                "camera_matrix": cam0_K,
                "distortion_coeffs": dist,
            },
            "camRect0": {"camera_matrix": [400.0, 400.0, W / 2.0, H / 2.0]},
            "camRect1": {"camera_matrix": camr1_K},
        },
        "extrinsics": {
            "R_rect0": R_rect0.tolist(),
            "R_rect1": R_rect1.tolist(),
            "T_10": T_10.tolist(),
        },
    }
    with open(cal_dir / "cam_to_cam.yaml", "w") as f:
        yaml.safe_dump(cam, f)

    img_ts = (t_offset + np.array([0, 100_000, 200_000, 300_000])).astype(
        np.int64
    )
    np.savetxt(img_dir / "timestamps.txt", img_ts, fmt="%d")
    # the reference loader reads this unconditionally (dsec_loader.py:116)
    with open(img_dir / "left/exposure_timestamps.txt", "w") as f:
        f.write("# exposure_start_timestamp_us, exposure_end_timestamp_us\n")
        for t in img_ts:
            f.write(f"{t - 2000}, {t + 2000}\n")

    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (H, W)).astype(np.uint8)
        ).save(img_dir / "left/rectified" / f"{i:06d}.png")

    # n_eval_windows eval windows with GT flow PNGs (100 ms each)
    eval_rows = np.array(
        [
            [t_offset + 100_000 * i, t_offset + 100_000 * (i + 1)]
            for i in range(n_eval_windows)
        ],
        np.int64,
    )
    with open(flow_dir / "forward_timestamps.txt", "w") as f:
        f.write("# from, to\n")
        for r in eval_rows:
            f.write(f"{r[0]},{r[1]}\n")
    for i in range(n_eval_windows):
        enc = np.zeros((H, W, 3), np.uint16)
        enc[..., 0] = int(2.0 * 128 + 2**15)  # flow_x = 2.0
        enc[..., 1] = int(-1.0 * 128 + 2**15)  # flow_y = -1.0
        enc[..., 2] = 1
        write_png16(flow_dir / "forward" / f"{i:06d}.png", enc)
    return root, seq


def make_dsec_test_tree(root, seed=7):
    """Minimal DSEC TEST-split tree (no GT) with identity geometry and an
    OFFICIAL eval-timestamp CSV (100 ms windows at 500 ms intervals); the
    extended `{seq}_.csv` is generated from it in the tests via
    `eincm_tpu.tools.dsec_extended_evals`.

    Returns (root, sequence_name)."""
    import h5py
    import yaml
    from PIL import Image

    rng = np.random.default_rng(seed)
    seq = "mini_test_seq"
    ev_dir = root / f"Test/test_events/{seq}/events/left"
    img_dir = root / f"Test/test_images/{seq}/images"
    cal_dir = root / f"Test/test_calibration/{seq}/calibration"
    eval_dir = root / "Evaluation/test_forward_optical_flow_timestamps"
    for d in [ev_dir, img_dir / "left/rectified", cal_dir, eval_dir]:
        d.mkdir(parents=True)

    H, W = 480, 640
    t_offset = 2_000_000
    n_images = 31  # ~20 fps with jitter -> ~1.5 s span
    img_rel_us = np.concatenate(
        [[0], np.cumsum(rng.integers(49_900, 50_100, n_images - 1))]
    ).astype(np.int64)
    img_ts = t_offset + img_rel_us
    np.savetxt(img_dir / "timestamps.txt", img_ts, fmt="%d")
    # the reference loader reads this unconditionally (dsec_loader.py:116)
    with open(img_dir / "left/exposure_timestamps.txt", "w") as f:
        f.write("# exposure_start_timestamp_us, exposure_end_timestamp_us\n")
        for t in img_ts:
            f.write(f"{t - 2000}, {t + 2000}\n")
    for i in range(n_images):
        Image.fromarray(
            rng.integers(0, 255, (H, W)).astype(np.uint8)
        ).save(img_dir / "left/rectified" / f"{i:06d}.png")

    n_ev = 20000
    span = int(img_rel_us[-1])
    ts = np.sort(rng.integers(0, span, n_ev)).astype(np.int64)
    with h5py.File(ev_dir / "events.h5", "w") as f:
        f["events/x"] = rng.integers(0, W, n_ev).astype(np.uint16)
        f["events/y"] = rng.integers(0, H, n_ev).astype(np.uint16)
        f["events/t"] = ts
        f["events/p"] = rng.integers(0, 2, n_ev).astype(np.uint8)
        f["ms_to_idx"] = np.searchsorted(ts, np.arange(span // 1000 + 1) * 1000)
        f["t_offset"] = t_offset

    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    rect = np.stack([gx, gy], axis=-1).astype(np.float32)  # identity rectify
    with h5py.File(ev_dir / "rectify_map.h5", "w") as f:
        f["rectify_map"] = rect

    cam = {
        "intrinsics": {
            "cam0": {
                "camera_matrix": [400.0, 400.0, 320.0, 240.0],
                "distortion_coeffs": [0.0, 0.0, 0.0, 0.0],
            },
            "camRect0": {"camera_matrix": [400.0, 400.0, 320.0, 240.0]},
            "camRect1": {"camera_matrix": [400.0, 400.0, 320.0, 240.0]},
        },
        "extrinsics": {
            "R_rect0": np.eye(3).tolist(),
            "R_rect1": np.eye(3).tolist(),
            "T_10": np.eye(4).tolist(),
        },
    }
    with open(cal_dir / "cam_to_cam.yaml", "w") as f:
        yaml.safe_dump(cam, f)

    # official eval windows: [ts[j-2], ts[j]] at j = 10, 20, 30
    with open(eval_dir / f"{seq}.csv", "w") as f:
        f.write("# from_timestamp_us, to_timestamp_us, file_index\n")
        for j in (10, 20, 30):
            f.write(f"{img_ts[j - 2]}, {img_ts[j]}, {j}\n")
    return root, seq


def make_ecd_tree(root, seed=4):
    """Minimal ECD sequence: events.txt, images.txt, images/.

    Returns (root, sequence_name)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    name = "slider_mini"
    seq = root / name
    (seq / "images").mkdir(parents=True)

    n_ev = 5000
    ts = np.sort(rng.uniform(0, 1.0, n_ev))
    xs = rng.integers(0, 240, n_ev)
    ys = rng.integers(0, 180, n_ev)  # raw 180-row sensor, loader crops y-2
    ps = rng.integers(0, 2, n_ev)
    with open(seq / "events.txt", "w") as f:
        for row in zip(ts, xs, ys, ps):
            f.write(f"{row[0]:.9f} {row[1]} {row[2]} {row[3]}\n")

    img_ts = np.linspace(0, 1.0, 6)
    with open(seq / "images.txt", "w") as f:
        for i, t in enumerate(img_ts):
            f.write(f"{t:.9f} images/frame_{i:08d}.png\n")
    for i in range(6):
        Image.fromarray(
            rng.integers(0, 255, (180, 240)).astype(np.uint8)
        ).save(seq / "images" / f"frame_{i:08d}.png")
    return root, name
