"""Direct code-vs-code parity check of the DATA LAYER vs the reference.

Drives the reference's own dataloaders (/root/reference/src/dataloaders/)
and eincm_tpu's loaders over identical generated fixture trees
(tests/dataset_fixtures.py) and compares every loader attribute and every
datasample dict, then prints one JSON line of results. Executed in a
subprocess by tests/test_reference_parity.py (TestLoaderParity) so the cv2 /
imageio / easydict stubs cannot leak into the main test process.

What this proves: the window slicing (searchsorted boundaries, side=left/
right), des_n_events pad/truncate policy (dsec_loader.py:285-349), event
rectification + in-sensor filtering (dsec_loader.py:145-171), the image
homography mapping (dsec_loader.py:188-219), MVSEC sensor crop + per-
sequence GT pruning + outdoor_day1 hood filter (mvsec_loader.py:113-244),
EV-FlowNet GT-flow temporal propagation (mvsec_loader.py:322-433), and ECD
crop/windows (ecd_loader.py:22-139) are BIT-EXACT between the two
codebases on the same inputs.

What it cannot prove (cv2 absent from this container — documented in
PARITY.md): OpenCV's own numerics. The stubs delegate to our independently
tested geometry (Catmull-Rom bicubic vs cv INTER_CUBIC, our iterative
undistortion vs cv.undistortPointsIter) and a round-half-even nearest remap,
so both loaders see IDENTICAL image/geometry primitives and the comparison
isolates the loader *logic* — the last data-layer equivalence class that was
previously tested only against hand-derived expectations.

Reference quirks preserved rather than "fixed" here:
- ECD __len__ returns len(eval_ts) == 2 (shape (2, N) — ecd_loader.py:139);
  sample count is eval_ts.shape[1]. Ours returns the true window count.
- MVSEC polarity: reference `.astype(bool)` maps the real -1/+1 encoding to
  all-True (mvsec_loader.py:127); ours keeps the sign (`> 0`). The fixture
  writes -1/+1 so this documented deviation is asserted explicitly.
"""

import json
import os
import sys
import tempfile
import types
from pathlib import Path

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from eincm_tpu.data.geometry import remap_bicubic, undistort_points_iter  # noqa: E402
from eincm_tpu.data.readers import imread_gray  # noqa: E402
from eincm_tpu.utils.png16 import read_png16  # noqa: E402


# ---------------------------------------------------------------------------
# stubs: cv2 / imageio / easydict
# ---------------------------------------------------------------------------

def _nearest_remap(src, xc, yc):
    """cv.remap(..., INTER_NEAREST) semantics: round coords, gather, zero
    (BORDER_CONSTANT default) outside. Rounding at exact .5 uses numpy's
    round-half-even — the one convention difference vs OpenCV's fixed-point
    rounding that cannot be measured without cv2 (measure-zero for float
    flow fields)."""
    h, w = src.shape[:2]
    xi = np.round(xc).astype(np.int64)
    yi = np.round(yc).astype(np.int64)
    inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    out = np.zeros(xc.shape, dtype=src.dtype)
    out[inside] = src[yi[inside], xi[inside]]
    return out


def install_stubs():
    cv2 = types.ModuleType("cv2")
    cv2.IMREAD_GRAYSCALE = 0
    cv2.INTER_NEAREST = 0
    cv2.INTER_LINEAR = 1
    cv2.INTER_CUBIC = 2
    cv2.TERM_CRITERIA_EPS = 2
    cv2.TERM_CRITERIA_MAX_ITER = 1

    def imread(path, flag=cv2.IMREAD_GRAYSCALE):
        assert flag == cv2.IMREAD_GRAYSCALE
        return imread_gray(path)

    def remap(src, map1, map2=None, interpolation=cv2.INTER_CUBIC):
        if interpolation == cv2.INTER_NEAREST:
            return _nearest_remap(src, map1, map2)
        assert interpolation == cv2.INTER_CUBIC and map2 is None
        return remap_bicubic(src, map1)

    def undistortPointsIter(coords, K, dist, R, P, criteria=None):
        n_iters = criteria[1] if criteria is not None else 100
        eps = criteria[2] if criteria is not None else 1e-3
        return undistort_points_iter(
            np.asarray(coords, np.float64), K, dist, R, P,
            n_iters=n_iters, eps=eps,
        )

    cv2.imread = imread
    cv2.remap = remap
    cv2.undistortPointsIter = undistortPointsIter
    sys.modules["cv2"] = cv2

    iio = types.ModuleType("imageio")
    iio_v2 = types.ModuleType("imageio.v2")
    iio_plugins = types.ModuleType("imageio.plugins")
    iio_freeimage = types.ModuleType("imageio.plugins.freeimage")
    iio_freeimage.download = lambda *a, **k: None
    iio_plugins.freeimage = iio_freeimage
    iio.plugins = iio_plugins
    iio_v2.imread = lambda path, format=None: read_png16(path)
    iio.v2 = iio_v2
    sys.modules["imageio"] = iio
    sys.modules["imageio.v2"] = iio_v2
    sys.modules["imageio.plugins"] = iio_plugins
    sys.modules["imageio.plugins.freeimage"] = iio_freeimage

    easydict = types.ModuleType("easydict")

    class EasyDict(dict):
        __getattr__ = dict.__getitem__
        __setattr__ = dict.__setitem__

    easydict.EasyDict = EasyDict
    sys.modules["easydict"] = easydict


install_stubs()
REF = "/root/reference/src"
sys.path.insert(0, REF)

from dataloaders.dsec_loader import DSECDataLoader as RefDSEC  # noqa: E402
from dataloaders.ecd_loader import ECDDataLoader as RefECD  # noqa: E402
from dataloaders.mvsec_loader import MVSECDataLoader as RefMVSEC  # noqa: E402

from eincm_tpu.data.dsec import DSECDataLoader as OurDSEC  # noqa: E402
from eincm_tpu.data.ecd import ECDDataLoader as OurECD  # noqa: E402
from eincm_tpu.data.mvsec import MVSECDataLoader as OurMVSEC  # noqa: E402

from dataset_fixtures import (  # noqa: E402
    make_dsec_test_tree,
    make_dsec_tree,
    make_ecd_tree,
    make_mvsec_tree,
)


# ---------------------------------------------------------------------------
# comparison helpers
# ---------------------------------------------------------------------------

def max_abs(a, b, label, diffs):
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape, f"{label}: shape {a.shape} vs {b.shape}"
    if a.size == 0:
        diffs[label] = 0.0
        return
    if a.dtype == bool or b.dtype == bool:
        d = float(np.sum(a != b))
    else:
        d = float(np.max(np.abs(a.astype(np.float64) - b.astype(np.float64))))
    diffs[label] = max(diffs.get(label, 0.0), d)


def compare_sample(ref_s, our_s, label, diffs, skip=(), rename=None):
    rename = rename or {}
    for k, rv in ref_s.items():
        if k in skip:
            continue
        ok = rename.get(k, k)
        assert ok in our_s, f"{label}: ours missing key {ok}"
        ov = our_s[ok]
        if isinstance(rv, dict):
            for ek, ev in rv.items():
                if ek in skip:
                    continue
                max_abs(ev, ov[ek], f"{label}.{k}.{ek}", diffs)
        elif isinstance(rv, list):
            assert len(rv) == len(ov), f"{label}.{k}: length"
            for i, (r_i, o_i) in enumerate(zip(rv, ov)):
                max_abs(r_i, o_i, f"{label}.{k}", diffs)
        else:
            max_abs(rv, ov, f"{label}.{k}", diffs)


# ---------------------------------------------------------------------------
# per-dataset checks
# ---------------------------------------------------------------------------

def check_dsec_train(tmp, diffs, geometry="identity"):
    tag = "dsec" if geometry == "identity" else "dsecw"
    root, seq = make_dsec_tree(tmp / tag, geometry=geometry)
    ref = RefDSEC(root, seq, des_n_events=5000, data_split="train")
    ref.get_ready()
    ours = OurDSEC(root, seq, des_n_events=5000, data_split="train")
    ours.get_ready()

    for k in ("x", "y", "t", "p"):
        max_abs(ref.l_events[k], ours.l_events[k], f"{tag}.l_events.{k}", diffs)
        assert ref.l_events[k].dtype == ours.l_events[k].dtype, (
            f"{tag}.l_events.{k} dtype {ref.l_events[k].dtype} vs "
            f"{ours.l_events[k].dtype}"
        )
    max_abs(ref.ms_to_idx, ours.ms_to_idx, f"{tag}.ms_to_idx", diffs)
    max_abs(ref.t_offset, ours.t_offset, f"{tag}.t_offset", diffs)
    max_abs(ref.l_image_ts_us, ours.l_image_ts_us, f"{tag}.image_ts", diffs)
    max_abs(ref.eval_ts_us, ours.eval_ts_us, f"{tag}.eval_ts_us", diffs)
    max_abs(
        ref.eval_event_start_idxs, ours.eval_event_start_idxs,
        f"{tag}.eval_event_start", diffs,
    )
    max_abs(
        ref.eval_event_end_idxs, ours.eval_event_end_idxs,
        f"{tag}.eval_event_end", diffs,
    )
    max_abs(
        ref.eval_image_start_idxs, ours.eval_image_start_idxs,
        f"{tag}.eval_image_start", diffs,
    )
    max_abs(
        ref.eval_image_end_idxs, ours.eval_image_end_idxs,
        f"{tag}.eval_image_end", diffs,
    )
    # geometry products: float64 op-order differs (reference per-pixel
    # squeeze vs our batched matmul) -> eps, not bit, equality
    max_abs(ref.mapping, ours.mapping, f"{tag}.mapping", diffs)
    max_abs(
        ref.event_rect_map, ours.event_rect_map, f"{tag}.event_rect_map", diffs
    )

    assert len(ref) == len(ours) == 2
    for i in range(len(ref)):
        compare_sample(ref[i], ours[i], f"{tag}.sample", diffs)

    # deficiency-padding corner: ask for more events than the window has so
    # the symmetric extension path (dsec_loader.py:299-304) engages
    ref_pad = RefDSEC(root, seq, des_n_events=20000, data_split="train")
    ref_pad.get_ready()
    our_pad = OurDSEC(root, seq, des_n_events=20000, data_split="train")
    our_pad.get_ready()
    for i in range(2):
        compare_sample(ref_pad[i], our_pad[i], f"{tag}.sample_pad", diffs)

    # prefer_latest_events=False truncation branch (dsec_loader.py:309-312)
    ref_tr = RefDSEC(
        root, seq, des_n_events=3000, data_split="train",
        prefer_latest_events=False,
    )
    ref_tr.get_ready()
    our_tr = OurDSEC(
        root, seq, des_n_events=3000, data_split="train",
        prefer_latest_events=False,
    )
    our_tr.get_ready()
    compare_sample(ref_tr[0], our_tr[0], f"{tag}.sample_trunc", diffs)


def check_dsec_test_extended(tmp, diffs):
    from eincm_tpu.tools.dsec_extended_evals import main as ext_main

    root, seq = make_dsec_test_tree(tmp / "dsec_test")
    # materialize the extended CSV the reference expects on disk (the
    # reference has no generator; users copy it from its docs assets)
    ext_main(["--root_dir", str(root), "--sequence_name", seq])

    for extended, tag in ((False, "official"), (True, "extended")):
        ref = RefDSEC(
            root, seq, des_n_events=1000, data_split="test", extended=extended
        )
        ref.get_ready()
        ours = OurDSEC(
            root, seq, des_n_events=1000, data_split="test", extended=extended
        )
        ours.get_ready()
        max_abs(
            ref.eval_ts_us, ours.eval_ts_us, f"dsec_test.{tag}.eval_ts", diffs
        )
        assert len(ref) == len(ours)
        for i in range(len(ref)):
            compare_sample(
                ref[i], ours[i], f"dsec_test.{tag}.sample", diffs
            )


def check_mvsec(tmp, diffs):
    root = make_mvsec_tree(
        tmp / "mvsec", sequence="outdoor_day2", polarity="pm1",
        gt_mode="varying", gt_margin=0.05,
    )

    for delta_idx, more, newlim in (
        (1, False, False), (4, False, False), (4, True, False),
        (8, False, False), (4, False, True),
    ):
        tag = f"mvsec.d{delta_idx}{'m' if more else ''}{'n' if newlim else ''}"
        ref = RefMVSEC(
            root, "outdoor_day2", delta_idx=delta_idx, des_n_events=2000,
            load_more_images=more, use_new_pruning_limits=newlim,
        )
        ref.get_ready()
        ours = OurMVSEC(
            root, "outdoor_day2", delta_idx=delta_idx, des_n_events=2000,
            load_more_images=more, use_new_pruning_limits=newlim,
        )
        ours.get_ready()

        for k in ("x", "y", "t"):
            max_abs(ref.l_events[k], ours.l_events[k], f"{tag}.events.{k}",
                    diffs)
        # documented polarity deviation: with -1/+1 input the reference's
        # astype(bool) is all-True; ours keeps the sign
        assert bool(np.all(ref.l_events["p"])), "ref polarity not all-True?"
        assert not bool(np.all(ours.l_events["p"])), (
            "our polarity should keep the -1 sign"
        )
        max_abs(ref.l_image_raw, ours.l_image_raw, f"{tag}.images", diffs)
        max_abs(ref.l_image_raw_ts, ours.l_image_raw_ts, f"{tag}.image_ts",
                diffs)
        max_abs(
            ref.l_image_raw_event_inds, ours.l_image_raw_event_inds,
            f"{tag}.image_event_inds", diffs,
        )
        max_abs(ref.gt_flow_ts, ours.gt_flow_ts, f"{tag}.gt_ts", diffs)
        max_abs(ref.gt_x_flow_dist, ours.gt_x_flow_dist, f"{tag}.gt_x", diffs)
        max_abs(ref.gt_y_flow_dist, ours.gt_y_flow_dist, f"{tag}.gt_y", diffs)

        assert len(ref) == len(ours), f"{tag}: len {len(ref)} vs {len(ours)}"
        idxs = [0, len(ours) // 2, len(ours) - 1]
        for i in idxs:
            compare_sample(ref[i], ours[i], f"{tag}.sample", diffs, skip=("p",))

    # outdoor_day1: hood-of-car event filter + its pruning table row
    root1 = make_mvsec_tree(
        tmp / "mvsec1", sequence="outdoor_day1", polarity="pm1",
        gt_mode="varying", gt_margin=0.05, seed=11,
    )
    ref = RefMVSEC(root1, "outdoor_day1", delta_idx=4, des_n_events=2000)
    ref.get_ready()
    ours = OurMVSEC(root1, "outdoor_day1", delta_idx=4, des_n_events=2000)
    ours.get_ready()
    assert int(ours.l_events["y"].max()) < 190, "hood filter not applied"
    for k in ("x", "y", "t"):
        max_abs(ref.l_events[k], ours.l_events[k], f"mvsec.od1.events.{k}",
                diffs)
    assert len(ref) == len(ours)
    compare_sample(ref[0], ours[0], "mvsec.od1.sample", diffs, skip=("p",))


def check_ecd(tmp, diffs):
    root, name = make_ecd_tree(tmp / "ecd")
    ref = RefECD(root, name, des_n_events=1000)
    ref.get_ready()
    ours = OurECD(root, name, des_n_events=1000)
    ours.get_ready()

    for k in ("x", "y", "t", "p"):
        max_abs(ref.events[k], ours.events[k], f"ecd.events.{k}", diffs)
    max_abs(ref.image_ts, ours.image_ts, "ecd.image_ts", diffs)
    max_abs(ref.eval_ts, ours.eval_ts, "ecd.eval_ts", diffs)
    max_abs(
        ref.eval_event_start_idxs, ours.eval_event_start_idxs,
        "ecd.eval_event_start", diffs,
    )
    max_abs(
        ref.eval_event_end_idxs, ours.eval_event_end_idxs,
        "ecd.eval_event_end", diffs,
    )
    # reference __len__ is len(eval_ts) == 2 (shape quirk, ecd_loader.py:139);
    # the true sample count is eval_ts.shape[1]
    n = ref.eval_ts.shape[1]
    assert len(ours) == n, f"ecd: our len {len(ours)} vs true count {n}"
    assert len(ref) == 2
    for i in range(n):
        compare_sample(ref[i], ours[i], "ecd.sample", diffs)


def main():
    diffs = {}
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        check_dsec_train(tmp, diffs)
        check_dsec_train(tmp, diffs, geometry="warped")
        check_dsec_test_extended(tmp, diffs)
        check_mvsec(tmp, diffs)
        check_ecd(tmp, diffs)

    geometry_keys = {
        "dsec.mapping", "dsec.event_rect_map",
        "dsecw.mapping", "dsecw.event_rect_map",
    }
    results = {
        "max_exact": max(
            (v for k, v in diffs.items() if k not in geometry_keys),
            default=0.0,
        ),
        "geometry_max": max(
            (v for k, v in diffs.items() if k in geometry_keys), default=0.0
        ),
        "n_comparisons": len(diffs),
        "nonzero": {k: v for k, v in diffs.items() if v != 0.0},
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
