"""Dataset loader integration tests against tiny generated on-disk fixtures."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")


# ---------------------------------------------------------------------------
# MVSEC fixture
# ---------------------------------------------------------------------------

@pytest.fixture
def mvsec_root(tmp_path):
    """Minimal outdoor_day2 tree: hdf5 data + Flow GT npz."""
    from dataset_fixtures import make_mvsec_tree

    root = tmp_path / "mvsec"
    return make_mvsec_tree(root)


class TestMVSECLoader:
    def test_contract(self, mvsec_root):
        from eincm_tpu.data.mvsec import MVSECDataLoader

        dl = MVSECDataLoader(mvsec_root, "outdoor_day2", des_n_events=2000)
        dl.get_ready()
        assert dl.sensor_size == (256, 336)
        assert len(dl) > 0
        s = dl[len(dl) // 2]  # middle window: room to extend on both sides
        for k in ["events", "images", "image_ts", "flow_gt", "eval_ts",
                  "n_event_deficiency", "orig_n_events"]:
            assert k in s, k
        assert len(s["events"]["x"]) == 2000
        assert s["images"].shape[1:] == (256, 336)
        assert s["flow_gt"].shape == (256, 336, 2)
        # events are cropped into the 336x256 frame
        assert s["events"]["x"].max() < 336
        assert s["events"]["y"].max() < 256

    def test_gt_flow_short_dt_scaling(self, mvsec_root):
        from eincm_tpu.data.mvsec import MVSECDataLoader

        dl = MVSECDataLoader(mvsec_root, "outdoor_day2", delta_idx=1,
                             des_n_events=1000)
        dl.get_ready()
        s = dl[0]
        # constant GT field (1.5, -0.5)/gt_dt scaled by window dt
        t0, t1 = s["eval_ts"]
        gt_dt = dl.gt_flow_ts[1] - dl.gt_flow_ts[0]
        expect = 1.5 * (t1 - t0) / gt_dt
        np.testing.assert_allclose(
            s["flow_gt"][100, 100, 0], expect, rtol=1e-5
        )

    def test_gt_flow_propagation_multi_dt(self, mvsec_root):
        from eincm_tpu.data.mvsec import MVSECDataLoader

        # dt=8 images spans several gt_dt intervals -> propagation path
        dl = MVSECDataLoader(mvsec_root, "outdoor_day2", delta_idx=8,
                             des_n_events=1000)
        dl.get_ready()
        s = dl[0]
        t0, t1 = s["eval_ts"]
        gt_dt = dl.gt_flow_ts[1] - dl.gt_flow_ts[0]
        # constant field: propagation accumulates ~ (t1-t0)/gt_dt * flow
        expect = 1.5 * (t1 - t0) / gt_dt
        mid = s["flow_gt"][100:150, 100:200, 0]
        assert np.abs(np.median(mid) - expect) < 0.5

    def test_load_more_images(self, mvsec_root):
        from eincm_tpu.data.mvsec import MVSECDataLoader

        dl = MVSECDataLoader(mvsec_root, "outdoor_day2", delta_idx=4,
                             des_n_events=1000, load_more_images=True)
        dl.get_ready()
        s = dl[0]
        assert s["images"].shape[0] == 5  # delta_idx + 1 references
        assert len(s["image_ts"]) == 5


# ---------------------------------------------------------------------------
# DSEC fixture
# ---------------------------------------------------------------------------

@pytest.fixture
def dsec_root(tmp_path):
    """Minimal DSEC train-split tree with identity geometry."""
    from dataset_fixtures import make_dsec_tree

    return make_dsec_tree(tmp_path / "dsec")


class TestDSECLoader:
    def test_contract_train(self, dsec_root):
        from eincm_tpu.data.dsec import DSECDataLoader

        root, seq = dsec_root
        dl = DSECDataLoader(root, seq, des_n_events=5000, data_split="train")
        dl.get_ready()
        assert len(dl) == 2
        s = dl[0]
        for k in ["events", "images", "image_ts", "eval_ts_us", "flow_gt",
                  "valid2D", "n_event_deficiency", "orig_n_events"]:
            assert k in s, k
        assert len(s["events"]["x"]) == 5000
        np.testing.assert_allclose(s["flow_gt"][..., 0], 2.0)
        np.testing.assert_allclose(s["flow_gt"][..., 1], -1.0)
        assert s["valid2D"].all()
        # identity rectification keeps coords in-sensor
        assert s["events"]["x"].max() < 640
        # event times restored to absolute microseconds
        assert s["events"]["t"].min() >= 1_000_000

    def test_contract_test_split_extended(self, tmp_path):
        """Test split + the extended (continuous) eval timestamps, with the
        `{seq}_.csv` produced by the shipped generator rather than vendored
        (reference: src/experiments/e00/README.md 'DSEC Extended
        Evaluations', dsec_loader.py:128)."""
        from dataset_fixtures import make_dsec_test_tree
        from eincm_tpu.data.dsec import DSECDataLoader
        from eincm_tpu.tools.dsec_extended_evals import main as ext_main

        root, seq = make_dsec_test_tree(tmp_path / "dsec")

        # without the {seq}_.csv on disk the loader reconstructs the
        # extended timestamps in memory from the official CSV
        dl_auto = DSECDataLoader(
            root, seq, des_n_events=1000, data_split="test", extended=True
        )
        dl_auto.get_ready()

        out = ext_main(["--root_dir", str(root), "--sequence_name", seq])
        assert out.name == f"{seq}_.csv"

        dl = DSECDataLoader(root, seq, des_n_events=1000, data_split="test")
        dl.get_ready()
        dle = DSECDataLoader(
            root, seq, des_n_events=1000, data_split="test", extended=True
        )
        dle.get_ready()

        assert len(dl) == 3
        # 4 in-between 100 ms windows per official 500 ms interval
        assert len(dle) == 5 * (len(dl) - 1) + 1
        # the in-memory reconstruction equals the generated file exactly
        np.testing.assert_array_equal(dl_auto.eval_ts_us, dle.eval_ts_us)
        # the scores.txt [::5] subset rule recovers the official windows
        np.testing.assert_array_equal(dle.eval_ts_us[::5], dl.eval_ts_us)
        # continuous chaining, boundaries at actual image timestamps
        np.testing.assert_array_equal(
            dle.eval_ts_us[:-1, 1], dle.eval_ts_us[1:, 0]
        )
        np.testing.assert_array_equal(
            dle.eval_ts_us[:, 1], dl.l_image_ts_us[dle.eval_ts_us[:, 2]]
        )

        s = dle[1]  # an in-between window only the extended mode has
        for k in ["events", "images", "image_ts", "eval_ts_us", "file_idx",
                  "n_event_deficiency", "orig_n_events"]:
            assert k in s, k
        assert "flow_gt" not in s  # test split ships no ground truth
        assert s["file_idx"] == dle.eval_ts_us[1, 2]
        assert len(s["events"]["x"]) == 1000
        assert len(s["images"]) == 3  # i0..i1 inclusive over a 2-image span

    def test_identity_undistortion(self, dsec_root):
        from eincm_tpu.data.dsec import DSECDataLoader

        root, seq = dsec_root
        dl = DSECDataLoader(root, seq, des_n_events=1000, data_split="train")
        dl.get_ready()
        # zero distortion + identity rotation -> rectify map == pixel grid
        gx, gy = np.meshgrid(np.arange(640), np.arange(480))
        np.testing.assert_allclose(dl.event_rect_map[..., 0], gx, atol=1e-3)
        np.testing.assert_allclose(dl.event_rect_map[..., 1], gy, atol=1e-3)
        # identity homography -> image mapping == pixel grid
        np.testing.assert_allclose(dl.mapping[..., 0], gx, atol=1e-3)


class TestGeometry:
    def test_undistort_roundtrip_with_distortion(self):
        from eincm_tpu.data.geometry import _distort, undistort_points_iter

        K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
        dist = np.array([-0.1, 0.02, 0.001, -0.001])
        rng = np.random.default_rng(2)
        # ground-truth undistorted normalized points
        xn = rng.uniform(-0.5, 0.5, 100)
        yn = rng.uniform(-0.4, 0.4, 100)
        xd, yd = _distort(xn, yn, dist)
        px = xd * K[0, 0] + K[0, 2]
        py = yd * K[1, 1] + K[1, 2]
        out = undistort_points_iter(
            np.stack([px, py]), K, dist, np.eye(3), K
        )
        np.testing.assert_allclose(out[:, 0], xn * 400 + 320, atol=1e-2)
        np.testing.assert_allclose(out[:, 1], yn * 400 + 240, atol=1e-2)

    def test_transform_compose_inverse(self):
        from scipy.spatial.transform import Rotation as Rot

        from eincm_tpu.data.geometry import Transform

        rng = np.random.default_rng(3)
        a = Transform(rng.normal(0, 1, 3), Rot.random(rng=rng))
        b = Transform(rng.normal(0, 1, 3), Rot.random(rng=rng))
        ab = a @ b
        ident = ab @ ab.inverse()
        np.testing.assert_allclose(ident.t(), 0, atol=1e-12)
        np.testing.assert_allclose(
            ident.R_matrix(), np.eye(3), atol=1e-12
        )

    def test_remap_bicubic_identity(self, rng):
        from eincm_tpu.data.geometry import remap_bicubic

        img = rng.integers(0, 255, (32, 40)).astype(np.uint8)
        gx, gy = np.meshgrid(np.arange(40), np.arange(32))
        out = remap_bicubic(img, np.stack([gx, gy], -1).astype(np.float64))
        np.testing.assert_array_equal(out, img)

    def test_remap_bicubic_shift(self, rng):
        from eincm_tpu.data.geometry import remap_bicubic

        img = rng.integers(0, 255, (32, 40)).astype(np.uint8)
        gx, gy = np.meshgrid(np.arange(40), np.arange(32))
        out = remap_bicubic(
            img, np.stack([gx + 1.0, gy], -1).astype(np.float64)
        )
        np.testing.assert_array_equal(out[:, :-2], img[:, 1:-1])


class TestPng16:
    def test_roundtrip(self, rng, tmp_path):
        from eincm_tpu.utils.png16 import read_png16, write_png16

        img = rng.integers(0, 65535, (20, 30, 3)).astype(np.uint16)
        p = str(tmp_path / "t.png")
        write_png16(p, img)
        back = read_png16(p)
        np.testing.assert_array_equal(back, img)

    def test_pil_can_read_ours(self, rng, tmp_path):
        """Other tools (e.g. the DSEC benchmark server) must parse our PNGs."""
        from PIL import Image

        from eincm_tpu.utils.png16 import write_png16

        img = rng.integers(0, 65535, (8, 8)).astype(np.uint16)
        p = str(tmp_path / "t.png")
        write_png16(p, img)
        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(back, img)


# ---------------------------------------------------------------------------
# ECD fixture
# ---------------------------------------------------------------------------

@pytest.fixture
def ecd_root(tmp_path):
    """Minimal ECD sequence: events.txt, images.txt, images/."""
    from dataset_fixtures import make_ecd_tree

    root, _ = make_ecd_tree(tmp_path / "ecd")
    return root


class TestECDLoader:
    def test_contract(self, ecd_root):
        from eincm_tpu.data.ecd import ECDDataLoader

        dl = ECDDataLoader(ecd_root, "slider_mini", des_n_events=1000)
        dl.get_ready()
        assert dl.sensor_size == (176, 240)
        assert len(dl) == 5
        s = dl[2]
        for k in ["events", "images", "image_ts", "eval_ts",
                  "n_event_deficiency", "orig_n_events"]:
            assert k in s, k
        assert len(s["events"]["x"]) == 1000
        assert s["images"].shape[1:] == (176, 240)
        assert s["events"]["y"].max() < 176  # y-2 crop applied

    def test_stages_into_solver_sample(self, ecd_root):
        from eincm_tpu.data.ecd import ECDDataLoader
        from eincm_tpu.data.staging import stage_datasample

        dl = ECDDataLoader(ecd_root, "slider_mini", des_n_events=500)
        dl.get_ready()
        staged = stage_datasample(dl[1], preprocess=False)
        assert staged.window.edges.shape[1:] == (176, 240)
        t = np.asarray(staged.window.ts)
        assert t.min() > -0.5 and t.max() < 1.5
