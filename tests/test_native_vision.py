"""Native C++ vision backend vs the numpy fallbacks.

The edge pipeline prefers the C++ implementations (eincm_tpu/native/vision.cpp)
whenever the shared object builds (`edge/pipeline.py:_native_or`), yet the
numpy fallbacks are what the edge-extraction tests exercise directly. This
module pins the two backends together so the shipped default path cannot
silently diverge from the tested one.

Measured equivalence (48x64 and 37x53 structured images): Gaussian blur agrees
to f64 rounding; NL-means and CLAHE agree except for <=0.2% of pixels off by
one grey level (integer rounding ties between the two implementations);
bilateral, Canny, and the Meijster EDT (vs scipy's distance_transform_edt,
reference: src/utils/img_utils.py:230) are exact.
"""

import numpy as np
import pytest

from eincm_tpu.edge import filters_np
from eincm_tpu.edge.canny import canny as canny_np

nv = pytest.importorskip("eincm_tpu.native.vision")

pytestmark = pytest.mark.skipif(
    not nv.available(), reason="native vision library failed to build"
)


def _structured_image(shape, seed):
    rng = np.random.default_rng(seed)
    h, w = shape
    yy, xx = np.mgrid[:h, :w]
    img = rng.uniform(0, 255, shape) * 0.3
    img += 120 * np.sin(yy / 6) * np.cos(xx / 9) + 100
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(params=[((48, 64), 42), ((37, 53), 7)], ids=["48x64", "37x53"])
def img(request):
    return _structured_image(*request.param)


def _off_by_one(a, b, max_frac):
    """Assert u8 arrays agree except off-by-one rounding ties on a small
    fraction of pixels."""
    d = np.abs(a.astype(int) - b.astype(int))
    assert d.max() <= 1, f"max grey-level delta {d.max()}"
    frac = (d > 0).mean()
    assert frac <= max_frac, f"{frac:.4%} pixels differ (allowed {max_frac:.2%})"


@pytest.mark.parametrize("sigma", [0.8, 2.0])
def test_gaussian_blur(img, sigma):
    a = nv.gaussian_blur(img.astype(np.float64), sigma)
    b = filters_np.gaussian_blur(img.astype(np.float64), sigma)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)


def test_nl_means(img):
    _off_by_one(nv.nl_means_denoise(img), filters_np.nl_means_denoise(img), 0.005)


def test_clahe(img):
    _off_by_one(nv.clahe(img), filters_np.clahe(img), 0.005)


def test_clahe_nondefault_tiles(img):
    _off_by_one(
        nv.clahe(img, clip_limit=2.0, tile_grid_size=(4, 6)),
        filters_np.clahe(img, clip_limit=2.0, tile_grid_size=(4, 6)),
        0.005,
    )


def test_bilateral(img):
    np.testing.assert_array_equal(
        nv.bilateral_filter(img), filters_np.bilateral_filter(img)
    )


@pytest.mark.parametrize("th", [(30, 80), (100, 200)])
def test_canny(img, th):
    np.testing.assert_array_equal(
        nv.canny(img, *th), canny_np(img, *th)
    )


def test_exact_edt_vs_scipy(img):
    from scipy import ndimage

    mask = canny_np(img, 30, 80) > 0
    assert mask.any() and not mask.all()
    np.testing.assert_array_equal(
        nv.exact_edt(mask), ndimage.distance_transform_edt(~mask)
    )


def test_pipeline_dispatches_native():
    """_native_or must actually select the C++ backend when it is built."""
    from eincm_tpu.edge import pipeline

    assert pipeline._native_or(filters_np.nl_means_denoise) is nv.nl_means_denoise
    assert pipeline._native_or(filters_np.clahe) is nv.clahe
    assert pipeline._native_or(filters_np.bilateral_filter) is nv.bilateral_filter
    assert pipeline._native_or(canny_np) is nv.canny
