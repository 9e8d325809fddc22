"""Direct tests for the small utility modules: flow visualization and JAX
runtime helpers (reference: src/utils/flow_utils.py, src/experiments/e00/
jax_helpers.py) — previously covered only indirectly through the plotters.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from eincm_tpu.utils import jax_helpers
from eincm_tpu.utils.flow_vis import (
    _WHEEL,
    embed_flow_code_in_img,
    flow_uv_to_img,
    get_flow_color_code,
)


class TestFlowVis:
    def test_colorwheel_shape_and_range(self):
        assert _WHEEL.shape == (55, 3)
        assert _WHEEL.min() >= 0 and _WHEEL.max() == 255
        # every row fully saturated in at least one channel
        assert np.all(_WHEEL.max(axis=1) == 255)

    def test_zero_flow_is_white(self):
        img = flow_uv_to_img(np.zeros((4, 5, 2)))
        assert img.shape == (4, 5, 3) and img.dtype == np.uint8
        assert np.all(img == 255)

    def test_cardinal_directions_distinct_and_saturated(self):
        flow = np.zeros((2, 2, 2))
        flow[0, 0] = (1, 0)
        flow[0, 1] = (-1, 0)
        flow[1, 0] = (0, 1)
        flow[1, 1] = (0, -1)
        img = flow_uv_to_img(flow)
        colors = {tuple(img[i, j]) for i in range(2) for j in range(2)}
        assert len(colors) == 4  # four directions, four hues
        # full-magnitude pixels are saturated, i.e. far from white
        assert int(img.reshape(-1, 3).min(axis=1).max()) < 200

    def test_magnitude_normalization_and_clip(self):
        flow = np.zeros((1, 2, 2))
        flow[0, 0] = (3.0, 0.0)
        flow[0, 1] = (1.5, 0.0)  # half magnitude -> paler (closer to white)
        img = flow_uv_to_img(flow)
        assert int(img[0, 1].min()) > int(img[0, 0].min())
        # clipping both to the same magnitude makes them identical
        clipped = flow_uv_to_img(flow, clip_flow=1.0)
        assert np.array_equal(clipped[0, 0], clipped[0, 1])

    def test_color_code_legend(self):
        legend = get_flow_color_code(32)
        assert legend.shape == (32, 32, 3) and legend.dtype == np.uint8
        # outside the wheel radius: white corners
        assert np.all(legend[0, 0] == 255) and np.all(legend[-1, -1] == 255)
        # inside: colored (not all white)
        assert legend.reshape(-1, 3).min() < 255

    def test_embed_code_in_corner(self):
        base = np.full((60, 90, 3), 7, np.uint8)
        out = embed_flow_code_in_img(base, code_size=16)
        assert base[0, 0, 0] == 7  # input not mutated
        assert np.array_equal(out[:44, :, :], base[:44, :, :])
        assert np.array_equal(out[44:, :74, :], base[44:, :74, :])
        assert np.array_equal(out[44:, 74:, :], get_flow_color_code(16))


class TestJaxHelpers:
    def test_update_jax_config_roundtrip(self):
        orig = jax.config.jax_debug_nans
        try:
            jax_helpers.update_jax_config({"jax_debug_nans": True})
            assert jax.config.jax_debug_nans is True
        finally:
            jax_helpers.update_jax_config({"jax_debug_nans": orig})

    def test_debug_mode_catches_nan(self):
        try:
            jax_helpers.enable_debug_mode()
            assert jax.config.jax_debug_nans is True
            with np.testing.assert_raises(FloatingPointError):
                jnp.asarray(0.0) / jnp.asarray(0.0)
        finally:
            jax_helpers.disable_debug_mode()
        assert jax.config.jax_debug_nans is False

    def test_print_jax_info(self, capsys):
        info = jax_helpers.print_jax_info()
        assert jax.default_backend() in info
        assert info in capsys.readouterr().out

    def test_delete_on_device_buffers_subprocess(self):
        # deleting every live array would poison this process's cached
        # trace-time constants; exercise the destructive path isolated
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "import jax.numpy as jnp\n"
            "from eincm_tpu.utils.jax_helpers import delete_on_device_buffers\n"
            "xs = [jnp.arange(3), jnp.ones((2, 2))]\n"
            "n = delete_on_device_buffers()\n"
            "assert n >= 2, n\n"
            "print('deleted', n)\n"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert out.returncode == 0, out.stderr
        assert "deleted" in out.stdout
