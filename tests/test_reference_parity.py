"""Direct numeric parity vs the reference implementation (/root/reference).

Runs tests/reference_parity_check.py in a subprocess (it enables x64 and
stubs cv2; neither may leak into this process) and asserts the reported
relative errors. Reference formulas: src/eincm/losses.py:49-276,
src/utils/event_utils.py:13-61. Measured round-2 values are recorded in
PARITY.md.
"""

import json
import os
import subprocess
import sys

import pytest

REF = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def parity():
    script = os.path.join(os.path.dirname(__file__), "reference_parity_check.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, script],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    assert res.returncode == 0, f"parity check failed:\n{res.stderr[-4000:]}"
    return json.loads(res.stdout.strip().splitlines()[-1])


def test_objectives_f64(parity):
    # every key of compute_loss_objectives matches the reference in f64
    assert parity["objectives_f64"] <= 1e-9, parity["objectives_f64_per_key"]


def test_loss_and_grad_f64(parity):
    assert parity["loss_f64"] <= 1e-9
    assert parity["grad_f64"] <= 1e-9


def test_solver_path_f64(parity):
    # the lean optimizer-path loss is numerically the reference loss
    assert parity["solver_loss_f64"] <= 1e-9
    assert parity["solver_grad_f64"] <= 1e-9


def test_handover_f64(parity):
    assert parity["handover_f64"] <= 1e-9


def test_f32_delta_bounded(parity):
    # informational bound: f32 is the TPU production dtype; the delta vs the
    # reference's f64 must stay in the single-precision regime
    assert parity["loss_f32"] <= 1e-5
    assert parity["grad_f32"] <= 1e-4


def test_splat_wrap_compat_mode(parity):
    # opt-in wrap-compat splat reproduces the reference kernel's
    # negative-index wrapping bit behavior (src/utils/event_utils.py:59)
    assert parity["splat_wrap_compat"] <= 1e-12


def test_wrap_vs_drop_reported(parity):
    # drop-vs-wrap is a deliberate, documented deviation that only engages
    # when warped splat windows leave the sensor (ops/splat.py); sanity-bound
    # it so a regression in the drop path would be caught
    assert parity["wrap_vs_drop"] <= 0.2
