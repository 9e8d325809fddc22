"""Pallas coarse-theta interp kernel vs the XLA one-hot matmul path.

Runs in interpret mode on CPU; real-TPU parity is covered by
tests/test_tpu_kernels.py (EINCM_REAL_TPU=1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eincm_tpu.ops.interp_pallas import interp_theta_at_events_pallas
from eincm_tpu.ops.warp import interp_theta_at_events

SENSOR = (48, 64)


def _case(rng, n, gh, gw, spread=0.0):
    H, W = SENSOR
    xs = jnp.asarray(
        rng.uniform(-spread, W - 1 + spread, n).astype(np.float32)
    )
    ys = jnp.asarray(
        rng.uniform(-spread, H - 1 + spread, n).astype(np.float32)
    )
    theta = jnp.asarray(rng.normal(0, 3, (gh, gw, 2)).astype(np.float32))
    return theta, xs, ys


@pytest.mark.parametrize(
    "gh,gw,n,spread",
    [
        (16, 16, 3000, 0.0),
        (1, 1, 257, 0.0),  # level-0 grid, non-128-multiple event count
        (8, 11, 1024, 0.0),  # non-square, non-8-multiple width
        (3, 5, 31, 0.0),
        # off-sensor events (real warped data): the u<0 / u>n-1 edge
        # renormalization branch of the axis weights
        (16, 16, 2048, 25.0),
        (4, 6, 513, 3.0),
    ],
)
def test_forward_matches_xla(rng, gh, gw, n, spread):
    theta, xs, ys = _case(rng, n, gh, gw, spread)
    a = interp_theta_at_events_pallas(theta, xs, ys, SENSOR, True)
    b = interp_theta_at_events(theta, xs, ys, SENSOR)
    # The kernel contracts (theta @ uy) then reduces over x-weights; the XLA
    # path associates the same triple product the other way — agreement is
    # f32-reduction-order, not bitwise.
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=3e-5, atol=1e-5
    )


def test_forward_off_sensor_rows_are_zero(rng):
    """Far off-sensor events (the NaN-padding sentinel) interpolate to 0."""
    theta, xs, ys = _case(rng, 64, 8, 8)
    xs = xs.at[:5].set(-1e4)
    ys = ys.at[:5].set(-1e4)
    out = interp_theta_at_events_pallas(theta, xs, ys, SENSOR, True)
    np.testing.assert_array_equal(np.asarray(out[:5]), 0.0)


def test_grad_matches_xla(rng):
    theta, xs, ys = _case(rng, 2000, 16, 16)
    cot = jnp.asarray(rng.normal(0, 1, (2000, 2)).astype(np.float32))

    def f_pal(t):
        return jnp.vdot(
            interp_theta_at_events_pallas(t, xs, ys, SENSOR, True), cot
        )

    def f_xla(t):
        return jnp.vdot(interp_theta_at_events(t, xs, ys, SENSOR), cot)

    ga = jax.grad(f_pal)(theta)
    gb = jax.grad(f_xla)(theta)
    np.testing.assert_allclose(
        np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-5
    )
    # event coordinates enter through round(): zero cotangent, like XLA
    gx = jax.grad(lambda x: jnp.vdot(
        interp_theta_at_events_pallas(theta, x, ys, SENSOR, True), cot
    ))(xs)
    np.testing.assert_array_equal(np.asarray(gx), 0.0)


def test_grad_ignores_padded_events(rng):
    """dtheta from a padded call equals dtheta from the unpadded events."""
    theta, xs, ys = _case(rng, 300, 8, 8)
    xs2 = jnp.concatenate([xs, jnp.full((45,), -1e4, jnp.float32)])
    ys2 = jnp.concatenate([ys, jnp.full((45,), -1e4, jnp.float32)])
    cot = jnp.asarray(rng.normal(0, 1, (300, 2)).astype(np.float32))
    cot2 = jnp.concatenate([cot, jnp.zeros((45, 2), jnp.float32)])
    g1 = jax.grad(lambda t: jnp.vdot(
        interp_theta_at_events_pallas(t, xs, ys, SENSOR, True), cot
    ))(theta)
    g2 = jax.grad(lambda t: jnp.vdot(
        interp_theta_at_events_pallas(t, xs2, ys2, SENSOR, True), cot2
    ))(theta)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_large_grid_vmem_capped_chunk(rng):
    """At the routing ceiling (h = w = 128) the per-iteration weight planes
    are 32x a 16x16 grid's; _prep_events must cap the lane width to the
    VMEM budget and the capped multi-chunk kernel must still match XLA."""
    import eincm_tpu.ops.interp_pallas as mod

    hp = wp = 128
    max_ck8 = mod._PLANE_VMEM_BUDGET // (4 * (hp + 3 * wp))
    max_ck8 = max(128, (max_ck8 // 128) * 128)
    n = max_ck8 * mod._SUBL * 2 + 511  # forces >1 chunk under the cap
    xi, yi, n_chunks, ck8 = mod._prep_events(
        jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
        mod._CHUNK, hp, wp,
    )
    assert ck8 <= max_ck8 and n_chunks >= 3
    assert 4 * ck8 * (hp + 3 * wp) <= mod._PLANE_VMEM_BUDGET

    theta, xs, ys = _case(rng, 4096, 128, 128, 8.0)
    # shrink the budget so the CAPPED path actually runs multi-chunk here
    # (at the real budget 4096 events fit one chunk and the cap is idle)
    orig = mod._PLANE_VMEM_BUDGET
    try:
        mod._PLANE_VMEM_BUDGET = 4 * 128 * (hp + 3 * wp)  # max_ck8 == 128
        xi, yi, n_chunks, ck8 = mod._prep_events(
            xs, ys, mod._CHUNK, hp, wp
        )
        assert ck8 == 128 and n_chunks == 4
        a = interp_theta_at_events_pallas(theta, xs, ys, SENSOR, True)
    finally:
        mod._PLANE_VMEM_BUDGET = orig
    b = interp_theta_at_events(theta, xs, ys, SENSOR)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=3e-5, atol=1e-5
    )


def test_multi_chunk_consistency(rng):
    """> one grid step (chunk adapts to event count but caps at 64k) —
    forward AND backward: the bwd kernel's cross-grid-step accumulator
    (init at step 0, flush at the last step) only engages with n_chunks > 1
    and otherwise has no interpret-mode coverage."""
    import eincm_tpu.ops.interp_pallas as mod

    theta, xs, ys = _case(rng, 5000, 16, 16)
    cot = jnp.asarray(rng.normal(0, 1, (5000, 2)).astype(np.float32))
    orig = mod._CHUNK
    try:
        mod._CHUNK = 2048  # force 3 chunks
        a = interp_theta_at_events_pallas(theta, xs, ys, SENSOR, True)
        ga = jax.grad(lambda t: jnp.vdot(
            interp_theta_at_events_pallas(t, xs, ys, SENSOR, True), cot
        ))(theta)
    finally:
        mod._CHUNK = orig
    b = interp_theta_at_events(theta, xs, ys, SENSOR)
    gb = jax.grad(lambda t: jnp.vdot(
        interp_theta_at_events(t, xs, ys, SENSOR), cot
    ))(theta)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=3e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-4
    )
