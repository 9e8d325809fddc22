"""Test configuration: force a virtual 8-device CPU mesh before JAX imports.

Multi-chip sharding paths are exercised on CPU via
`--xla_force_host_platform_device_count` (SURVEY.md §4 test strategy).
"""

import os

# force EXACTLY 8 virtual devices — the sharding tests assert that count,
# so a pre-existing different value must be replaced, not kept
_flags = [
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
_flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(_flags).strip()
# Force CPU: tests exercise multi-chip sharding on the virtual CPU mesh and
# must not depend on (or monopolize) the single real TPU chip. The host's
# sitecustomize force-registers the TPU plugin and resets jax_platforms, so
# the env var alone is not enough — override the config after import too.
# EINCM_REAL_TPU=1 opts out, enabling the hardware kernel parity tests
# (tests/test_tpu_kernels.py).
_real_tpu = os.environ.get("EINCM_REAL_TPU") == "1"
if not _real_tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
else:
    # hardware kernel compiles are slow through the relayed backend; cache
    # them across runs
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/eincm_jax_cache")

import jax

if not _real_tpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
