"""eincm_tpu — TPU-native Edge-Informed Contrast Maximization.

A from-scratch JAX/XLA/Pallas framework for model-based event-camera optical
flow estimation with the capabilities of
robotic-vision-lab/Edge-Informed-Contrast-Maximization (WACV 2025), redesigned
TPU-first:

- The hot warp+splat kernel is expressed as banded one-hot matmuls on the MXU
  instead of scatter-adds (reference: src/utils/event_utils.py:42-59).
- The BFGS optimization loop runs entirely on device under `jit`
  (reference: host-side scipy via jaxopt, src/eincm/solver.py:165-183).
- Event windows batch under `vmap` and shard over a `jax.sharding.Mesh`
  (reference: single-device sequential loop, src/experiments/e00/exp_mgr.py:620).
"""

__version__ = "0.1.0"
