"""jaxopt-style compatibility wrappers over the on-device optimizers.

The reference drives its solves through `jaxopt.ScipyMinimize` /
`jaxopt.ScipyBoundedMinimize` (src/eincm/solver.py:165-183) — host-side
scipy with a hand-patched jaxopt for callbacks. These wrappers give code
written against that API a drop-in path onto the fully on-device BFGS /
golden-section solvers (`eincm_tpu.models.bfgs`):

    solver = ScipyMinimize(fun=loss, method="BFGS", maxiter=40,
                           options={"gtol": 1e-4}, has_aux=True)
    res = solver.run(x0, *loss_args)
    res.params, res.state.fun_val, res.state.success, res.state.iter_num

Differences from jaxopt, by design:
  - everything runs inside one jitted computation (no host round-trips);
  - `callback` is accepted but executed AFTER the solve over the recorded
    on-device trajectory (post-hoc, one call per iterate) instead of
    per-iteration from inside scipy;
  - only method="BFGS" (ScipyMinimize) and the 1-D bounded case
    (ScipyBoundedMinimize, matching the reference's handover solve) are
    provided — the only configurations the reference uses.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from eincm_tpu.models.bfgs import (
    BFGSHistory,
    minimize_bfgs,
    minimize_bounded_scalar,
)


class OptStep(NamedTuple):
    """jaxopt-compatible result pair."""

    params: Any
    state: Any


class _IntermediateResult(NamedTuple):
    """Mimics scipy's callback payload (reference callbacks read .x/.fun,
    src/eincm/callbacks.py:131-132)."""

    x: jax.Array
    fun: jax.Array


@dataclass
class ScipyMinimize:
    """On-device stand-in for jaxopt.ScipyMinimize (method='BFGS')."""

    fun: Callable
    method: str = "BFGS"
    maxiter: int = 100
    tol: Optional[float] = None
    jit: bool = True
    has_aux: bool = False
    options: dict = field(default_factory=dict)
    callback: Optional[Callable] = None

    def __post_init__(self):
        assert self.method.upper() == "BFGS", (
            f"only BFGS is provided (got {self.method!r}) — the reference "
            "uses no other method"
        )

    def run(self, init_params: jax.Array, *args, **kwargs) -> OptStep:
        shape = jnp.shape(init_params)

        def value(flat):
            out = self.fun(flat.reshape(shape), *args, **kwargs)
            return out[0] if self.has_aux else out

        def value_and_grad(flat):
            return jax.value_and_grad(value)(flat)

        gtol = float(self.options.get("gtol", self.tol or 1e-5))
        record = self.callback is not None or self.options.get(
            "return_all", False
        )

        def solve(flat0):
            return minimize_bfgs(
                value_and_grad,
                flat0,
                maxiter=self.maxiter,
                gtol=gtol,
                record_history=record,
                fun=value,
            )

        solve_fn = jax.jit(solve) if self.jit else solve
        out = solve_fn(jnp.ravel(jnp.asarray(init_params)))
        if record:
            res, hist = out
        else:
            res, hist = out, None
        if self.callback is not None and hist is not None:
            n = int(hist.n)
            for k in range(n):
                self.callback(
                    _IntermediateResult(
                        x=hist.xs[k].reshape(shape), fun=hist.fs[k]
                    )
                )
        # scipy's options={'return_all': True} exposes allvecs on the result;
        # here the recorded trajectory lands on the solver object
        self.history = hist
        state = res._replace(x=res.x.reshape(shape))
        return OptStep(params=state.x, state=state)


@dataclass
class ScipyBoundedMinimize:
    """On-device stand-in for jaxopt.ScipyBoundedMinimize for the 1-D
    bounded solve the reference performs on the handover weight
    (src/eincm/solver.py:302-347). `run(init, bounds, *args)` follows the
    jaxopt calling convention; `init` is ignored (the bracketing method
    needs no start point)."""

    fun: Callable
    method: str = "L-BFGS-B"
    maxiter: int = 30
    jit: bool = True
    has_aux: bool = False
    options: dict = field(default_factory=dict)
    callback: Optional[Callable] = None

    def run(
        self,
        init_params,
        bounds: Tuple[float, float],
        *args,
        **kwargs,
    ) -> OptStep:
        lo, hi = bounds
        lo = float(jnp.asarray(lo).reshape(()))
        hi = float(jnp.asarray(hi).reshape(()))

        def value(w):
            out = self.fun(w, *args, **kwargs)
            return out[0] if self.has_aux else out

        record = self.callback is not None

        def solve():
            return minimize_bounded_scalar(
                value, (lo, hi), maxiter=self.maxiter, record_history=record
            )

        solve_fn = jax.jit(solve) if self.jit else solve
        out = solve_fn()
        if record:
            (w, f), hist = out
            for k in range(int(hist.n)):
                self.callback(_IntermediateResult(x=hist.xs[k], fun=hist.fs[k]))
        else:
            w, f = out

        class _State(NamedTuple):
            fun_val: jax.Array
            success: bool
            iter_num: int

        # Honest state instead of an unconditional success=True: the
        # golden-section solve always performs its full probe schedule
        # (iter_num = maxiter bracketing steps), and "success" means the
        # solve produced a finite optimum inside the bounds — the only
        # failure mode a derivative-free bracketing method has (a scipy
        # L-BFGS-B failure signal has no analogue here).
        w_f = float(jnp.asarray(w))
        f_ok = bool(jnp.isfinite(jnp.asarray(f)))
        success = f_ok and lo <= w_f <= hi
        return OptStep(
            params=w,
            state=_State(fun_val=f, success=success, iter_num=self.maxiter),
        )
