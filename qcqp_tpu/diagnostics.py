"""Iteration-level tracing and profiling helpers.

The reference's only observability is INFO-level violation lines appended to
`qcqp.log` (reference: qcqp/qcqp.py:39,143,246).  Device-side loops can't log
per-iteration, so tracing here is a separate scan-based replay that returns
whole history arrays in one transfer — convergence curves for dashboards,
regression tests, and rho/tau tuning — plus a thin wrapper over
jax.profiler for XLA-level traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import jax.numpy as jnp

from .core import QCQPForm, eval_objective, max_violation
from .kernels.projection import precompute_eigh
from .solvers.admm import _project_batch, auto_rho


def cd_trace(form: QCQPForm, x0, sweeps: int = 50, viol_tol: float = 1e-2,
             tol: float = 1e-4) -> Dict[str, jax.Array]:
    """Per-sweep (objective, max violation) history of CD phase 1 + phase 2."""
    from .solvers.coord_descent import (
        coord_descent_phase1, coord_descent_phase2)

    def step(x, _):
        x1 = coord_descent_phase1(form, x, 1, viol_tol, tol)
        x2 = jax.lax.cond(
            max_violation(form, x1) < viol_tol,
            lambda xx: coord_descent_phase2(form, xx, 1, viol_tol, tol),
            lambda xx: xx, x1)
        return x2, (eval_objective(form, x2), max_violation(form, x2))

    x_fin, (objs, viols) = jax.lax.scan(step, x0, None, length=sweeps)
    return {"x": x_fin, "objective": objs, "violation": viols}


def admm_trace(form: QCQPForm, x0, iters: int = 200, rho=None,
               proj_tol: float = 1e-6) -> Dict[str, jax.Array]:
    """Per-iteration history of ADMM phase 2 (z-residual, violation, obj)."""
    eigh = precompute_eigh(form)
    if rho is None:
        rho = auto_rho(form)
    m, n = form.m, form.n
    lhs = 2.0 * (form.P[0] + rho * m * jnp.eye(n, dtype=x0.dtype))
    chol = jax.scipy.linalg.cho_factor(lhs)
    rcon, eqcon = form.r[1:], form.is_eq

    def step(carry, _):
        z, xs, us = carry
        rhs = 2.0 * rho * (jnp.sum(xs, 0) - jnp.sum(us, 0)) - form.q[0]
        z_new = jax.scipy.linalg.cho_solve(chol, rhs)
        xs = _project_batch(z_new + us, eigh, rcon, eqcon, proj_tol)
        us = us + z_new - xs
        out = (jnp.linalg.norm(z_new - z),
               max_violation(form, z_new),
               eval_objective(form, z_new))
        return (z_new, xs, us), out

    xs0 = jnp.broadcast_to(x0, (m, n))
    us0 = jnp.zeros((m, n), x0.dtype)
    (z, _, _), (dz, viols, objs) = jax.lax.scan(
        step, (x0, xs0, us0), None, length=iters)
    return {"z": z, "z_residual": dz, "violation": viols, "objective": objs}


def ccp_trace(form: QCQPForm, x0, outers: int = 40, tau: float = 0.005,
              mu: float = 1.4, tau_max: float = 1e8,
              inner_iters: int = 40) -> Dict[str, jax.Array]:
    """Per-outer-iteration history of the penalty CCP improve
    (tau, objective, max violation) — the replay view of
    solvers/ccp.improve_ccp (reference behavior: qcqp/qcqp.py:288-322)."""
    from .solvers.ccp import improve_ccp, precompute_ccp

    data = precompute_ccp(form)

    def step(carry, _):
        x, tau_k = carry
        # one outer CCP step at the carried tau (mu=1 freezes the inner
        # schedule; tau is advanced here so the carry holds what ran)
        x1 = improve_ccp(form, x, tau=tau_k, mu=1.0, tau_max=tau_max,
                         max_iter=1, inner_iters=inner_iters, data=data)
        tau_next = jnp.minimum(tau_k * mu, tau_max)
        return (x1, tau_next), (tau_k, eval_objective(form, x1),
                                max_violation(form, x1))

    (x_fin, _), (taus, objs, viols) = jax.lax.scan(
        step, (x0, jnp.asarray(tau, x0.dtype)), None, length=outers)
    return {"x": x_fin, "tau": taus, "objective": objs, "violation": viols}


def sdp_trace(form: QCQPForm, iters: int = 2000, rho0: float = 1.0,
              alpha: float = 1.6) -> Dict[str, jax.Array]:
    """Residual curves of the SDR splitting solver (fixed-iteration replay)."""
    from .solvers.sdp import _sdr_data, _affine_prox, _cone_proj
    data = _sdr_data(form)
    N = data.W0.shape[0]
    k = data.b.shape[0]
    dt = data.W0.dtype

    def step(carry, _):
        Y, t, U, v = carry
        X1, s1, _ = _affine_prox(data, Y - U, t - v, rho0)
        Xr = alpha * X1 + (1 - alpha) * Y
        sr = alpha * s1 + (1 - alpha) * t
        Yn, tn = _cone_proj(Xr + U, sr + v)
        U = U + Xr - Yn
        v = v + sr - tn
        rp = jnp.sqrt(jnp.sum((X1 - Yn) ** 2) + jnp.sum((s1 - tn) ** 2))
        obj = jnp.sum(data.W0 * Yn) * data.obj_scale
        return (Yn, tn, U, v), (rp, obj)

    init = (jnp.eye(N, dtype=dt), jnp.zeros(k, dt),
            jnp.zeros((N, N), dt), jnp.zeros(k, dt))
    (Y, _, _, _), (rps, objs) = jax.lax.scan(step, init, None, length=iters)
    return {"X": Y, "primal_residual": rps, "objective": objs}


@contextlib.contextmanager
def xla_profile(logdir: str):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, results: dict = None):
    """Wall-clock timer that blocks on device completion."""
    t0 = time.time()
    yield
    dt = time.time() - t0
    if results is not None:
        results[label] = dt
    else:
        print(f"[qcqp_tpu] {label}: {dt:.3f}s")
