"""Two-phase greedy coordinate descent, as one jitted fixed-point loop.

Re-architecture of the reference driver (reference: qcqp/qcqp.py:101-192):
phase 1 reduces the maximum constraint violation coordinate-by-coordinate via
bisection on the allowed slack; phase 2 descends the objective over the
near-feasible set.  The per-coordinate restriction the reference recomputes
from sparse rows (utilities.py:99-105, author-marked `TODO: speedup`) is done
incrementally here: the state carries G = P x (all m+1 functions) and the
function values F, so a coordinate step is O((m+1) n) updates plus the O(m^2)
fixed-shape onevar kernel — no per-step (m n^2) re-evaluation.  State is
refreshed from scratch once per sweep to kill float drift.

The Gauss-Seidel coordinate sweep is inherently sequential per restart
(`lax.fori_loop`), and thousands of independent restarts vmap/shard on top
(realizing the restart parallelism the reference runs one chain at a time).

Deviations (see kernels/onevar.py for tie-break policy):
  * the slack bisection is a while-loop capped at 40 halvings, equivalent to
    the reference's while-loop (qcqp.py:122-131) for any initial violation
    below ~1e8;
  * a sweep that changes nothing terminates phase 1 early (the continuation
    is a deterministic no-op; the reference idles until num_iters);
  * non-finite coordinate updates are rejected (the reference would poison
    x with +-inf in pathological unbounded cases).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import QCQPForm
from ..kernels.onevar import (OneVarConstraints, onevar_qcqp_impl,
                              phase1_feasible_point)

N_BISECT = 40


class CDState(NamedTuple):
    x: jax.Array  # (n,)
    G: jax.Array  # (m+1, n) = P_k x
    F: jax.Array  # (m+1,)  = f_k(x)


def _refresh(form: QCQPForm, x) -> CDState:
    k, n = form.P.shape[0], form.P.shape[-1]
    # Flat matmul, not einsum("kij,j->ki"): under vmap over restarts XLA can
    # lower the einsum via a materialized (R, m+1, n, n) broadcast (23 GB at
    # the bench shape) instead of one dot_general.
    G = (form.P.reshape(k * n, n) @ x).reshape(k, n)
    F = G @ x + form.q @ x + form.r
    return CDState(x, G, F)


def _restriction(form: QCQPForm, Pdiag, state: CDState, k):
    """Coefficients (t2, t1, t0) of every f_i restricted to coordinate k.

    t2 = P[k,k]; t1 = (2 P z + q)_k; t0 = f(z) with z = x, z[k] = 0
    (reference: qcqp/utilities.py:99-105), derived from the carried G, F.
    """
    x, G, F = state
    xk = x[k]
    t2 = Pdiag[:, k]
    Gk = G[:, k]
    qk = form.q[:, k]
    t1 = 2.0 * (Gk - t2 * xk) + qk
    t0 = F - xk * (2.0 * Gk + qk) + t2 * xk * xk
    return t2, t1, t0, xk


def _apply_update(form: QCQPForm, state: CDState, k, v, t2, t1, t0):
    x, G, F = state
    delta = v - x[k]
    Pk = jnp.take(form.P, k, axis=2)  # (m+1, n) column k of each P (symmetric)
    G = G + delta * Pk
    F = t2 * v * v + t1 * v + t0
    x = x.at[k].set(v)
    return CDState(x, G, F)


def _viol_from_F(form: QCQPForm, F):
    vals = F[1:]
    v = jnp.where(form.is_eq, jnp.abs(vals), jnp.maximum(vals, 0.0))
    return jnp.max(v, initial=jnp.zeros((), v.dtype))


def coord_descent_phase1(form: QCQPForm, x0, num_iters=1000, viol_tol=1e-2, tol=1e-4):
    """Minimize infeasibility (reference: qcqp/qcqp.py:101-148)."""
    n = form.n
    Pdiag = jnp.diagonal(form.P, axis1=1, axis2=2)
    zero = jnp.zeros((), x0.dtype)

    def coord_body(k, carry):
        state, changed = carry
        t2, t1, t0, xk = _restriction(form, Pdiag, state, k)
        active = (t2[1:] != 0) | (t1[1:] != 0)
        con = OneVarConstraints(t2[1:], t1[1:], t0[1:], form.is_eq, active)
        # Current violation of the active restrictions at x[k] — the
        # restriction evaluated at x[k] is exactly F (carried).
        vals = state.F[1:]
        viol_i = jnp.where(form.is_eq, jnp.abs(vals), jnp.maximum(vals, zero))
        viol = jnp.max(jnp.where(active, viol_i, zero), initial=zero)

        def bis_cond(c):
            ss, es, bx, bs, found, it = c
            return ((es - ss) > tol) & (it < N_BISECT)

        def bis_body(c):
            ss, es, bx, bs, found, it = c
            sm = 0.5 * (ss + es)
            xi, feas = phase1_feasible_point(con, sm, xk, tol)
            ss = jnp.where(~feas, sm, ss)
            es = jnp.where(feas, sm, es)
            bx = jnp.where(feas, xi, bx)
            bs = jnp.where(feas, sm, bs)
            found = found | feas
            return ss, es, bx, bs, found, it + 1

        init = (jnp.asarray(-tol, x0.dtype), viol - viol_tol, xk, viol, False,
                jnp.asarray(0))
        # while-loop: trip count adapts to log2(viol/tol) (~17 for O(10)
        # violations) instead of always paying the N_BISECT worst case
        _, _, new_xi, new_viol, found, _ = jax.lax.while_loop(
            bis_cond, bis_body, init)
        accept = found & (new_viol < viol) & jnp.isfinite(new_xi)
        v = jnp.where(accept, new_xi, xk)
        return _apply_update(form, state, k, v, t2, t1, t0), changed | accept

    def cond(carry):
        state, t, viol_last, changed = carry
        return (t < num_iters) & (viol_last >= viol_tol) & changed

    def body(carry):
        state, t, viol_last, _ = carry
        state = _refresh(form, state.x)  # drift control, once per sweep
        state, changed = jax.lax.fori_loop(0, n, coord_body, (state, False))
        viol = _viol_from_F(form, state.F)
        return state, t + 1, viol, changed

    state0 = _refresh(form, x0)
    init = (state0, jnp.asarray(0), jnp.asarray(jnp.inf, x0.dtype), jnp.asarray(True))
    state, _, _, _ = jax.lax.while_loop(cond, body, init)
    return state.x


def coord_descent_phase2(form: QCQPForm, x0, num_iters=1000, viol_tol=1e-2, tol=1e-4):
    """Minimize objective over the ~feasible set (reference: qcqp/qcqp.py:152-178)."""
    n = form.n
    Pdiag = jnp.diagonal(form.P, axis1=1, axis2=2)
    state0 = _refresh(form, x0)
    # Slack fixed at the entry violation for the whole phase (qcqp.py:157,167).
    viol_slack = _viol_from_F(form, state0.F)

    def coord_body(k, carry):
        state, counter = carry
        t2, t1, t0, xk = _restriction(form, Pdiag, state, k)
        active = (t2[1:] != 0) | (t1[1:] != 0)
        con = OneVarConstraints(t2[1:], t1[1:], t0[1:], form.is_eq, active)
        new_xi, feas = onevar_qcqp_impl(t2[0], t1[0], t0[0], con, viol_slack,
                                       tol, x_cur=xk)
        accept = (
            feas
            & (jnp.abs(new_xi - xk) > tol)
            & jnp.isfinite(new_xi)
            & (counter < n)
        )
        counter = jnp.where(accept, 0, counter + 1)
        v = jnp.where(accept, new_xi, xk)
        return _apply_update(form, state, k, v, t2, t1, t0), counter

    def cond(carry):
        _, t, counter = carry
        return (t < num_iters) & (counter < n)

    def body(carry):
        state, t, counter = carry
        state = _refresh(form, state.x)
        state, counter = jax.lax.fori_loop(0, n, coord_body, (state, counter))
        return state, t + 1, counter

    state, _, _ = jax.lax.while_loop(cond, body, (state0, jnp.asarray(0), jnp.asarray(0)))
    return state.x


@partial(jax.jit, static_argnames=("num_iters", "viol_tol", "tol", "phase1"))
def improve_coord_descent(form: QCQPForm, x, num_iters=1000, viol_tol=1e-2,
                          tol=1e-4, phase1=True):
    """Full two-phase CD (reference: qcqp/qcqp.py:181-192).

    Phase 2 runs only if the point is viol_tol-feasible after phase 1.
    """
    if phase1:
        x = coord_descent_phase1(form, x, num_iters, viol_tol, tol)
    from ..core import max_violation
    x = jax.lax.cond(
        max_violation(form, x) < viol_tol,
        lambda x_: coord_descent_phase2(form, x_, num_iters, viol_tol, tol),
        lambda x_: x_,
        x,
    )
    return x


@partial(jax.jit, static_argnames=("num_iters", "viol_tol", "tol", "phase1"))
def improve_coord_descent_batch(form: QCQPForm, xs, num_iters=1000, viol_tol=1e-2,
                                tol=1e-4, phase1=True):
    """Batched two-phase CD over a leading restart axis of xs.

    Not a plain vmap of improve_coord_descent: vmapping its phase-2
    lax.cond broadcasts the branch-closure form.P to a per-restart
    (R, m+1, n, n) while-loop carry (23 GB at the headline-bench shape).
    Both branches of a batched cond run anyway, so phase 2 runs for every
    lane here and the feasibility gate (reference: qcqp/qcqp.py:189-190)
    becomes an output select.
    """
    from ..core import max_violation
    if phase1:
        xs = jax.vmap(
            lambda x: coord_descent_phase1(form, x, num_iters, viol_tol, tol)
        )(xs)
    feas = jax.vmap(lambda x: max_violation(form, x))(xs) < viol_tol
    x2 = jax.vmap(
        lambda x: coord_descent_phase2(form, x, num_iters, viol_tol, tol)
    )(xs)
    return jnp.where(feas[:, None], x2, xs)
