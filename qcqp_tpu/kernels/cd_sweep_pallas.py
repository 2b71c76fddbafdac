"""Whole-phase-1 coordinate-descent mega-kernel: all sweeps in one pallas_call.

The fused per-coordinate kernel (kernels/onevar_pallas.py) still pays, per
coordinate step, one kernel launch plus an XLA segment that slices/updates the
(R, m+1, n) gradient cache G in HBM — ~2x208 MB of HBM traffic per coordinate
at the bench shape, times n x sweeps segments.  This kernel instead runs the
*entire* two-phase-1 loop (sweep while-loop, Gauss-Seidel coordinate fori,
slack bisection) for a 128-restart lane tile inside a single pallas_call:

  * the problem tensors P (m+1, n, n), the k-sliced layout P1 (n, m+1, n)
    with P1[k] = P[:, :, k] (so a *dynamic ref slice* yields the coordinate's
    restriction rows), q^T and r live in VMEM for the whole solve
    (~4 MB at n=100, m=50 — comfortably under the ~16 MB/core budget);
  * there is no gradient cache at all: the per-coordinate restriction
    coefficients come from one small MXU matmul Gk = P1[k] @ x per coordinate
    (symmetry P[i,:,k] == P[i,k,:] makes the same slab serve both uses), and
    the per-constraint scalars t2, qk from one-hot matvecs — dynamic *lane*
    indexing, which Mosaic lacks, is never needed;
  * x (n, R) and F (m+1, R) are plain loop-carry values; F is refreshed from
    scratch once per sweep (drift control, 51 small matmuls) and updated in
    closed form per coordinate move;
  * the equality pattern is static (eq_idx), reusing the split candidate
    sweep of onevar_pallas.feasible_point_rows_split.

Semantics match solvers/coord_descent_fused.coord_descent_phase1_fused
(reference: qcqp/qcqp.py:101-148) with per-tile instead of per-batch sweep
termination — a tile whose 128 lanes all converge stops early.  float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .onevar_pallas import LANES, _bisect_accept, feasible_point_rows_split

_HP = jax.lax.Precision.HIGHEST


def _phase1_sweep_kernel(P_ref, P1_ref, qT_ref, r_ref, x_ref, out_ref, *,
                         n: int, m: int, eq_idx: tuple, num_iters: int,
                         tol: float, viol_tol: float, n_bisect: int):
    f32 = jnp.float32
    R = x_ref.shape[-1]
    qT = qT_ref[:]                                   # (m+1, n)
    r = r_ref[:]                                     # (m+1, 1)
    x0 = x_ref[:]                                    # (n, R)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    eq_idx = tuple(int(i) for i in eq_idx)
    e = len(eq_idx)

    def refresh_F(x):
        rows = []
        for i in range(m + 1):
            Yi = jnp.dot(P_ref[i], x, preferred_element_type=f32,
                         precision=_HP)              # (n, R)
            fi = jnp.sum(x * Yi, axis=0)[None, :]
            fi = fi + jnp.dot(qT[i:i + 1], x, preferred_element_type=f32,
                              precision=_HP) + r[i:i + 1, 0:1]
            rows.append(fi)
        return jnp.concatenate(rows, axis=0)         # (m+1, R)

    # static eq row mask built from iota (Pallas kernels cannot capture
    # array constants)
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    eqm = jnp.zeros((m, 1), f32)
    for j in eq_idx:
        eqm = jnp.maximum(eqm, (iota_m == j).astype(f32))

    def viols_from_F(F):
        vals = F[1:]                                 # (m, R)
        return jnp.where(eqm > 0.5, jnp.abs(vals), jnp.maximum(vals, 0.0))

    def coord_body(k, carry):
        x, F, alive, changed = carry
        onehot = (iota_n == k).astype(f32)           # (n, 1)
        xk = jnp.sum(jnp.where(onehot > 0.5, x, 0.0), axis=0)        # (R,)
        P1k = P1_ref[k]                              # (m+1, n) = P[:, :, k]
        Gk = jnp.dot(P1k, x, preferred_element_type=f32,
                     precision=_HP)                  # (m+1, R)
        t2 = jnp.dot(P1k, onehot, preferred_element_type=f32,
                     precision=_HP)                  # (m+1, 1) = P[:, k, k]
        qk = jnp.dot(qT, onehot, preferred_element_type=f32,
                     precision=_HP)                  # (m+1, 1)
        t1 = 2.0 * (Gk - t2 * xk[None, :]) + qk
        t0 = F - xk[None, :] * (2.0 * Gk + qk) + t2 * xk[None, :] ** 2

        t2c = jnp.broadcast_to(t2[1:], (m, R))
        t1c, t0c = t1[1:], t0[1:]
        act = ((t2c != 0.0) | (t1c != 0.0)).astype(f32)

        viol_rows = viols_from_F(F)
        viol = jnp.max(jnp.where(act > 0.5, viol_rows, 0.0), axis=0)  # (R,)

        if e:
            def _take(arr):
                return jnp.concatenate([arr[j:j + 1] for j in eq_idx], axis=0)
            p2, q2, r2, act2 = _take(t2c), _take(t1c), _take(t0c), _take(act)
        else:
            p2 = q2 = r2 = act2 = None

        def feasible_point(s):
            return feasible_point_rows_split(t2c, t1c, t0c, act, p2, q2, r2,
                                             act2, xk, s, tol)

        v = _bisect_accept(feasible_point, xk, viol, tol, viol_tol, n_bisect)
        v = jnp.where(alive > 0.5, v, xk)
        accept = (v != xk).astype(f32)
        F = t2 * v[None, :] ** 2 + t1 * v[None, :] + t0
        x = jnp.where(onehot > 0.5, v[None, :], x)
        return x, F, alive, jnp.maximum(changed, accept)

    def sweep_cond(c):
        x, F, t, viol_last, changed = c
        alive = ((viol_last >= viol_tol).astype(f32)
                 * changed)
        return (t < num_iters) & (jnp.max(alive) > 0.5)

    def sweep_body(c):
        x, F, t, viol_last, changed = c
        F = refresh_F(x)                             # drift control
        alive = (viol_last >= viol_tol).astype(f32) * changed
        x, F, _, changed_new = jax.lax.fori_loop(
            0, n, coord_body, (x, F, alive, jnp.zeros((R,), f32)))
        viol = jnp.max(viols_from_F(F), axis=0, initial=0.0)
        changed = jnp.where(alive > 0.5, changed_new, changed)
        return x, F, t + 1, viol, changed

    init = (x0, jnp.zeros((m + 1, R), f32), jnp.int32(0),
            jnp.full((R,), jnp.inf, f32), jnp.ones((R,), f32))
    x, _, _, _, _ = jax.lax.while_loop(sweep_cond, sweep_body, init)
    out_ref[:] = x


def phase1_sweeps(P, q, r, eq_idx, xs, num_iters=1000, viol_tol=1e-2,
                  tol=1e-4, n_bisect=40, interpret=False):
    """Run full phase-1 CD for a restart batch in one pallas_call.

    P (m+1, n, n) symmetric, q (m+1, n), r (m+1,); eq_idx static tuple of
    equality rows; xs (R, n) with R a multiple of 128.  Returns xs' (R, n).
    """
    k1, n = P.shape[0], P.shape[-1]
    m = k1 - 1
    R, n_x = xs.shape
    assert n_x == n and R % LANES == 0
    f32 = jnp.float32
    P = P.astype(f32)
    P1 = jnp.moveaxis(P, 2, 0)                       # P1[k] = P[:, :, k]
    qT = q.astype(f32)
    rr = r.astype(f32)[:, None]
    xsT = xs.astype(f32).T                           # (n, R)

    kernel = functools.partial(
        _phase1_sweep_kernel, n=n, m=m,
        eq_idx=tuple(int(i) for i in eq_idx), num_iters=int(num_iters),
        tol=float(tol), viol_tol=float(viol_tol), n_bisect=int(n_bisect))
    grid = R // LANES
    bc3 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0, 0))
    bc2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))
    tile = pl.BlockSpec((n, LANES), lambda i: (0, i))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[bc3((k1, n, n)), bc3((n, k1, n)), bc2((k1, n)),
                      bc2((k1, 1)), tile],
            out_specs=tile,
            out_shape=jax.ShapeDtypeStruct((n, R), f32),
            interpret=interpret,
        )(P, P1, qT, rr, xsT)
    return out.T
