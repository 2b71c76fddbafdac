"""Whole-solve coordinate-descent mega-kernels: all sweeps in one pallas_call.

The fused per-coordinate kernel (kernels/onevar_pallas.py) still pays, per
coordinate step, one kernel launch plus an XLA segment that slices/updates the
(R, m+1, n) gradient cache G in HBM — ~2x208 MB of HBM traffic per coordinate
at the bench shape, times n x sweeps segments.  These kernels instead run the
*entire* CD loop (sweep while-loop, Gauss-Seidel coordinate fori, slack
bisection / candidate argmin) for a 128-restart lane tile inside a single
pallas_call:

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

`phase1_sweeps` runs phase 1 (feasibility, slack bisection per coordinate;
reference: qcqp/qcqp.py:101-148).  `two_phase_sweeps` additionally runs
phase 2 (objective descent over the ~feasible set at the entry-violation
slack; reference: qcqp/qcqp.py:152-178 with the feasibility gate of
qcqp.py:189-190 applied per lane) in the same pallas_call, so the whole
two-phase improve never leaves VMEM.  Sweep termination is per 128-lane tile
instead of per batch — a tile whose lanes all converge stops early.  float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .onevar_pallas import (LANES, _bisect_accept, _canon_leq,
                            feas_matrix_from_canon,
                            feasible_point_rows_split)

_HP = jax.lax.Precision.HIGHEST


def _make_ctx(P_ref, P1_ref, qT_ref, r_ref, *, n: int, m: int,
              eq_idx: tuple):
    """Shared per-kernel helpers: F refresh, violations, and the coordinate
    restriction (t2, t1, t0) of every f_i (reference: qcqp/utilities.py:99-105,
    derived in closed form from the carried F)."""
    f32 = jnp.float32
    qT = qT_ref[:]                                   # (m+1, n)
    r = r_ref[:]                                     # (m+1, 1)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

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

    def restriction(k, x, F):
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
        return onehot, xk, t2, t1, t0

    return refresh_F, viols_from_F, restriction


def _take_rows(arr, idx):
    """Static-index row gather (Mosaic has no dynamic sublane gather)."""
    return jnp.concatenate([arr[j:j + 1] for j in idx], axis=0)


def _phase1_loop(x0, ctx, *, n: int, m: int, eq_idx: tuple, num_iters: int,
                 tol: float, viol_tol: float, n_bisect: int, wbs_ref=None):
    """Full phase-1 CD (reference: qcqp/qcqp.py:101-148) on an (n, R) tile.

    wbs_ref: optional (n, 2, R) VMEM scratch carrying each coordinate's
    resolved slack bracket (certified-infeasible floor, accepted slack)
    across sweeps (round 5 / VERDICT r4 #2): sweep t+1's bisection starts
    from a narrow window around sweep t's bracket instead of the full
    [-tol, viol) range — the trip count, not the per-trip ops, is the
    mega-kernel's remaining cost (BASELINE.md r4 frontier).  The
    escalation path inside _bisect_accept keeps the acceptance semantics
    identical; only trip counts change."""
    f32 = jnp.float32
    refresh_F, viols_from_F, restriction = ctx
    R = x0.shape[-1]
    e = len(eq_idx)
    if wbs_ref is not None:
        wbs_ref[:] = jnp.full((n, 2, R), jnp.inf, f32)

    def coord_body(k, carry):
        x, F, alive, changed = carry
        onehot, xk, t2, t1, t0 = restriction(k, x, F)

        t2c = jnp.broadcast_to(t2[1:], (m, R))
        t1c, t0c = t1[1:], t0[1:]
        act = ((t2c != 0.0) | (t1c != 0.0)).astype(f32)

        viol_rows = viols_from_F(F)
        viol = jnp.max(jnp.where(act > 0.5, viol_rows, 0.0), axis=0)  # (R,)

        if e:
            p2, q2, r2, act2 = (_take_rows(t2c, eq_idx),
                                _take_rows(t1c, eq_idx),
                                _take_rows(t0c, eq_idx),
                                _take_rows(act, eq_idx))
        else:
            p2 = q2 = r2 = act2 = None

        def feasible_point(s):
            return feasible_point_rows_split(t2c, t1c, t0c, act, p2, q2, r2,
                                             act2, xk, s, tol)

        def viol_of(v):
            vb = v[None, :]
            val = (t2c * vb + t1c) * vb + t0c
            w = jnp.max(jnp.where(act > 0.5, jnp.maximum(val, 0.0), 0.0),
                        axis=0)
            if e:
                val2 = (p2 * vb + q2) * vb + r2
                w2 = jnp.max(
                    jnp.where(act2 > 0.5, jnp.maximum(-val2, 0.0), 0.0),
                    axis=0)
                w = jnp.maximum(w, w2)
            return w

        if wbs_ref is not None:
            wk = wbs_ref[k]                          # (2, R)
            warm = (wk[0], wk[1])
        else:
            warm = None
        v, (wlo, whi) = _bisect_accept(feasible_point, xk, viol, tol,
                                       viol_tol, n_bisect, viol_of=viol_of,
                                       warm=warm)
        if wbs_ref is not None:
            wbs_ref[k] = jnp.where(alive[None, :] > 0.5,
                                   jnp.stack([wlo, whi]), wk)
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
        # (A freeze-retry guard — one cold sweep with cleared warm state
        # before a lane's no-change freeze — was measured and REJECTED:
        # a single retrying lane keeps its whole 128-lane tile sweeping,
        # costing 40% throughput (37301 -> 21951 r/s) while the
        # feasibility differences it targeted proved to be trajectory-
        # reshuffle noise, see tests/test_cd_sweep_pallas.py margins.)
        changed = jnp.where(alive > 0.5, changed_new, changed)
        return x, F, t + 1, viol, changed

    init = (x0, jnp.zeros((m + 1, R), f32), jnp.int32(0),
            jnp.full((R,), jnp.inf, f32), jnp.ones((R,), f32))
    x, _, _, _, _ = jax.lax.while_loop(sweep_cond, sweep_body, init)
    return x


def _phase2_select(blocks, xk, p0, q0r, r0r):
    """Argmin of the restricted objective p0 x^2 + q0 x + r0 over the
    candidate boundary points of the canonical blocks, the unconstrained
    vertex, and +-inf (reference: qcqp/utilities.py:241-288, candidate-point
    formulation of kernels/onevar.onevar_qcqp_impl with proximal tie-break).

    blocks: canonical rows at the fixed phase-2 slack; p0/q0r/r0r (1, R) —
    p0 must be a materialized (1, R) vector, not a (1, 1) slice (Mosaic
    cannot broadcast both sublanes and lanes in one op when it meets the
    (C, R) candidate matrix).  Returns (v (R,), any_feas (R,))."""
    f32 = jnp.float32
    R = xk.shape[0]
    nanv = jnp.nan

    safe_p0 = jnp.where(p0 > 0.0, p0, 1.0)
    vertex = jnp.where(p0 > 0.0, -q0r / (2.0 * safe_p0), nanv)    # (1, R)
    cand_rows = [vertex]
    for (base, sgn, a, b, es, _) in blocks:
        # _canon_leq pre-folds the tangency slop into a/b for the membership
        # sweep; candidate POSITIONS must sit on the true boundary (an
        # eps-shifted candidate is genuinely outside the set and its
        # violation compounds over sweeps) — un-shift to O(eps^2).
        a_t = a + es * 5e-7 * (1.0 + jnp.abs(a))
        b_t = b - es * 5e-7 * (1.0 + jnp.abs(b))
        cand_rows.append(jnp.where(jnp.abs(a) < jnp.inf, a_t, nanv))
        cand_rows.append(jnp.where(jnp.abs(b) < jnp.inf, b_t, nanv))
    cand_rows.append(jnp.full((1, R), -jnp.inf, f32))
    cand_rows.append(jnp.full((1, R), jnp.inf, f32))
    cands = jnp.concatenate(cand_rows, axis=0)                    # (C, R)

    feas = feas_matrix_from_canon(blocks, cands)                  # (C, R)

    finite_vals = (p0 * cands + q0r) * cands + r0r
    sgn_c = jnp.where(cands > 0.0, 1.0, -1.0)
    infv = jnp.where(p0 != 0.0,
                     jnp.where(p0 > 0.0, jnp.inf, -jnp.inf),
                     jnp.where(q0r != 0.0,
                               jnp.where(q0r > 0.0, sgn_c, -sgn_c) * jnp.inf,
                               r0r))
    vals = jnp.where(jnp.abs(cands) == jnp.inf, infv, finite_vals)
    vals = jnp.where((feas > 0.5) & ~jnp.isnan(vals), vals, jnp.inf)

    any_feas = jnp.max(feas, axis=0) > 0.5
    vmin = jnp.min(vals, axis=0)
    tied = (vals == vmin[None, :]).astype(f32)
    dist = jnp.where(tied > 0.5, jnp.abs(cands - xk[None, :]), jnp.inf)
    dist = jnp.where(jnp.isnan(dist), jnp.inf, dist)
    any_fin = jnp.min(dist, axis=0) < jnp.inf
    idx = jnp.where(any_fin, jnp.argmin(dist, axis=0),
                    jnp.argmin(vals, axis=0))
    row_ids = jax.lax.broadcasted_iota(jnp.int32, cands.shape, 0)
    onehot = (row_ids == idx[None, :].astype(jnp.int32)).astype(f32)
    v = jnp.sum(jnp.where(onehot > 0.5, cands, 0.0), axis=0)
    return v, any_feas


def _phase2_loop(x0, ctx, *, n: int, m: int, eq_idx: tuple, num_iters: int,
                 tol: float, viol_tol: float):
    """Full phase-2 CD (reference: qcqp/qcqp.py:152-178) on an (n, R) tile.

    The feasibility gate (qcqp.py:189-190) is per lane: lanes entering above
    viol_tol start with a saturated no-move counter and never move.  The
    slack is fixed at each lane's entry violation (qcqp.py:157,167); a lane
    stops after n consecutive non-moves."""
    f32 = jnp.float32
    refresh_F, viols_from_F, restriction = ctx
    R = x0.shape[-1]
    e = len(eq_idx)
    n_f = jnp.float32(n)

    F0 = refresh_F(x0)
    viol0 = jnp.max(viols_from_F(F0), axis=0, initial=0.0)        # (R,)
    gate = viol0 < viol_tol
    slack = viol0
    counter0 = jnp.where(gate, 0.0, n_f)

    def coord_body(k, carry):
        x, F, counter = carry
        onehot, xk, t2, t1, t0 = restriction(k, x, F)

        t2c = jnp.broadcast_to(t2[1:], (m, R))
        t1c, t0c = t1[1:], t0[1:]
        act = ((t2c != 0.0) | (t1c != 0.0)).astype(f32)
        sb = slack[None, :]

        one = jnp.ones_like(t2c)
        base1, sgn1, a1, b1, es1, c1 = _canon_leq(t2c, t1c, t0c - sb, tol)
        base1 = jnp.where(act > 0, base1, one)
        sgn1 = jnp.where(act > 0, sgn1, 0.0 * one)
        blocks = [(base1, sgn1, a1, b1, es1, c1)]
        if e:
            p2, q2, r2, act2 = (_take_rows(t2c, eq_idx),
                                _take_rows(t1c, eq_idx),
                                _take_rows(t0c, eq_idx),
                                _take_rows(act, eq_idx))
            one2 = jnp.ones_like(p2)
            base2, sgn2, a2, b2, es2, c2 = _canon_leq(-p2, -q2, -r2 - sb,
                                                      tol)
            base2 = jnp.where(act2 > 0, base2, one2)
            sgn2 = jnp.where(act2 > 0, sgn2, 0.0 * one2)
            blocks.append((base2, sgn2, a2, b2, es2, c2))

        # Materialize row 0 of t2 as a genuine (1, R) vector: slicing to
        # (1, 1) and broadcasting against the (C, R) candidate matrix needs a
        # both-dims vector.broadcast, which Mosaic lacks; the (m+1, 1) x
        # (1, R) lanes-only mul is the same pattern phase 1 already uses.
        t2R = t2 * jnp.ones((1, R), f32)
        v, any_feas = _phase2_select(blocks, xk, t2R[0:1], t1[0:1], t0[0:1])
        accept = (any_feas & (jnp.abs(v - xk) > tol)
                  & (jnp.abs(v) < jnp.inf) & ~jnp.isnan(v)
                  & (counter < n_f))
        counter = jnp.where(accept, 0.0, counter + 1.0)
        v = jnp.where(accept, v, xk)
        F = t2 * v[None, :] ** 2 + t1 * v[None, :] + t0
        x = jnp.where(onehot > 0.5, v[None, :], x)
        return x, F, counter

    def sweep_cond(c):
        x, F, t, counter = c
        return (t < num_iters) & (jnp.min(counter) < n_f)

    def sweep_body(c):
        x, F, t, counter = c
        F = refresh_F(x)                             # drift control
        x, F, counter = jax.lax.fori_loop(0, n, coord_body, (x, F, counter))
        return x, F, t + 1, counter

    init = (x0, F0, jnp.int32(0), counter0)
    x, _, _, _ = jax.lax.while_loop(sweep_cond, sweep_body, init)
    return x


def _phase1_sweep_kernel(P_ref, P1_ref, qT_ref, r_ref, x_ref, out_ref,
                         wbs_ref, *,
                         n: int, m: int, eq_idx: tuple, num_iters: int,
                         tol: float, viol_tol: float, n_bisect: int):
    eq_idx = tuple(int(i) for i in eq_idx)
    ctx = _make_ctx(P_ref, P1_ref, qT_ref, r_ref, n=n, m=m, eq_idx=eq_idx)
    out_ref[:] = _phase1_loop(x_ref[:], ctx, n=n, m=m, eq_idx=eq_idx,
                              num_iters=num_iters, tol=tol,
                              viol_tol=viol_tol, n_bisect=n_bisect,
                              wbs_ref=wbs_ref)


def _two_phase_kernel(P_ref, P1_ref, qT_ref, r_ref, x_ref, out_ref,
                      wbs_ref, *,
                      n: int, m: int, eq_idx: tuple, num_iters: int,
                      tol: float, viol_tol: float, n_bisect: int,
                      phase1: bool):
    eq_idx = tuple(int(i) for i in eq_idx)
    ctx = _make_ctx(P_ref, P1_ref, qT_ref, r_ref, n=n, m=m, eq_idx=eq_idx)
    x = x_ref[:]
    if phase1:
        x = _phase1_loop(x, ctx, n=n, m=m, eq_idx=eq_idx,
                         num_iters=num_iters, tol=tol, viol_tol=viol_tol,
                         n_bisect=n_bisect, wbs_ref=wbs_ref)
    out_ref[:] = _phase2_loop(x, ctx, n=n, m=m, eq_idx=eq_idx,
                              num_iters=num_iters, tol=tol,
                              viol_tol=viol_tol)


def _call_sweep_kernel(kernel_fn, P, q, r, xs, interpret):
    k1, n = P.shape[0], P.shape[-1]
    R = xs.shape[0]
    assert xs.shape[1] == n and R % LANES == 0
    f32 = jnp.float32
    P = P.astype(f32)
    P1 = jnp.moveaxis(P, 2, 0)                       # P1[k] = P[:, :, k]
    qT = q.astype(f32)
    rr = r.astype(f32)[:, None]
    xsT = xs.astype(f32).T                           # (n, R)

    grid = R // LANES
    bc3 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0, 0))
    bc2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))
    tile = pl.BlockSpec((n, LANES), lambda i: (0, i))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel_fn,
            grid=(grid,),
            in_specs=[bc3((k1, n, n)), bc3((n, k1, n)), bc2((k1, n)),
                      bc2((k1, 1)), tile],
            out_specs=tile,
            out_shape=jax.ShapeDtypeStruct((n, R), f32),
            scratch_shapes=[pltpu.VMEM((n, 2, LANES), f32)],
            interpret=interpret,
        )(P, P1, qT, rr, xsT)
    return out.T


def phase1_sweeps(P, q, r, eq_idx, xs, num_iters=1000, viol_tol=1e-2,
                  tol=1e-4, n_bisect=40, interpret=False):
    """Run full phase-1 CD for a restart batch in one pallas_call.

    P (m+1, n, n) symmetric, q (m+1, n), r (m+1,); eq_idx static tuple of
    equality rows; xs (R, n) with R a multiple of 128.  Returns xs' (R, n).
    """
    k1, n = P.shape[0], P.shape[-1]
    kernel = functools.partial(
        _phase1_sweep_kernel, n=n, m=k1 - 1,
        eq_idx=tuple(int(i) for i in eq_idx), num_iters=int(num_iters),
        tol=float(tol), viol_tol=float(viol_tol), n_bisect=int(n_bisect))
    return _call_sweep_kernel(kernel, P, q, r, xs, interpret)


def two_phase_sweeps(P, q, r, eq_idx, xs, num_iters=1000, viol_tol=1e-2,
                     tol=1e-4, n_bisect=40, phase1=True, interpret=False):
    """Run the full two-phase CD improve for a restart batch in one
    pallas_call (reference: qcqp/qcqp.py:181-192; phase-2 gate of
    qcqp.py:189-190 applied per lane inside the kernel).

    Same tensor contract as phase1_sweeps; phase1=False skips straight to
    the objective-descent phase (the reference improve's phase1 kwarg).
    """
    k1, n = P.shape[0], P.shape[-1]
    kernel = functools.partial(
        _two_phase_kernel, n=n, m=k1 - 1,
        eq_idx=tuple(int(i) for i in eq_idx), num_iters=int(num_iters),
        tol=float(tol), viol_tol=float(viol_tol), n_bisect=int(n_bisect),
        phase1=bool(phase1))
    return _call_sweep_kernel(kernel, P, q, r, xs, interpret)
