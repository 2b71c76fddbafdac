"""Pallas fused phase-1 coordinate kernel: the slack bisection in VMEM.

The coordinate-descent phase-1 hot path solves, per coordinate and restart,

    min s  s.t.  exists x: viol_i(x) <= s  for all i     (slack bisection)

by ~17 halvings, each evaluating (2m+1) candidate left-endpoints against m
constraints.  Under plain XLA each halving is a separate fusion with its
(R, 2m+1)-shaped intermediates round-tripping through HBM; this kernel runs
the *entire* bisection for a 128-restart lane tile inside one pallas_call,
with the restriction coefficients (m, 128) resident in VMEM and the
candidate/feasibility algebra batched over lanes.

Layout: restarts on the 128-lane axis, constraints on the sublane axis.
Inputs per coordinate step (transposed from the solver's (R, m) layout):
    p, q, r   (m, R)   restriction coefficients of the m constraints
    is_eq     (m, R)   broadcast flags (f32 0/1)
    xk, viol  (1, R)   current coordinate value / current violation
Outputs:
    v         (1, R)   accepted new coordinate value (xk where not accepted)

Semantics identical to solvers.coord_descent phase-1 + kernels.onevar
phase1_feasible_point (left-endpoint candidates, proximal tie-break,
`new_viol < viol` acceptance).  float32; validated against the reference
path in tests/test_onevar_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128
DEFAULT_TOL = 1e-4


def _feas_rows(x, p, q, c, tol):
    """feasible_ineq for candidate rows x (C, R) against one broadcast
    constraint row (1, R) each of p, q, c.

    Boundary comparisons carry a ~4-ulp relative slop: the candidates are
    these very boundary points computed by a *separately compiled*
    expression, and XLA's FMA contraction can move the recomputed root by
    1 ulp, flipping an exact >= at the candidate's own boundary.  The slop
    is ~1e-6 relative — three orders below the 1e-4 bisection granularity.

    Returns a float32 0/1 mask — Mosaic cannot select over i1 vectors, so
    all mask algebra here stays in f32.
    """
    f32 = jnp.float32
    eps = jnp.where(jnp.isfinite(x), 5e-7 * (1.0 + jnp.abs(x)), 0.0)
    D = q * q - 4.0 * p * c
    rD = jnp.sqrt(jnp.maximum(D, 0.0))
    two_p = 2.0 * p
    lo = (-q - rD) / two_p
    hi = (-q + rD) / two_p
    feas_pos = ((D >= 0) & (x >= lo - eps) & (x <= hi + eps)).astype(f32)
    feas_neg = ((D < 0) | (x <= hi + eps) | (x >= lo - eps)).astype(f32)
    xlin = -c / q
    feas_lin = jnp.where(q > tol, (x <= xlin + eps).astype(f32),
                         jnp.where(q < -tol, (x >= xlin - eps).astype(f32),
                                   jnp.ones_like(x, f32)))
    return jnp.where(p > tol, feas_pos, jnp.where(p < -tol, feas_neg, feas_lin))


def _left_ep_rows(p, q, c, tol):
    """left_endpoints for full (m, R) blocks."""
    D = q * q - 4.0 * p * c
    rD = jnp.sqrt(jnp.maximum(D, 0.0))
    quad = (jnp.abs(p) > tol) & (D >= 0)
    lin = (jnp.abs(p) <= tol) & (q < -tol)
    nan = jnp.full_like(p, jnp.nan)
    return jnp.where(quad, (-q - rD) / (2.0 * p),
                     jnp.where(lin, -c / q, nan))


def feasible_point_rows(p, q, r, eq, act, xk, s, m, tol):
    """(witness (R,), exists (R,)) at slack row s (R,), block layout (m, R).

    Identical semantics to kernels.onevar.phase1_feasible_point, restructured
    for lane-major tiles (also used directly by the Pallas kernel body).
    """
    big = jnp.float32(jnp.inf)
    sb = s[None, :]
    lo1 = _left_ep_rows(p, q, r - sb, tol)              # (m, R)
    lo2 = _left_ep_rows(-p, -q, -r - sb, tol)
    lo2 = jnp.where(eq > 0, lo2, jnp.nan)
    ninf = jnp.full((1, lo1.shape[1]), -jnp.inf, lo1.dtype)
    cands = jnp.concatenate([lo1, lo2, ninf], axis=0)   # (2m+1, R)

    f32 = jnp.float32
    feas = jnp.ones(cands.shape, f32)   # f32 0/1 masks throughout (Mosaic)

    # Static unroll over constraints: Mosaic has no dynamic_slice on values,
    # and m is a trace-time constant anyway.
    for j in range(m):
        pj, qj, rj = p[j:j + 1], q[j:j + 1], r[j:j + 1]   # (1, R)
        ej, aj = eq[j:j + 1], act[j:j + 1]
        f_le = _feas_rows(cands, pj, qj, rj - sb, tol)
        f_hi = _feas_rows(cands, -pj, -qj, -rj - sb, tol)
        fj = jnp.where(ej > 0, f_le * f_hi, f_le)
        fj = jnp.where(aj > 0, fj, jnp.ones_like(fj))
        feas = feas * fj

    feas = feas * (1.0 - jnp.isnan(cands).astype(f32))
    exists = jnp.max(feas, axis=0) > 0.5
    dist = jnp.where(feas > 0.5, jnp.abs(cands - xk[None, :]), big)
    dist = jnp.where(jnp.isnan(dist), big, dist)
    any_fin = jnp.min(dist, axis=0) < big
    # Mosaic arg-reductions only support f32, and gathers along sublanes are
    # unsupported — select via argmin on f32 keys + a one-hot contraction.
    best_prox = jnp.argmin(dist, axis=0)
    first_feas = jnp.argmin(1.0 - feas, axis=0)
    idx = jnp.where(any_fin, best_prox, first_feas)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, cands.shape, 0)
    onehot = (row_ids == idx[None, :].astype(jnp.int32)).astype(f32)
    witness = jnp.sum(jnp.where(onehot > 0.5, cands, 0.0), axis=0)
    return witness, exists


def _phase1_kernel(p_ref, q_ref, r_ref, eq_ref, act_ref, xk_ref, viol_ref,
                   v_ref, *, m: int, tol: float, viol_tol: float,
                   n_bisect: int):
    p = p_ref[:]          # (m, R)
    q = q_ref[:]
    r = r_ref[:]
    eq = eq_ref[:]        # (m, R) 0/1
    act = act_ref[:]      # (m, R) 0/1
    xk = xk_ref[0, :]     # (R,)
    viol = viol_ref[0, :]

    def feasible_point(s):
        return feasible_point_rows(p, q, r, eq, act, xk, s, m, tol)

    def bis_cond(c):
        ss, es, bx, bs, found, it = c
        # Reduce in f32, not via jnp.any over i1: Mosaic lowers bool
        # reductions through an intermediate whose dtype follows the x64
        # config at *outer-jit lowering* time (outside our enable_x64(False)
        # scope), which trips its 32-bit-only scalar conversion.
        return (jnp.max(es - ss) > tol) & (it < n_bisect)

    def bis_body(c):
        ss, es, bx, bs, found, it = c
        do = (es - ss) > tol
        sm = 0.5 * (ss + es)
        xi, exists = feasible_point(sm)
        take = do & exists
        ss = jnp.where(do & ~exists, sm, ss)
        es = jnp.where(take, sm, es)
        bx = jnp.where(take, xi, bx)
        bs = jnp.where(take, sm, bs)
        # found carried as f32 0/1: Mosaic rejects i1 loop carries
        found = jnp.maximum(found, take.astype(jnp.float32))
        return ss, es, bx, bs, found, it + 1

    R = xk.shape[0]
    init = (jnp.full((R,), -tol, jnp.float32), viol - viol_tol, xk, viol,
            jnp.zeros((R,), jnp.float32), jnp.int32(0))
    _, _, bx, bs, found, _ = jax.lax.while_loop(bis_cond, bis_body, init)

    accept = (found > 0.5) & (bs < viol) & jnp.isfinite(bx)
    v_ref[0, :] = jnp.where(accept, bx, xk)


def phase1_coordinate_update(p, q, r, is_eq, active, xk, viol,
                             tol=DEFAULT_TOL, viol_tol=1e-2, n_bisect=40,
                             interpret=False):
    """Fused phase-1 coordinate solve for a restart batch.

    p, q, r, is_eq, active: (m, R); xk, viol: (R,). R must be a multiple of
    128 (the caller pads the restart batch). Returns v (R,).
    """
    m, R = p.shape
    grid = R // LANES
    kernel = functools.partial(_phase1_kernel, m=m, tol=tol,
                               viol_tol=viol_tol, n_bisect=n_bisect)
    f32 = jnp.float32
    spec_m = pl.BlockSpec((m, LANES), lambda i: (0, i))
    spec_1 = pl.BlockSpec((1, LANES), lambda i: (0, i))
    with jax.enable_x64(False):
        v = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[spec_m, spec_m, spec_m, spec_m, spec_m, spec_1, spec_1],
            out_specs=spec_1,
            out_shape=jax.ShapeDtypeStruct((1, R), f32),
            interpret=interpret,
        )(p.astype(f32), q.astype(f32), r.astype(f32),
          is_eq.astype(f32), active.astype(f32),
          xk.astype(f32)[None, :], viol.astype(f32)[None, :])
    return v[0]
