"""Whole-phase consensus-ADMM mega-kernels: a full ADMM phase per pallas_call.

The vmapped XLA ADMM (solvers/admm.py) runs every iteration as a chain of
fusions whose (R, m, n) state round-trips through HBM, and its projection
bisection is a fixed 100-trip fori_loop that keeps running after every lane
has converged.  These kernels run the *entire* phase (z-consensus loop,
per-constraint secular bisection, dual updates, best-point tracking) for a
128-restart tile inside a single pallas_call:

  * the per-constraint eigenvectors Q (m, n, n) live in VMEM for the whole
    phase (~2.7 MB at n=100, m=50) and are the only matmul operands;
  * the primal/dual copies are carried in per-constraint EIGENCOORDINATES
    (xh, uh: (m, L, n) VMEM scratch), so one rotation pair per iteration
    serves the z-update, the projections, and the violation checks — the
    reference's rotate / bisect / rotate-back per projection
    (qcqp/utilities.py:165-196) collapses to 2m MXU matmuls per iteration;
  * LAYOUT IS LOAD-BEARING: restarts L on sublanes, the variable axis n on
    lanes.  Per-constraint scalars (phi, brackets, flags) are then lane
    reductions with keepdims — (C, L, 1) values that broadcast straight
    back over (C, L, n) with no relayout.  The transposed layout
    (n on sublanes) forces a lanes->sublanes relayout of the bracket state
    per secular-function evaluation and runs ~30x slower end to end;
  * projections run in a fori_loop over constraint chunks of _CHUNK
    (dynamic ref slices), so the bisection temporaries are (chunk, L, n),
    allocated once, and the kernel stays inside the ~16 MB VMEM budget
    (python-unrolled chunks do not share stack slots — measured 16-33 MB);
  * m is padded to a chunk multiple with inert rows (lam=qhat=0, r=-1,
    ineq): always fast-path-skipped, zero violation, and their consensus
    contribution (Q=I => x_pad = z) is subtracted exactly in the z-update;
  * the secular bisection (phi(nu) root, qcqp/utilities.py:173-195) is a
    per-chunk while_loop that stops when every non-fast-path (constraint,
    lane) bracket is resolved, instead of a worst-case fori;
  * iterations are a fori_loop whose body is predicated off (pl.when) once
    every lane has converged — converged tiles spin through the remaining
    iterations at branch-check cost;
  * phase 2 carries the reference's best-point tracker (bucketized
    lexicographic `better`, qcqp/utilities.py:135-146) per lane in VMEM.

float32.  Semantics mirror solvers/admm.py (reference: qcqp/qcqp.py:195-285),
vmapped-while parity: converged lanes freeze while the tile finishes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .onevar_pallas import LANES

import os
# MXU precision of the kernel matmuls (rotations, consensus sums, z-update).
# HIGHEST (6-pass f32) is the accuracy-validated default; ADMM_MXU_PREC=
# default selects single-pass bf16 multiplies for the mixed-precision study
# (benchmarks/mixed_precision.py; results pinned in BASELINE.md).
_HP = (jax.lax.Precision.HIGHEST
       if os.environ.get("ADMM_MXU_PREC", "highest") == "highest"
       else jax.lax.Precision.DEFAULT)
_NU_TOL = 1e-6        # secular bisection tol (reference: utilities.py:149,187)
_DBL_FIXED = int(os.environ.get("ADMM_DBL_FIXED", 10))
# Secular-solve Newton trips.  Round 5: 6 (was 12) — the ablation that
# re-tuned the CCP hinge prox applies here too: at the bench shape the
# 6-trip inexact projection is both 1.5x faster AND better on violation
# quality (8688-9216 r/s / med 0.54 vs 5895-5999 / med 0.92, replicated
# on two restart batches) — exact per-constraint projections make the
# finite-budget consensus overshoot, the slightly-inexact ones damp it.
# 4 trips is faster still (11219 r/s) but quality turns (med 0.73).
# Typical small-instance convergence is ~5 trips, so lockstep parity
# with the unfused path is unaffected.
_NW_FIXED = int(os.environ.get("ADMM_NW_FIXED", 6))
_SKIP_PROJ = os.environ.get("ADMM_SKIP_PROJ", "0") == "1"  # perf diagnostics
# Constraint-chunk size: projection temporaries are (chunk, L, n); the
# wrapper pads m to a multiple of this with inert rows.
_CHUNK = 5


def _consensus_sum(Q_ref, xh_ref, uh_ref, m_pad, shape):
    """sum_i (xh_i - uh_i) Q_i^T -> (L, n) (row-vector convention).
    fori with dynamic ref indexing: one stack slot, not one per row.
    (A single two-dim-contracting dot_general would run this at full MXU
    efficiency, but Mosaic rejects it: 'lhs contracting dims must be of
    size 1' — measured round 4.)"""
    def body(i, acc):
        return acc + jax.lax.dot_general(
            xh_ref[i] - uh_ref[i], Q_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HP)
    return jax.lax.fori_loop(0, m_pad, body, jnp.zeros(shape, jnp.float32))


def _make_chunk_step(Q_ref, lam_ref, qhat_ref, r_ref, eqm_ref, lmax_ref,
                     lmin_ref, xh_ref, uh_ref, n_chunks, need_dbl,
                     nw=_NW_FIXED):
    """Project every constraint chunk at z and accumulate the max violation
    of z.  fori_loop over chunks with dynamic ref slices: the (chunk, L, n)
    temporaries are allocated once, not per chunk.

    lam/qhat refs: (m_pad, 1, n); r/eqm/lmax/lmin refs: (m_pad, 1, 1).
    """
    f32 = jnp.float32
    C = _CHUNK

    def chunk_body(ci, carry):
        viol_acc, z, live_s = carry          # (L, 1), (L, n), (L, 1)
        c0 = pl.multiple_of(ci * C, C)
        lam = lam_ref[pl.ds(c0, C)]                      # (C, 1, n)
        qhat = qhat_ref[pl.ds(c0, C)]
        rr = r_ref[pl.ds(c0, C)]                         # (C, 1, 1)
        eqm = eqm_ref[pl.ds(c0, C)]
        lmax = lmax_ref[pl.ds(c0, C)]
        lmin = lmin_ref[pl.ds(c0, C)]

        # zhat for the chunk: C unrolled (L,n)x(n,n) MXU matmuls
        rows = []
        for j in range(C):
            zh = jnp.dot(z, Q_ref[c0 + j], preferred_element_type=f32,
                         precision=_HP)
            rows.append(zh[None])
        zh_c = jnp.concatenate(rows, axis=0)             # (C, L, n)

        def fvals(pts):
            """f_i at eigencoordinate points -> (C, L, 1) lane-reduced."""
            return jnp.sum((lam * pts + qhat) * pts, axis=-1,
                           keepdims=True) + rr

        fz = fvals(zh_c)                                 # (C, L, 1)
        vz = jnp.where(eqm > 0.5, jnp.abs(fz), jnp.maximum(fz, 0.0))
        viol_acc = jnp.maximum(viol_acc, jnp.max(vz, axis=0))

        uh_c = uh_ref[pl.ds(c0, C)]
        vh = zh_c + uh_c
        if _SKIP_PROJ:
            live3 = live_s[None] > 0.5
            xh_ref[pl.ds(c0, C)] = jnp.where(live3, vh, xh_ref[pl.ds(c0, C)])
            return viol_acc, z, live_s
        fv = fvals(vh)
        skip = (eqm < 0.5) & (fv <= 0.0)     # fast path (utilities:157-158)

        def xhat_of(nu):
            """nu (C, L, 1) -> stationary point (C, L, n)."""
            den = 2.0 * (1.0 + nu * lam)
            den = jnp.where(den == 0.0, 1e-30, den)
            return (2.0 * vh - nu * qhat) / den

        def phi(nu):
            xh = xhat_of(nu)
            return jnp.sum((lam * xh + qhat) * xh, axis=-1,
                           keepdims=True) + rr

        L = vh.shape[1]
        s_bnd = lmax > 0.0                               # (C, 1, 1)
        e_bnd = lmin < 0.0
        s0 = jnp.where(s_bnd, -1.0 / jnp.where(s_bnd, lmax, 1.0), -1.0)
        e0 = jnp.where(e_bnd, -1.0 / jnp.where(e_bnd, lmin, -1.0), 1.0)
        s0 = jnp.broadcast_to(s0, (C, L, 1))
        e0 = jnp.broadcast_to(e0, (C, L, 1))
        work = ~skip                        # fast-path rows sit the loops out
        s_unb = jnp.broadcast_to(~s_bnd, (C, L, 1)) & work
        e_unb = jnp.broadcast_to(~e_bnd, (C, L, 1)) & work

        # FIXED-count masked loops, not data-dependent while_loops: a
        # while cond is a full-array -> scalar reduction + sync per trip
        # (~15 us measured on v5e), an order of magnitude more than the
        # trip's ~1.6 us vector compute, so "early exit" loses to
        # straight-line predictable work.  Doubling (2 evals/step) runs only
        # when some constraint is one-side-unbounded (semidefinite rows) —
        # trace-static via `need_dbl` (the reference's doubling search,
        # utilities.py:181-186).
        if need_dbl:
            def dbl_body(_, se):
                s, e = se
                s = jnp.where(s_unb & (phi(s) <= 0.0), s * 2.0, s)
                e = jnp.where(e_unb & (phi(e) >= 0.0), e * 2.0, e)
                return s, e

            s0, e0 = jax.lax.fori_loop(0, _DBL_FIXED, dbl_body, (s0, e0))
            # Unlike the reference's unbounded doubling (utilities.py:181-186)
            # the fixed trip count above only reaches |nu| = 2^_DBL_FIXED.
            # Rescue rows whose root lies beyond: three wide jumps (x1024
            # each) push unresolved endpoints to |nu| ~ 2^40, all values
            # still finite in f32 (phi grows at most ~nu^2 ~ 1e24 << 3e38).
            # Documented deviation (ADVICE r3): a root beyond 2^40 (needs
            # |lam| << 1e-9 against an O(1) residual) converges to the
            # endpoint and returns a slightly inexact projection; the
            # lockstep parity tests (tests/test_admm_pallas.py) would
            # surface such a geometry as a pointwise mismatch.
            def wide_body(_, se):
                s, e = se
                s = jnp.where(s_unb & (phi(s) <= 0.0), s * 1024.0, s)
                e = jnp.where(e_unb & (phi(e) >= 0.0), e * 1024.0, e)
                return s, e

            s0, e0 = jax.lax.fori_loop(0, 3, wide_body, (s0, e0))

        # Root-find by FIXED-count safeguarded NEWTON.  Seed the bracket
        # with nu = 0: phi(0) = f(v) is already computed (fv), so infeasible
        # ineq rows (fv > 0, root right of 0) tighten s to 0 and eq rows
        # with fv < 0 tighten e to 0 — both finite-valued endpoints, unlike
        # the +-inf eigen-pole brackets.  Each trip evaluates phi and its
        # closed-form derivative (phi' = -2 sum (2 lam xh + qhat) g0 inv^2,
        # g0 = qhat + 2 lam vh) and takes the Newton step when it stays
        # inside the bracket, else the midpoint — worst case a bisection,
        # typical convergence to f32 exactness in ~5 trips where the
        # reference's uniform bisection spends ~21 (utilities.py:187-195).
        g0 = qhat + 2.0 * lam * vh                       # nu-independent
        s0 = jnp.where(fv > 0.0, jnp.maximum(s0, 0.0), s0)
        e0 = jnp.where(fv < 0.0, jnp.minimum(e0, 0.0), e0)

        def nw_body(_, cr):
            s, e, nu = cr
            den = 2.0 * (1.0 + nu * lam)
            den = jnp.where(den == 0.0, 1e-30, den)
            inv = 1.0 / den
            xh = (2.0 * vh - nu * qhat) * inv
            p = jnp.sum((lam * xh + qhat) * xh, axis=-1, keepdims=True) + rr
            dp = -2.0 * jnp.sum((2.0 * lam * xh + qhat) * g0 * inv * inv,
                                axis=-1, keepdims=True)
            s = jnp.where(p >= 0.0, nu, s)
            e = jnp.where(p <= 0.0, nu, e)
            cand = nu - p / dp
            inside = (cand > s) & (cand < e)             # False for NaN
            nu = jnp.where(inside, cand, 0.5 * (s + e))
            return s, e, nu

        _, _, nu_f = jax.lax.fori_loop(
            0, nw, nw_body, (s0, e0, 0.5 * (s0 + e0)))
        xh_c = jnp.where(skip, vh, xhat_of(nu_f))

        live3 = live_s[None] > 0.5                       # (1, L, 1)
        xh_ref[pl.ds(c0, C)] = jnp.where(live3, xh_c, xh_ref[pl.ds(c0, C)])
        uh_ref[pl.ds(c0, C)] = jnp.where(live3, uh_c + zh_c - xh_c,
                                         uh_ref[pl.ds(c0, C)])
        return viol_acc, z, live_s

    def project_all(z, live_s):
        """Project all chunks at z (masked by live lanes); returns viol(z)
        as (L, 1)."""
        L = z.shape[0]
        viol0 = jnp.zeros((L, 1), f32)
        viol, _, _ = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                       (viol0, z, live_s))
        return viol

    return project_all


def _init_rotated(Q_ref, xh_ref, uh_ref, x0, m_pad):
    zero = jnp.zeros_like(x0)

    def body(i, _):
        xh_ref[i] = jnp.dot(x0, Q_ref[i], preferred_element_type=jnp.float32,
                            precision=_HP)
        uh_ref[i] = zero
        return 0

    jax.lax.fori_loop(0, m_pad, body, 0)


def _viol_init(lam_ref, qhat_ref, r_ref, eqm_ref, xh_ref, m_pad, L):
    """Violation at the start point from its rotated copies -> (L, 1)."""
    def body(i, v):
        xh = xh_ref[i]                                   # (L, n)
        fv = jnp.sum((lam_ref[i] * xh + qhat_ref[i]) * xh, axis=-1,
                     keepdims=True) + r_ref[i]
        vi = jnp.where(eqm_ref[i] > 0.5, jnp.abs(fv), jnp.maximum(fv, 0.0))
        return jnp.maximum(v, vi)

    return jax.lax.fori_loop(0, m_pad, body, jnp.zeros((L, 1), jnp.float32))


def _admm_phase1_kernel(Q_ref, lam_ref, qhat_ref, r_ref, eqm_ref, lmax_ref,
                        lmin_ref, x0_ref, out_ref, xh_ref, uh_ref, viol_ref,
                        *, m: int, m_pad: int, n: int, num_iters: int,
                        tol: float, need_dbl: bool, nw: int = _NW_FIXED):
    """Feasibility consensus (reference: qcqp/qcqp.py:195-212) on an (L, n)
    restart tile; per-lane freeze, predicated tile idle after convergence."""
    f32 = jnp.float32
    project_all = _make_chunk_step(Q_ref, lam_ref, qhat_ref, r_ref, eqm_ref,
                                   lmax_ref, lmin_ref, xh_ref, uh_ref,
                                   m_pad // _CHUNK, need_dbl, nw)
    x0 = x0_ref[:]                                       # (L, n)
    L = x0.shape[0]
    _init_rotated(Q_ref, xh_ref, uh_ref, x0, m_pad)
    out_ref[:] = x0
    viol_ref[:] = _viol_init(lam_ref, qhat_ref, r_ref, eqm_ref, xh_ref,
                             m_pad, L)
    pad = float(m_pad - m)

    def iteration(t, _):
        live = viol_ref[:] >= tol                        # (L, 1)

        @pl.when(jnp.max(live.astype(f32)) > 0.5)
        def _():
            z_old = out_ref[:]
            # inert pad rows contribute exactly z_old each (Q=I, skip path)
            total = _consensus_sum(Q_ref, xh_ref, uh_ref, m_pad, z_old.shape)
            z_new = (total - pad * z_old) / m
            z = jnp.where(live, z_new, z_old)
            out_ref[:] = z
            viol_new = project_all(z, live.astype(f32))
            viol_ref[:] = jnp.where(live, viol_new, viol_ref[:])

        return 0

    jax.lax.fori_loop(0, num_iters, iteration, 0)


def _admm_phase2_kernel(Q_ref, lam_ref, qhat_ref, r_ref, eqm_ref, lmax_ref,
                        lmin_ref, W_ref, P0_ref, q0_ref, rho_ref, x0_ref,
                        out_ref, xh_ref, uh_ref, z_ref, zlast_ref, key_ref,
                        *, m: int, m_pad: int, n: int, num_iters: int,
                        tol: float, viol_lim: float, better_tol: float,
                        r0: float, need_dbl: bool, nw: int = _NW_FIXED):
    """Objective consensus with best-point tracking (reference:
    qcqp/qcqp.py:215-251); z-update via the precomputed (symmetric) inverse
    W of 2 (P0 + rho m I) — one (L, n) x (n, n) matmul per iteration (the
    reference's cached SuperLU solve, qcqp.py:224-232).

    key_ref columns: 0 = best bucket, 1 = best objective, 2 = done flag."""
    f32 = jnp.float32
    project_all = _make_chunk_step(Q_ref, lam_ref, qhat_ref, r_ref, eqm_ref,
                                   lmax_ref, lmin_ref, xh_ref, uh_ref,
                                   m_pad // _CHUNK, need_dbl, nw)
    rho = rho_ref[0, 0]
    q0 = q0_ref[:]                                       # (1, n)

    def objective(z):
        Pz = jnp.dot(z, P0_ref[:], preferred_element_type=f32,
                     precision=_HP)                      # (L, n)
        return (jnp.sum(z * Pz, axis=-1, keepdims=True)
                + jnp.sum(q0 * z, axis=-1, keepdims=True) + r0)   # (L, 1)

    x0 = x0_ref[:]                                       # (L, n)
    L = x0.shape[0]
    _init_rotated(Q_ref, xh_ref, uh_ref, x0, m_pad)
    z_ref[:] = x0
    zlast_ref[:] = x0
    out_ref[:] = x0
    key_ref[:, 0:1] = jnp.floor(
        _viol_init(lam_ref, qhat_ref, r_ref, eqm_ref, xh_ref, m_pad, L)
        / better_tol)
    key_ref[:, 1:2] = objective(x0)
    key_ref[:, 2:3] = jnp.zeros((L, 1), f32)

    def iteration(t, _):
        live = key_ref[:, 2:3] < 0.5                     # (L, 1)

        @pl.when(jnp.max(live.astype(f32)) > 0.5)
        def _():
            z_old = z_ref[:]
            total = _consensus_sum(Q_ref, xh_ref, uh_ref, m_pad, z_old.shape)
            # pad rows: x_pad - u_pad == z_old exactly (skip path, u stays 0)
            rhs = 2.0 * rho * (total - float(m_pad - m) * z_old) - q0
            z_new = jnp.dot(rhs, W_ref[:], preferred_element_type=f32,
                            precision=_HP)               # W symmetric
            z = jnp.where(live, z_new, z_old)
            z_ref[:] = z
            viol_new = project_all(z, live.astype(f32))  # (L, 1)

            # reference iteration-ordering parity (qcqp.py:241-250): the
            # breaks fire before the tracker absorbs the current z
            dz = z - zlast_ref[:]
            nrm = jnp.sqrt(jnp.sum(dz * dz, axis=-1, keepdims=True))
            converged = (t > 0) & (nrm < tol)            # (L, 1)
            b = jnp.floor(viol_new / better_tol)
            f = objective(z)
            diverged = viol_new > viol_lim
            take = live & ~(converged | diverged)
            bb, bf = key_ref[:, 0:1], key_ref[:, 1:2]
            win = take & ((b < bb) | ((b == bb) & (f < bf)))
            out_ref[:] = jnp.where(win, z, out_ref[:])
            key_ref[:, 0:1] = jnp.where(win, b, bb)
            key_ref[:, 1:2] = jnp.where(win, f, bf)
            key_ref[:, 2:3] = jnp.maximum(
                key_ref[:, 2:3],
                (live & (converged | diverged)).astype(f32))
            zlast_ref[:] = jnp.where(live, z, zlast_ref[:])

        return 0

    jax.lax.fori_loop(0, num_iters, iteration, 0)


def _call_phase(kernel, args_bc, xs, n, m_pad, interpret, phase2=False):
    R = xs.shape[0]
    assert R % LANES == 0 and xs.shape[1] == n
    grid = R // LANES
    in_specs = []
    for a in args_bc:
        if a.ndim == 3:
            in_specs.append(pl.BlockSpec(a.shape, lambda i: (0, 0, 0)))
        else:
            in_specs.append(pl.BlockSpec(a.shape, lambda i: (0, 0)))
    tile = pl.BlockSpec((LANES, n), lambda i: (i, 0))
    scratch = [pltpu.VMEM((m_pad, LANES, n), jnp.float32),   # xh
               pltpu.VMEM((m_pad, LANES, n), jnp.float32)]   # uh
    if phase2:
        scratch += [pltpu.VMEM((LANES, n), jnp.float32),   # z
                    pltpu.VMEM((LANES, n), jnp.float32),   # z_last
                    pltpu.VMEM((LANES, 3), jnp.float32)]   # best keys + done
    else:
        scratch += [pltpu.VMEM((LANES, 1), jnp.float32)]   # viol
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs + [tile],
            out_specs=tile,
            out_shape=jax.ShapeDtypeStruct((R, n), jnp.float32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*args_bc, xs.astype(jnp.float32))
    return out


@functools.partial(jax.jit, static_argnames=(
    "m", "num_iters", "tol", "viol_lim", "better_tol", "r0", "phase",
    "need_dbl", "nw", "interpret"))
def _admm_phase(Q, lam3, qhat3, r3, eqm3, lmax3, lmin3, W, P0, q0, rho_arr,
                xs, *, m, num_iters, tol, viol_lim, better_tol, r0, phase,
                need_dbl, nw, interpret):
    m_pad, _, n = lam3.shape
    base = (Q, lam3, qhat3, r3, eqm3, lmax3, lmin3)
    if phase == 1:
        k = functools.partial(_admm_phase1_kernel, m=m, m_pad=m_pad, n=n,
                              num_iters=num_iters, tol=tol,
                              need_dbl=need_dbl, nw=nw)
        return _call_phase(k, base, xs, n, m_pad, interpret)
    k = functools.partial(_admm_phase2_kernel, m=m, m_pad=m_pad, n=n,
                          num_iters=num_iters, tol=tol,
                          viol_lim=viol_lim, better_tol=better_tol, r0=r0,
                          need_dbl=need_dbl, nw=nw)
    args = base + (W, P0, q0, rho_arr)
    return _call_phase(k, args, xs, n, m_pad, interpret, phase2=True)


class ADMMFusedData:
    """One-time per-(form, rho) setup for the fused ADMM kernels — the
    device-resident analog of the reference's caches: per-constraint eighs
    on `f.eigh` (qcqp/utilities.py:160-162) and the z-update factorization
    keyed on rho (qcqp/qcqp.py:224-227).

    Computed on the host in float64 (the TPU's f32 eigh is not accurate
    enough for the rotation cache — BASELINE.md round-1 finding) and shipped
    once as f32; reuse across improve calls avoids the per-call device<->host
    round-trips, which dominate on a tunneled TPU.

    Bracket coverage when `need_dbl` (one-side-unbounded constraints): the
    kernel replaces the reference's unbounded doubling search
    (utilities.py:181-186) with _DBL_FIXED=10 doubling trips plus three
    x1024 rescue jumps, covering secular roots out to |nu| ~ 2^40 — far
    beyond any f32-representable constraint geometry.
    """

    def __init__(self, form, rho=None):
        n, m = form.n, form.m
        P = np.asarray(form.P, np.float64)
        q = np.asarray(form.q, np.float64)
        r = np.asarray(form.r, np.float64)
        eq = np.asarray(form.is_eq)

        lam, Q = np.linalg.eigh(P[1:])
        qhat = np.einsum("mij,mi->mj", Q, q[1:])
        if rho is None:
            lmb_min = float(np.linalg.eigvalsh(P[0]).min())
            rho = 50.0 * (2.0 * (1.0 - lmb_min) / m if lmb_min < 0
                          else 1.0 / m)
        rho = float(rho)
        W = np.linalg.inv(2.0 * (P[0] + rho * m * np.eye(n)))

        # pad m to a chunk multiple with inert rows: lam=qhat=0, r=-1, ineq
        # (always fast-path-skipped, zero violation; Q=I so the consensus
        # contribution is exactly z and is subtracted in the kernels)
        m_pad = -(-m // _CHUNK) * _CHUNK
        if m_pad != m:
            padc = m_pad - m
            lam = np.concatenate([lam, np.zeros((padc, n))])
            Q = np.concatenate([Q, np.broadcast_to(np.eye(n), (padc, n, n))])
            qhat = np.concatenate([qhat, np.zeros((padc, n))])
            rcon = np.concatenate([r[1:], -np.ones(padc)])
            eqf = np.concatenate([eq.astype(np.float64), np.zeros(padc)])
        else:
            rcon, eqf = r[1:], eq.astype(np.float64)

        f32 = jnp.float32
        s3 = lambda a: jnp.asarray(a, f32)[:, None, None]   # (m_pad, 1, 1)
        self.m, self.rho, self.r0 = m, rho, float(r[0])
        # doubling only needed when some REAL row is one-side-unbounded
        # (pad rows are always fast-path-skipped and never reach the loops)
        self.need_dbl = bool(np.any(lam[:m].max(axis=1) <= 0.0)
                             or np.any(lam[:m].min(axis=1) >= 0.0))
        self.tensors = (
            jnp.asarray(Q, f32),
            jnp.asarray(lam, f32)[:, None, :],              # (m_pad, 1, n)
            jnp.asarray(qhat, f32)[:, None, :],
            s3(rcon), s3(eqf),
            s3(lam.max(axis=1)), s3(lam.min(axis=1)),
            jnp.asarray(W, f32), jnp.asarray(P[0], f32),
            jnp.asarray(q[0], f32)[None, :],                # (1, n)
            jnp.asarray([[rho]], f32))
        from ..core import QCQPForm
        self.form32 = QCQPForm(form.P.astype(f32), form.q.astype(f32),
                               form.r.astype(f32), form.is_eq)


@functools.partial(jax.jit, static_argnames=(
    "m", "num_iters", "tol", "viol_lim", "better_tol", "r0", "phase1",
    "need_dbl", "nw", "interpret"))
def _admm_improve(tensors, form32, xs_p, *, m, num_iters, tol, viol_lim,
                  better_tol, r0, phase1, need_dbl, nw, interpret):
    """Whole improve (both phase kernels + the reference's better-folds,
    qcqp.py:281,284-285) as ONE jitted program: a tunneled TPU pays
    ~O(100ms-1s) per dispatch, so the phases must not be separate calls."""
    from ..core import better  # local: avoid a cycle at import
    kw = dict(m=m, num_iters=num_iters, tol=tol, viol_lim=viol_lim,
              better_tol=better_tol, r0=r0, need_dbl=need_dbl, nw=nw,
              interpret=interpret)
    fold = jax.vmap(lambda a, b: better(form32, a, b, better_tol))
    x1 = xs_p
    if phase1:
        x1 = fold(xs_p, _admm_phase(*tensors, xs_p, phase=1, **kw))
    x2 = _admm_phase(*tensors, x1, phase=2, **kw)
    return fold(x1, x2)


# VMEM budget for the whole-phase kernels: the (m_pad, L, n) xh/uh scratch
# plus Q (m_pad, n, n) and the (CHUNK, L, n) projection temporaries must fit
# the ~16 MB/core VMEM.  Calibrated against the bench shape (n=100, m=50):
# the full estimate below totals ~13.1 MB there and the kernel is measured
# to compile and run on v5e, so 14 MB leaves ~2 MB of Mosaic headroom; a
# miss past the guard is caught by improve_admm_fused's try/except fallback.
_VMEM_BUDGET = 14 * 2**20


def admm_fused_fits(n: int, m: int) -> bool:
    """Whether the whole-phase kernels' VMEM working set fits for (n, m).
    Callers fall back to the vmapped XLA path otherwise (the n-tiled /
    constraint-streaming variant is future work, SURVEY scaling dims).

    The estimate covers every kernel resident (ADVICE r3: W/P0 and the
    per-constraint const banks were uncounted, letting near-threshold
    shapes pass the guard and fail Mosaic allocation); improve_admm_fused
    additionally wraps the compile in a try/except so the guard is a fast
    path, not a correctness gate."""
    m_pad = -(-m // _CHUNK) * _CHUNK
    npad = -(-n // 128) * 128
    scratch = 2 * m_pad * LANES * npad * 4          # xh, uh
    scratch += (2 * npad + 8) * LANES * 4           # z, z_last, keys/viol
    consts = m_pad * npad * npad * 4                # Q
    consts += 2 * npad * npad * 4                   # W, P0 (phase 2)
    consts += 2 * m_pad * npad * 4                  # lam, qhat banks
    consts += 4 * m_pad * 4 + npad * 4              # r/eqm/lmax/lmin, q0
    # projection temporaries: zh/uh/vh/xh chunk copies plus the Newton
    # loop's live (C, L, n) values (Mosaic reuses stack slots across the
    # chunk fori, so 8 live buffers bounds the measured footprint)
    temps = 8 * _CHUNK * LANES * npad * 4
    return n <= 1024 and scratch + consts + temps < _VMEM_BUDGET


def improve_admm_fused(form, xs, rho=None, num_iters=1000, viol_lim=1e4,
                       tol=1e-2, phase1=True, better_tol=1e-4,
                       nw_trips=_NW_FIXED,
                       interpret=False, data: ADMMFusedData = None):
    """Batched two-phase ADMM improve via the whole-phase Pallas kernels
    (reference: qcqp/qcqp.py:254-285), with the reference's better-folds
    between stages (qcqp.py:281,284-285): x1 = better(x0, phase1(x0));
    return better(x1, phase2(x1)).

    xs (R, n), R padded internally to a multiple of 128.  Pass a
    precomputed `data` (ADMMFusedData) to amortize the one-time setup
    across calls on the same problem.  Problems whose working set exceeds
    the VMEM budget (see admm_fused_fits) route to the vmapped XLA improve.
    """
    R, n = xs.shape
    if form.m == 0:
        from ..solvers.admm import improve_admm_batch as _b
        return _b(form, jnp.asarray(xs, form.dtype), None,
                  num_iters=num_iters, phase1=phase1)

    def _vmapped():
        from ..solvers.admm import improve_admm_batch
        rho_v = None if rho is None else jnp.asarray(rho, form.dtype)
        return improve_admm_batch(form, jnp.asarray(xs, form.dtype), rho_v,
                                  num_iters=num_iters, viol_lim=viol_lim,
                                  tol=tol, phase1=phase1)

    if not admm_fused_fits(n, form.m):
        return _vmapped()
    if data is None:
        data = ADMMFusedData(form, rho)
    R_pad = -(-R // LANES) * LANES
    xs_p = jnp.pad(jnp.asarray(xs, jnp.float32), ((0, R_pad - R), (0, 0)))
    try:
        out = _admm_improve(
            data.tensors, data.form32, xs_p, m=int(data.m),
            num_iters=int(num_iters), tol=float(tol), viol_lim=float(viol_lim),
            better_tol=float(better_tol), r0=data.r0, phase1=bool(phase1),
            need_dbl=data.need_dbl, nw=int(nw_trips),
            interpret=bool(interpret))
    except Exception as e:  # Mosaic VMEM allocation at compile time
        if "vmem" not in str(e).lower() and "memory" not in str(e).lower():
            raise
        import logging
        logging.getLogger("qcqp_tpu").warning(
            "fused ADMM kernel failed to allocate (%s); falling back to the "
            "vmapped path", type(e).__name__)
        return _vmapped()
    return out[:R]
