"""Whole-improve penalty-CCP mega-kernel: the full DCCP replacement in ONE
pallas_call per restart tile.

The vmapped XLA CCP (solvers/ccp.py) is HBM-bound: every inner consensus
trip hauls its (blocks, restarts, n) prox state through HBM, which left it
~1000x slower than the CD path (26.8 vs 28672 restarts/s, VERDICT r3 weak
#1) even after the safeguarded-Newton prox win.  This kernel runs the
ENTIRE improve — outer penalty loop, inner consensus splitting, per-block
hinge proxes — for a 64-restart tile inside VMEM, following the fused-ADMM
recipe (kernels/admm_pallas.py):

  * the default diagonal DC split (core.dc_split) makes the structure
    collapse: P2_i = s_i I, so the only eigenbases are those of the P rows
    themselves.  V (m+1, n, n) is the single matmul operand bank;
  * block state (xs, us) lives in NATURAL coordinates, so the consensus
    mean and dual updates are lane-ops; each positive hinge prox costs two
    (L, n) x (n, n) MXU rotations per inner trip (in to the eigenbasis,
    back out);
  * negative-direction blocks exist only for the E equality rows (static,
    rows are permuted eq-first by CCPFusedData) and their quadratic part is
    s_i I — the prox is DIAGONAL, zero matmuls;
  * inert negative blocks of inequality rows are replicated analytically:
    they contribute exactly z to the consensus mean and
    |2 z_t - z_{t-1} - z_{t+1}| to the primal residual (closed form of the
    vmapped iteration's inert-block algebra), so the kernel's z trajectory
    matches solvers/ccp.py pointwise;
  * the linearization cache (xk rotated into every eigenbasis) is built
    once per outer iteration — m+1 matmuls — and doubles as the violation
    evaluation for the outer early exit;
  * loops mirror the vmapped lockstep semantics: inner runs while ANY lane
    in the tile is above the residual tolerance, outer while ANY lane is
    unfinished (jax.vmap of a while_loop batches the cond with an OR and
    keeps updating converged lanes — so does this kernel, which is what
    makes pointwise lockstep parity tests possible).

float32; use_eigen_split routes to the vmapped path (the eigen split has
m+1 distinct P2 eigenbases and 3x the VMEM footprint).
Reference behavior matched: qcqp/qcqp.py:288-322 (DCCP improve).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# CCP restart tile: 64 sublane-rows (half the ADMM kernel's 128) — the
# (1+m+E, L, n) xs/us banks plus the V bank must fit VMEM at the bench
# shape (n=100, m=50, E~25: ~12 MB at L=64).
L_TILE = 64
_HP = jax.lax.Precision.HIGHEST
# Newton trips of the hinge prox.  solvers/ccp.py converges the root to
# f32 exactness in 15 trips; the fused DEFAULT is 5 (round 5): the
# anatomy ablation found the inexact prox is both faster AND better on
# median violation (a converged hinge projection makes the short
# warm-dual consensus overshoot, the softer prox conditions it), but the
# trip count sits on a CLIFF for equality-dominated instances: at 4
# trips the boolean-LS smoke instance (all rows x_i^2 = 1, opposing
# hinge pairs that must balance precisely) lands 0/64 restarts feasible,
# at 5 trips 64/64.  Measured at the bench shape: 5 trips = 1042 r/s /
# med 0.56 (4: 1210 / 0.23 but equality-cliffed; 15: 504 / 1.65).
# Parity tests pass n_newton=15 to match the vmapped path.
_N_NEWTON = 15


def _hinge_prox_tile(vh, lam, qt, rb, weight, rho, trips=_N_NEWTON):
    """Masked fixed-trip safeguarded-Newton hinge prox on a (C, L, n) tile.

    Pointwise mirror of solvers/ccp.py:_hinge_prox at trips=15 (same
    log-space safeguard, same CLOSED-interval acceptance); lam broadcasts
    from (C, 1, n) (eigencoordinate blocks) or (C, 1, 1) (diagonal
    negative blocks).  weight/rho are (L, 1) per-lane scalars.
    """
    f32 = jnp.float32

    def g_of(xt):
        return jnp.sum((lam * xt + qt) * xt, axis=-1, keepdims=True) + rb

    def x_of(nu):
        den = rho + 2.0 * nu * lam
        den = jnp.where(den == 0.0, 1e-30, den)
        return (rho * vh - nu * qt) / den

    g_v = g_of(vh)
    x_full = x_of(weight)
    g_full = g_of(x_full)
    g0 = qt + 2.0 * lam * vh

    def body(_, cr):
        s, e, nu = cr
        den = rho + 2.0 * nu * lam
        den = jnp.where(den == 0.0, 1e-30, den)
        x = (rho * vh - nu * qt) / den
        g = jnp.sum((lam * x + qt) * x, axis=-1, keepdims=True) + rb
        dg = -rho * jnp.sum((2.0 * lam * x + qt) * g0 / (den * den),
                            axis=-1, keepdims=True)
        s = jnp.where(g > 0, nu, s)
        e = jnp.where(g <= 0, nu, e)
        cand = nu - g / dg
        inside = (cand >= s) & (cand <= e)      # closed; False for NaN
        mid = jnp.where(s > 0.0, jnp.sqrt(s * e), e * (1.0 / 1024.0))
        nu = jnp.where(inside, cand, mid)
        return s, e, nu

    C, Lr, _ = vh.shape
    zero = jnp.zeros((C, Lr, 1), f32)
    wgt = jnp.broadcast_to(weight, (C, Lr, 1))
    _, _, nu_f = jax.lax.fori_loop(0, trips, body,
                                   (zero, wgt, 0.5 * wgt))
    x_root = x_of(nu_f)
    return jnp.where(g_v <= 0, vh, jnp.where(g_full >= 0, x_full, x_root))


_CHUNK = 5


def _ccp_kernel(V_ref, lam0_ref, lam1_ref, qhat_ref, qnat_ref, shift_ref,
                r_ref, eqm_ref, x0_ref, out_ref,
                xs_ref, us_ref, xkh_ref, qm_ref, rm_ref, z_ref, zp_ref,
                tau_ref, res_ref,
                *, m: int, E: int, n: int, tau0: float, mu: float,
                tau_max: float, max_iter: int, inner_iters: int, rho0: float,
                stall_tol: float, inner_tol: float, viol_exit_tol: float,
                warm_inner: bool, n_newton: int):
    """One whole CCP improve per (L_TILE, n) restart tile.

    Block bank layout (xs/us refs, B = 1 + m + E rows):
      0       objective block (prox in eigenbasis of row 0)
      1..m    positive hinges (row i's eigenbasis; eq rows come first)
      m+1..   negative hinges of the E equality rows (diagonal prox)

    All block passes run in chunks of _CHUNK rows (fori over full chunks
    with dynamic ref slices + a python-unrolled remainder), so the 15-trip
    Newton executes on (C, L, n) tiles instead of per-row — per-row
    processing measured 18x off the op-count roofline from Mosaic per-op
    overhead alone.
    """
    f32 = jnp.float32
    B = 1 + m + E
    n_inert = m - E
    Btot = float(2 * m + 1)           # the vmapped version's block count

    x0 = x0_ref[:]                                   # (L, n)
    Lr = x0.shape[0]

    def rot(x, i):
        """x (L, n) -> eigencoords of row i (one MXU matmul)."""
        return jnp.dot(x, V_ref[i], preferred_element_type=f32,
                       precision=_HP)

    def rot_back(xh, i):
        return jax.lax.dot_general(xh, V_ref[i], (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32, precision=_HP)

    def chunk_ranges(lo, hi):
        """(start, count) pieces covering [lo, hi): full _CHUNK chunks via
        one fori (returned as (fori_hi, ...)), plus a python remainder."""
        total = hi - lo
        nfull = total // _CHUNK
        rem = total - nfull * _CHUNK
        return nfull, rem

    def linearize(xk):
        """Per-outer caches: xkh (all rows), qm/rm (eq rows); returns
        (nxk2, viol) — viol evaluated for free from the rotated copies."""
        def xkh_chunk(c0, C, viol):
            rows = [rot(xk, c0 + j)[None] for j in range(C)]
            xkh = jnp.concatenate(rows, axis=0)          # (C, L, n)
            xkh_ref[pl.ds(c0, C)] = xkh
            lam0 = lam0_ref[pl.ds(c0, C)]
            qh = qhat_ref[pl.ds(c0, C)]
            rr = r_ref[pl.ds(c0, C)]
            eqm = eqm_ref[pl.ds(c0, C)]
            fv = jnp.sum((lam0 * xkh + qh) * xkh, axis=-1,
                         keepdims=True) + rr
            vi = jnp.where(eqm > 0.5, jnp.abs(fv), jnp.maximum(fv, 0.0))
            return jnp.maximum(viol, jnp.max(vi, axis=0))

        # row 0 (objective) has no violation contribution: eqm row 0 is
        # forced inequality and its f-value is ignored by starting the
        # violation max at rows >= 1 (handled by masking row 0 to -inf
        # via r trick is fragile — instead rotate row 0 separately).
        xkh_ref[0] = rot(xk, 0)
        viol0 = jnp.zeros((Lr, 1), f32)
        nfull, rem = chunk_ranges(1, m + 1)

        def vbody(ci, viol):
            return xkh_chunk(1 + ci * _CHUNK, _CHUNK, viol)

        viol = viol0
        if nfull:      # fori traces its body even for zero trips
            viol = jax.lax.fori_loop(0, nfull, vbody, viol)
        if rem:
            viol = xkh_chunk(1 + nfull * _CHUNK, rem, viol)
        nxk2 = jnp.sum(xk * xk, axis=-1, keepdims=True)

        def qm_chunk(j0, C):
            i0 = j0 + 1                              # eq rows are 1..E
            lam1 = lam1_ref[pl.ds(i0, C)]            # (C, 1, n)
            xkh = xkh_ref[pl.ds(i0, C)]              # (C, L, n)
            t = lam1 * xkh
            rows = [rot_back(t[j], i0 + j)[None] for j in range(C)]
            qm_ref[pl.ds(j0, C)] = -qnat_ref[pl.ds(i0, C)] \
                - 2.0 * jnp.concatenate(rows, axis=0)
            rm_ref[pl.ds(j0, C)] = -r_ref[pl.ds(i0, C)] \
                + jnp.sum(t * xkh, axis=-1, keepdims=True)

        nfull_e, rem_e = chunk_ranges(0, E)

        def qbody(cj, _):
            qm_chunk(cj * _CHUNK, _CHUNK)
            return 0

        if nfull_e:
            jax.lax.fori_loop(0, nfull_e, qbody, 0)
        if rem_e:
            qm_chunk(nfull_e * _CHUNK, rem_e)
        return nxk2, viol

    def inner_loop(tau, rho_k, nxk2):
        """Consensus splitting at the current linearization; z_ref holds
        the consensus iterate (enters as xk, leaves as the subproblem
        solution).  Lockstep: runs while ANY lane's residual is above
        tol."""

        def one_iter(z):
            # ---- pass 1: proxes + consensus sum ----
            # objective block (bank row 0)
            u0 = us_ref[0]
            vh = rot(z - u0, 0)
            qt0 = qhat_ref[0] - 2.0 * shift_ref[0] * xkh_ref[0]
            xh = (rho_k * vh - qt0) / (rho_k + 2.0 * lam1_ref[0])
            xb = rot_back(xh, 0)
            xs_ref[0] = xb
            S = xb + u0

            # positive hinges (bank rows 1..m), chunked
            def pos_chunk(c0, C, S):
                u = us_ref[pl.ds(c0, C)]             # (C, L, n)
                zmu = z[None] - u
                rows = [rot(zmu[j], c0 + j)[None] for j in range(C)]
                vh = jnp.concatenate(rows, axis=0)
                sh = shift_ref[pl.ds(c0, C)]
                qt = qhat_ref[pl.ds(c0, C)] - 2.0 * sh * \
                    xkh_ref[pl.ds(c0, C)]
                rb = r_ref[pl.ds(c0, C)] + sh * nxk2
                xh = _hinge_prox_tile(vh, lam1_ref[pl.ds(c0, C)], qt, rb,
                                      tau, rho_k, trips=n_newton)
                rows = [rot_back(xh[j], c0 + j)[None] for j in range(C)]
                xb = jnp.concatenate(rows, axis=0)
                xs_ref[pl.ds(c0, C)] = xb
                return S + jnp.sum(xb + u, axis=0)

            nfull, rem = chunk_ranges(1, m + 1)

            def pbody(ci, S):
                return pos_chunk(1 + ci * _CHUNK, _CHUNK, S)

            if nfull:
                S = jax.lax.fori_loop(0, nfull, pbody, S)
            if rem:
                S = pos_chunk(1 + nfull * _CHUNK, rem, S)

            # negative hinges of eq rows (bank rows m+1..): diagonal
            # prox (no rotations), chunked
            def neg_chunk(j0, C, S):
                bi = m + 1 + j0
                u = us_ref[pl.ds(bi, C)]
                v = z[None] - u
                s_j = shift_ref[pl.ds(1 + j0, C)]    # (C, 1, 1)
                xb = _hinge_prox_tile(v, s_j, qm_ref[pl.ds(j0, C)],
                                      rm_ref[pl.ds(j0, C)], tau, rho_k,
                                      trips=n_newton)
                xs_ref[pl.ds(bi, C)] = xb
                return S + jnp.sum(xb + u, axis=0)

            nfull_e, rem_e = chunk_ranges(0, E)

            def nbody(cj, S):
                return neg_chunk(cj * _CHUNK, _CHUNK, S)

            if nfull_e:
                S = jax.lax.fori_loop(0, nfull_e, nbody, S)
            if rem_e:
                S = neg_chunk(nfull_e * _CHUNK, rem_e, S)

            # inert negative blocks of inequality rows contribute exactly z
            z_new = (S + float(n_inert) * z) / Btot

            # ---- pass 2: dual updates + primal residual, chunked ----
            def du_chunk(b0, C, pr):
                d = xs_ref[pl.ds(b0, C)] - z_new[None]
                us_ref[pl.ds(b0, C)] = us_ref[pl.ds(b0, C)] + d
                return jnp.maximum(
                    pr, jnp.max(jnp.max(jnp.abs(d), axis=-1, keepdims=True),
                                axis=0))

            nfull_b, rem_b = chunk_ranges(0, B)

            def dbody(cb, pr):
                return du_chunk(cb * _CHUNK, _CHUNK, pr)

            pr = jnp.zeros((Lr, 1), f32)
            if nfull_b:
                pr = jax.lax.fori_loop(0, nfull_b, dbody, pr)
            if rem_b:
                pr = du_chunk(nfull_b * _CHUNK, rem_b, pr)
            if n_inert > 0:
                # closed form of the inert blocks' |x - z_new|
                d_in = jnp.max(jnp.abs(2.0 * z - zp_ref[:] - z_new),
                               axis=-1, keepdims=True)
                pr = jnp.maximum(pr, d_in)
            scale = 1.0 + jnp.max(jnp.abs(z_new), axis=-1, keepdims=True)
            res = jnp.maximum(pr, jnp.max(jnp.abs(z_new - z), axis=-1,
                                          keepdims=True)) / scale
            return z_new, res

        def cond(carry):
            t, go = carry
            return (t < inner_iters) & (go > 0.5)

        def body(carry):
            t, _ = carry
            z = z_ref[:]
            z_new, res = one_iter(z)
            zp_ref[:] = z
            z_ref[:] = z_new
            res_ref[:] = res
            go = (jnp.max(res) > inner_tol).astype(f32)
            return t + 1, go

        jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32),
                                        jnp.asarray(1.0, f32)))

    # ---- outer penalty loop (lockstep over the tile) ----
    out_ref[:] = x0
    tau_ref[:] = jnp.full((Lr, 1), tau0, f32)

    def outer(it, live_f):
        # live_f > 0.5 while ANY lane is unfinished (vmap-lockstep parity)
        @pl.when(live_f[0] > 0.5)
        def _():
            xk = out_ref[:]
            tau = tau_ref[:]
            rho_k = rho0 * jnp.maximum(1.0, jnp.sqrt(tau))
            nxk2, _ = linearize(xk)

            # fresh inner state (solvers/ccp.py resets xs/us per outer);
            # warm_inner=True keeps the consensus duals across outer
            # iterations instead (the subproblem drifts slowly once tau is
            # large, so warm duals cut the inner trips needed)
            def _zero_us():
                zc = jnp.zeros((_CHUNK, Lr, n), f32)

                def zero_us(cb, _):
                    us_ref[pl.ds(cb * _CHUNK, _CHUNK)] = zc
                    return 0

                nfull_b = B // _CHUNK
                if nfull_b:
                    jax.lax.fori_loop(0, nfull_b, zero_us, 0)
                if B - nfull_b * _CHUNK:
                    us_ref[pl.ds(nfull_b * _CHUNK,
                                 B - nfull_b * _CHUNK)] = \
                        zc[:B - nfull_b * _CHUNK]

            if warm_inner:
                pl.when(it == 0)(_zero_us)
            else:
                _zero_us()
            z_ref[:] = xk
            zp_ref[:] = xk
            inner_loop(tau, rho_k, nxk2)
            z = z_ref[:]

            # stall / feasibility exit — viol evaluated at the NEW z via
            # next linearization's rotated copies is not available yet, so
            # evaluate directly (m matmuls; reused next outer via xkh)
            _, viol = linearize(z)
            dx = jnp.sqrt(jnp.sum((z - xk) ** 2, axis=-1, keepdims=True))
            nxk = jnp.sqrt(jnp.sum(xk * xk, axis=-1, keepdims=True))
            stalled = dx < stall_tol * (1.0 + nxk)
            feas = viol < viol_exit_tol
            finished = stalled & (feas | (tau >= 0.999 * tau_max))

            out_ref[:] = z
            tau_ref[:] = jnp.minimum(tau * mu, tau_max)
            # lockstep: all lanes must be finished simultaneously
            # (matching jax.vmap's OR-batched while cond)
            res_ref[:] = 1.0 - finished.astype(f32)

        return jnp.max(res_ref[:], axis=0)          # (1,) tile done flag

    res_ref[:] = jnp.ones((Lr, 1), f32)
    jax.lax.fori_loop(0, max_iter, outer, jnp.ones((1,), f32))


class CCPFusedData:
    """One-time per-form setup for the fused CCP kernel (host f64 eigh,
    shipped once as f32 — same pattern as ADMMFusedData).  Constraint rows
    are permuted eq-first so the negative-hinge bank maps to a static
    contiguous range."""

    def __init__(self, form):
        n, m = form.n, form.m
        P = np.asarray(form.P, np.float64)
        q = np.asarray(form.q, np.float64)
        r = np.asarray(form.r, np.float64)
        eq = np.asarray(form.is_eq)

        perm = np.concatenate([np.where(eq)[0], np.where(~eq)[0]])
        self.E = int(eq.sum())
        P = np.concatenate([P[:1], P[1 + perm]])
        q = np.concatenate([q[:1], q[1 + perm]])
        r = np.concatenate([r[:1], r[1 + perm]])
        eqp = np.concatenate([[False], eq[perm]])    # row 0 = objective

        lam, V = np.linalg.eigh(P)                   # (m+1, n), (m+1, n, n)
        shift = np.where(lam.min(axis=1) < 0.0, 1.0 - lam.min(axis=1), 0.0)
        lam1 = np.maximum(lam + shift[:, None], 0.0)
        qhat = np.einsum("kij,ki->kj", V, q)

        f32 = jnp.float32
        r2 = lambda a: jnp.asarray(a, f32)[:, None, :]    # (m+1, 1, n)
        s2 = lambda a: jnp.asarray(a, f32)[:, None, None]  # (m+1, 1, 1)
        self.m, self.n = m, n
        self.tensors = (
            jnp.asarray(V, f32),
            r2(lam), r2(lam1), r2(qhat), r2(q),
            s2(shift), s2(r), s2(eqp.astype(np.float64)),
        )
        from ..core import QCQPForm
        self.form32 = QCQPForm(form.P.astype(f32), form.q.astype(f32),
                               form.r.astype(f32), form.is_eq)


_CCP_VMEM_BUDGET = 14 * 2**20


def ccp_fused_fits(n: int, m: int, E: int) -> bool:
    """VMEM estimate for the whole-improve kernel at (n, m, E)."""
    npad = -(-n // 128) * 128
    B = 1 + m + E
    banks = 2 * B * L_TILE * npad * 4               # xs, us
    banks += (m + 1) * L_TILE * npad * 4            # xkh cache
    banks += E * L_TILE * npad * 4                  # qm
    consts = (m + 1) * npad * npad * 4              # V
    consts += 4 * (m + 1) * npad * 4                # lam0/lam1/qhat/qnat
    temps = 10 * L_TILE * npad * 4                  # prox/chunk live values
    return n <= 512 and banks + consts + temps < _CCP_VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=(
    "m", "E", "tau0", "mu", "tau_max", "max_iter", "inner_iters", "rho0",
    "stall_tol", "inner_tol", "viol_exit_tol", "warm_inner", "n_newton",
    "interpret"))
def _ccp_improve(tensors, form32, xs_p, *, m, E, tau0, mu, tau_max,
                 max_iter, inner_iters, rho0, stall_tol, inner_tol,
                 viol_exit_tol, warm_inner, n_newton, interpret):
    from ..core import better
    R, n = xs_p.shape
    grid = R // L_TILE
    in_specs = [pl.BlockSpec(a.shape, lambda i: (0, 0, 0)) for a in tensors]
    tile = pl.BlockSpec((L_TILE, n), lambda i: (i, 0))
    B = 1 + m + E
    scratch = [
        pltpu.VMEM((B, L_TILE, n), jnp.float32),     # xs
        pltpu.VMEM((B, L_TILE, n), jnp.float32),     # us
        pltpu.VMEM((m + 1, L_TILE, n), jnp.float32),  # xkh
        pltpu.VMEM((max(E, 1), L_TILE, n), jnp.float32),  # qm
        pltpu.VMEM((max(E, 1), L_TILE, 1), jnp.float32),  # rm
        pltpu.VMEM((L_TILE, n), jnp.float32),        # z
        pltpu.VMEM((L_TILE, n), jnp.float32),        # z_prev
        pltpu.VMEM((L_TILE, 1), jnp.float32),        # tau
        pltpu.VMEM((L_TILE, 1), jnp.float32),        # res / done
    ]
    kern = functools.partial(
        _ccp_kernel, m=m, E=E, n=n, tau0=tau0, mu=mu, tau_max=tau_max,
        max_iter=max_iter, inner_iters=inner_iters, rho0=rho0,
        stall_tol=stall_tol, inner_tol=inner_tol,
        viol_exit_tol=viol_exit_tol, warm_inner=warm_inner,
        n_newton=n_newton)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=in_specs + [tile],
            out_specs=tile,
            out_shape=jax.ShapeDtypeStruct((R, n), jnp.float32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*tensors, xs_p.astype(jnp.float32))
    # reference folds the DCCP result through `better` (qcqp.py:318-319)
    fold = jax.vmap(lambda a, b: better(form32, a, b))
    return fold(xs_p, out)


def improve_ccp_fused(form, xs, tau=0.005, mu=1.4, tau_max=1e8,
                      max_iter=60, inner_iters=None, rho=1.0,
                      stall_tol=1e-6, inner_tol=1e-5, viol_exit_tol=1e-4,
                      warm_inner=True, n_newton=5,
                      data: CCPFusedData = None, interpret=False):
    """Batched whole-improve penalty CCP via the Pallas mega-kernel
    (replaces reference DCCP, qcqp/qcqp.py:288-322; pointwise mirror of
    solvers/ccp.py:improve_ccp at f32 when called with warm_inner=False,
    n_newton=15 and matching knobs).

    Default deviations from the vmapped path, justified by measurement on
    v5e (BASELINE.md rounds 4-5): inner_iters defaults to 10 (not 200),
    inner_tol to 1e-5, the consensus duals warm-start across outer
    iterations (warm_inner=True) instead of resetting, and the hinge prox
    runs 5 Newton trips (not 15 — see the _N_NEWTON note: the softer
    inexact prox is faster AND better on median violation, and 5 is the
    smallest trip count that clears the equality-instance feasibility
    cliff).  At the bench shape the inner residual exit essentially never
    fires under tile lockstep (time scales linearly with the cap);
    measured round 5: 1042 restarts/s at median violation 0.56 (vs round
    4's 502 / 1.65 and the vmapped path's 26.8 / 17.3).

    xs (R, n); R padded internally to a multiple of L_TILE.  Shapes whose
    working set exceeds VMEM route to the vmapped XLA improve."""
    R, n = xs.shape
    if inner_iters is None:
        inner_iters = 10 if warm_inner else 20
    if data is None:
        data = CCPFusedData(form)
    if not ccp_fused_fits(n, form.m, data.E):
        from ..solvers.ccp import improve_ccp
        fn = jax.vmap(lambda x: improve_ccp(
            form, x, tau=tau, mu=mu, tau_max=tau_max, max_iter=max_iter,
            inner_iters=inner_iters, rho=rho))
        return fn(jnp.asarray(xs, form.dtype))
    R_pad = -(-R // L_TILE) * L_TILE
    xs_p = jnp.pad(jnp.asarray(xs, jnp.float32), ((0, R_pad - R), (0, 0)))
    out = _ccp_improve(
        data.tensors, data.form32, xs_p, m=int(form.m), E=int(data.E),
        tau0=float(tau), mu=float(mu), tau_max=float(tau_max),
        max_iter=int(max_iter), inner_iters=int(inner_iters),
        rho0=float(rho), stall_tol=float(stall_tol),
        inner_tol=float(inner_tol), viol_exit_tol=float(viol_exit_tol),
        warm_inner=bool(warm_inner), n_newton=int(n_newton),
        interpret=bool(interpret))
    return out[:R]
