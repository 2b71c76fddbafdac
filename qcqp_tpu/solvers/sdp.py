"""First-order semidefinite-relaxation solver, fully in JAX.

The reference hands its lifted SDPs to external conic solvers through CVXPY
(reference: qcqp/qcqp.py:64,92 — ECOS/SCS/MOSEK C code is where the whole SDR
hot loop lives).  This module replaces that native dependency with an
operator-splitting (ADMM / Douglas-Rachford) solver that is a single jitted
fixed-point loop on device:

    minimize    <W0, X>
    subject to  <Wi, X> <= / == 0   (i = 1..m)
                <E_nn, X> == 1
                X psd

Splitting: (affine + linear objective)-block prox, solved by a KKT projection
whose Gram matrix K = A A^T + D is formed once as a dense matmul and
pseudo-inverted once by eigh (duplicate/dependent constraint rows are fine);
cone-block prox = batched eigendecomposition -> eigenvalue clamp ->
reconstruct (the PSD projection) plus a ReLU on inequality slacks.  Both
blocks are MXU-shaped dense linear algebra; the per-iteration eigh of the
(n+1)x(n+1) iterate is the dominant kernel.

Extras over a textbook ADMM: over-relaxation (alpha = 1.6) and residual-
balancing adaptive rho (no refactorization needed — K is rho-independent),
and Frobenius normalization of the constraint rows for conditioning.

The reported bound is the converged objective value; at the default
tolerances it matches interior-point answers to ~1e-6 relative on the
reference's example set (validated in tests/test_sdp.py against analytic
solutions and a scipy SLSQP oracle).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import QCQPForm, homogeneous_forms


class SDPData(NamedTuple):
    """Preprocessed SDP: stacked constraint matrices and KKT pseudo-inverse."""
    W0: jax.Array      # (N, N) objective (normalized)
    obj_scale: jax.Array
    Wf: jax.Array      # (k, N*N) flattened constraint rows (normalized)
    b: jax.Array       # (k,)
    d: jax.Array       # (k,) 1.0 where the row has an inequality slack
    Kinv: jax.Array    # (k, k) pseudo-inverse of A A^T + D
    AW0: jax.Array     # (k,) A(W0)


# All solver matmuls pin precision=HIGHEST: the TPU's default single-pass
# bf16 matmul floors the splitting residuals at ~1e-2 on f32 data (same
# lesson as the CD/ADMM kernels; verified on the n=100 boolean-LS SDR —
# residuals stall at 0.4 with default precision, converge with HIGHEST).
_HP = jax.lax.Precision.HIGHEST


def _sym(M):
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def build_sdp(W0, Ws, b, is_ineq) -> SDPData:
    """Assemble and precondition the SDP data (one-time, host or device)."""
    N = W0.shape[0]
    k = Ws.shape[0]
    Wf = Ws.reshape(k, N * N)
    row_norms = jnp.linalg.norm(Wf, axis=1)
    scale = jnp.where(row_norms > 1e-12, row_norms, 1.0)
    Wf = Wf / scale[:, None]
    b = b / scale
    obj_scale = jnp.maximum(jnp.linalg.norm(W0), 1e-12)
    W0n = W0 / obj_scale
    d = is_ineq.astype(W0.dtype)
    G = jnp.dot(Wf, Wf.T, precision=_HP)
    K = G + jnp.diag(d)
    lam, V = jnp.linalg.eigh(K)
    lam_inv = jnp.where(lam > 1e-10 * jnp.max(lam), 1.0 / lam, 0.0)
    Kinv = jnp.dot(V * lam_inv, V.T, precision=_HP)
    AW0 = jnp.dot(Wf, W0n.reshape(-1), precision=_HP)
    return SDPData(W0n, obj_scale, Wf, b, d, Kinv, AW0)


def _affine_prox(data: SDPData, Xt, st, rho):
    """argmin <W0,X> + rho/2 (||X-Xt||^2 + ||s-st||^2)  s.t. A(X) + d*s = b."""
    N = data.W0.shape[0]
    rhs = rho * (jnp.dot(data.Wf, Xt.reshape(-1), precision=_HP)
                 + data.d * st - data.b) - data.AW0
    lam = jnp.dot(data.Kinv, rhs, precision=_HP)
    X = Xt - (data.W0
              + jnp.dot(lam, data.Wf, precision=_HP).reshape(N, N)) / rho
    s = st - data.d * lam / rho
    return _sym(X), s


def _cone_proj(X, s):
    lam, Q = jnp.linalg.eigh(_sym(X))
    Xp = jnp.dot(Q * jnp.maximum(lam, 0.0), Q.T, precision=_HP)
    return _sym(Xp), jnp.maximum(s, 0.0)


def _cone_proj_warm(X, s, V, sweeps=2):
    """PSD projection via warm-started Jacobi: rotate into the previous
    eigenbasis (nearly diagonal across consecutive splitting iterates), then
    a couple of matmul-only Jacobi sweeps.  Replaces the sequential eigh that
    dominates on-device SDP iterations (~30ms per 101x101 eigh on v5e)."""
    from ..kernels.eigh_pallas import jacobi_sweeps
    hp = jax.lax.Precision.HIGHEST
    B = jnp.dot(V.T, jnp.dot(_sym(X), V, precision=hp), precision=hp)
    lam, W = jacobi_sweeps(B, sweeps=sweeps)
    Vn = jnp.dot(V, W, precision=hp)
    Xp = jnp.dot(Vn * jnp.maximum(lam, 0.0), Vn.T, precision=hp)
    return _sym(Xp), jnp.maximum(s, 0.0), Vn


def _cone_proj_vec(X, s, V, sweeps=2):
    """PSD projection via the warm-started *vectorized* Jacobi Pallas kernel
    (kernels/eigh_pallas.eigh_jacobi_vec): same warm-rotation scheme as
    _cone_proj_warm, but the sweep rounds run as masked roll/select VPU work
    inside ONE pallas_call instead of 2 (n-1) sweeps of sequential small
    matmuls — the single-instance on-device path (VERDICT r2 item 3)."""
    from ..kernels.eigh_pallas import eigh_jacobi_vec
    hp = jax.lax.Precision.HIGHEST
    B = jnp.dot(V.T, jnp.dot(_sym(X), V, precision=hp), precision=hp)
    lam, W = eigh_jacobi_vec(B[None], sweeps=sweeps)
    lam, W = lam[0], W[0]
    Vn = jnp.dot(V, W, precision=hp)
    Xp = jnp.dot(Vn * jnp.maximum(lam, 0.0), Vn.T, precision=hp)
    return _sym(Xp), jnp.maximum(s, 0.0), Vn


class SDPState(NamedTuple):
    """Full splitting-iteration state — pass back as `init` to warm-start a
    related instance (parameterized problem families, serving loops).  The
    reference can only re-solve from scratch through CVXPY."""
    Y: jax.Array       # cone-block primal (N, N)
    t: jax.Array       # slack block (k,)
    U: jax.Array       # scaled dual (N, N)
    v: jax.Array       # slack dual (k,)
    V: jax.Array       # running eigenbasis (for psd_method="warm")
    rho: jax.Array


# status_code values (SDPSolution.status_code)
STATUS_OK = 0           # converged or iteration-limited (see residuals)
STATUS_INFEASIBLE = 1   # primal infeasibility certificate found
STATUS_UNBOUNDED = 2    # dual infeasibility (unbounded relaxation) cert found


class SDPSolution(NamedTuple):
    X: jax.Array
    objective: jax.Array
    iterations: jax.Array
    primal_res: jax.Array
    dual_res: jax.Array
    state: SDPState = None
    status_code: jax.Array = None   # one of STATUS_* (None for old callers)


def _power_maxeig(M, iters: int = 30):
    """Largest eigenvalue of symmetric M by shifted power iteration —
    matmul-only (no eigh), so the certificate checks run on the device path
    too.  M + cI with c = ||M||_F is PSD and shares eigenvectors with M."""
    N = M.shape[0]
    c = jnp.sqrt(jnp.sum(M * M)) + 1e-30
    Ms = M + c * jnp.eye(N, M.dtype)
    v0 = jnp.full((N,), 1.0 / jnp.sqrt(N), M.dtype)

    def body(_, v):
        w = jnp.dot(Ms, v, precision=_HP)
        return w / (jnp.linalg.norm(w) + 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v0)
    return jnp.dot(v, jnp.dot(Ms, v, precision=_HP)) - c


@partial(jax.jit, static_argnames=("max_iters", "psd_method", "warm_sweeps"))
def solve_sdp(data: SDPData, max_iters: int = 20000, tol: float = 1e-8,
              rho0: float = 1.0, alpha: float = 1.6, psd_method: str = "eigh",
              warm_sweeps: int = 2, init: SDPState = None):
    """Run the splitting loop until residuals drop below tol.

    psd_method:
      "eigh" — exact eigendecomposition per iteration (default; host/f64)
      "warm" — warm-started Jacobi sweeps in the running eigenbasis
               (matmul-only; the batched on-device path, see _cone_proj_warm)
      "vec"  — warm-started vectorized-Jacobi Pallas kernel (single
               pallas_call per projection; the single-instance on-device
               path, see _cone_proj_vec)
    init: a previous SDPSolution.state to warm-start from (same shapes).
    """
    N = data.W0.shape[0]
    k = data.b.shape[0]
    dt = data.W0.dtype

    if init is not None:
        Y0, t0, U0, v0, V0 = init.Y, init.t, init.U, init.v, init.V
        rho0 = init.rho
    else:
        Y0 = jnp.eye(N, dtype=dt)
        t0 = jnp.zeros(k, dt)
        U0 = jnp.zeros((N, N), dt)
        v0 = jnp.zeros(k, dt)
        V0 = jnp.eye(N, dtype=dt)

    def cond(carry):
        Y, t, U, v, V, rho, it, rp, rd = carry
        return (it < max_iters) & ((rp > tol) | (rd > tol))

    def body(carry):
        Y, t, U, v, V, rho, it, rp, rd = carry
        X1, s1 = _affine_prox(data, Y - U, t - v, rho)
        # over-relaxation
        Xr = alpha * X1 + (1 - alpha) * Y
        sr = alpha * s1 + (1 - alpha) * t
        if psd_method == "warm":
            Yn, tn, V = _cone_proj_warm(Xr + U, sr + v, V, warm_sweeps)
        elif psd_method == "vec":
            Yn, tn, V = _cone_proj_vec(Xr + U, sr + v, V, warm_sweeps)
        else:
            Yn, tn = _cone_proj(Xr + U, sr + v)
        Un = U + Xr - Yn
        vn = v + sr - tn

        rp = jnp.sqrt(jnp.sum((X1 - Yn) ** 2) + jnp.sum((s1 - tn) ** 2))
        rd = rho * jnp.sqrt(jnp.sum((Yn - Y) ** 2) + jnp.sum((tn - t) ** 2))

        # Residual balancing every 50 iterations (K is rho-independent, so
        # changing rho costs nothing but a dual rescale).  OSQP-style smooth
        # factor sqrt(rp/rd) clipped to [1/5, 5]; the coarse 2x/0.5x step
        # this replaces left a persistent imbalance that stalled the tail at
        # ~1e-6 residuals (ROADMAP item 4).
        do_adapt = (it % 50 == 49) & (rp > 0.0) & (rd > 0.0) & \
            jnp.isfinite(rp) & jnp.isfinite(rd)
        ratio = jnp.sqrt(jnp.maximum(rp, 1e-300) / jnp.maximum(rd, 1e-300))
        factor = jnp.where(do_adapt & ((ratio > 1.2) | (ratio < 1.0 / 1.2)),
                           jnp.clip(ratio, 0.2, 5.0), 1.0)
        rho_n = rho * factor
        Un = Un / factor
        vn = vn / factor
        return Yn, tn, Un, vn, V, rho_n, it + 1, rp, rd

    big = jnp.asarray(jnp.inf, dt)
    carry = (Y0, t0, U0, v0, V0, jnp.asarray(rho0, dt), jnp.asarray(0),
             big, big)
    Y, t, U, v, V, rho, it, rp, rd = jax.lax.while_loop(cond, body, carry)
    obj = jnp.sum(data.W0 * Y) * data.obj_scale
    return SDPSolution(Y, obj, it, rp, rd, SDPState(Y, t, U, v, V, rho))


# ---------------------------------------------------------------------------
# QCQP-facing entry points (the reference's solve_sdr / solve_spectral)
# ---------------------------------------------------------------------------

def _sdr_data(form: QCQPForm) -> SDPData:
    M = homogeneous_forms(form)        # (m+1, N, N)
    W0, Wc = M[0], M[1:]
    N = W0.shape[0]
    E = jnp.zeros((1, N, N), form.dtype).at[0, N - 1, N - 1].set(1.0)
    Ws = jnp.concatenate([Wc, E], axis=0)
    b = jnp.concatenate([jnp.zeros(form.m, form.dtype),
                         jnp.ones(1, form.dtype)])
    is_ineq = jnp.concatenate([~form.is_eq, jnp.zeros(1, bool)])
    return build_sdp(W0, Ws, b, is_ineq)


# Inaccurate-status gate shared between check_status and _solve_single's
# device-first acceptance test (ADVICE r3: a hardcoded duplicate let the
# fallback decision and the status gate diverge if inacc_tol was overridden).
_INACC_TOL = 1e-4


def check_status(sol: SDPSolution, tol: float, inacc_tol: float = _INACC_TOL):
    """Reference-parity status gate (qcqp/qcqp.py:66-67,94-95): OPTIMAL /
    OPTIMAL_INACCURATE pass (the latter with a warning); anything else raises.
    """
    import logging
    rp, rd = float(sol.primal_res), float(sol.dual_res)
    if rp <= tol and rd <= tol:
        return "optimal"
    if rp <= inacc_tol and rd <= inacc_tol:
        logging.getLogger("qcqp_tpu").warning(
            "SDP solved inaccurately (residuals %.2e / %.2e)", rp, rd)
        return "optimal_inaccurate"
    raise RuntimeError(
        f"Relaxation problem status: not converged "
        f"(primal {rp:.2e}, dual {rd:.2e} after {int(sol.iterations)} iters)")


# f32 splitting iterations bottom out near this residual; asking for less
# just spins the loop to max_iters (the f64 default tol stays 1e-8).
_F32_TOL_FLOOR = 3e-5


def _relaxation_device(device):
    """Placement policy for single-instance relaxations.

    float64 forms (the CPU/parity default) route to the host CPU backend:
    the TPU has no native f64 and a single splitting loop has no batch axis.
    float32 forms on an accelerator used to route to the host too (an
    on-chip 101x101 XLA eigh costs ~30ms vs ~1ms host LAPACK), but with the
    warm-started vectorized-Jacobi cone projection (psd_method="vec") the
    whole loop stays on-chip at ~zero eigh latency, so f32 single instances
    now run where the data lives.  device="host" / "device" force either
    placement; a concrete jax.Device is honored as-is.
    """
    if device == "device":
        return None
    if device in ("auto", "host"):
        if jax.default_backend() != "cpu":
            try:
                return jax.devices("cpu")[0]
            except RuntimeError:
                return None
        return None
    return device


def _solve_single(data_fn, form: QCQPForm, max_iters, tol, device,
                  init: SDPState = None):
    """Returns (sol, eff_tol): eff_tol is the dtype-achievable tolerance the
    status gate should be checked against.

    Placement: f32 forms on an accelerator solve on-device first
    (vectorized-Jacobi cone projection, ~6x faster per iteration than the
    host route); the f32-achievable residual floor is instance-dependent
    (3e-5 on the n=100 boolean-LS SDR, ~1.5e-4 on the n=25 maxcut SDR), so
    if the device result is worse than the inaccurate-status gate the solve
    transparently falls back to host f64.  device="device"/"host" force
    either placement with no fallback.
    """
    if (device == "auto" and form.dtype == jnp.float32
            and jax.default_backend() != "cpu" and form.n + 1 <= 256):
        sol, eff = _solve_single(data_fn, form, max_iters, tol, "device",
                                 init=init)
        rp, rd = float(sol.primal_res), float(sol.dual_res)
        if rp <= _INACC_TOL and rd <= _INACC_TOL:
            return sol, eff
        import logging
        logging.getLogger("qcqp_tpu").debug(
            "on-device f32 SDP attempt discarded (residuals %.2e / %.2e "
            "miss the %.0e gate); re-solving on host f64", rp, rd, _INACC_TOL)
        return _solve_single(data_fn, form, max_iters, tol, "host",
                             init=init)
    dev = _relaxation_device(device)
    if dev is not None:
        form64 = jax.device_put(form.astype(jnp.float64), dev)
        if init is not None:
            init = jax.device_put(
                jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), init), dev)
        with jax.default_device(dev):
            sol = solve_sdp(data_fn(form64), max_iters=max_iters, tol=tol,
                            init=init)
        return SDPSolution(sol.X.astype(form.dtype), sol.objective,
                           sol.iterations, sol.primal_res, sol.dual_res,
                           sol.state), tol
    psd = "eigh"
    if form.dtype == jnp.float32:
        tol = max(tol, _F32_TOL_FLOOR)
        if jax.default_backend() != "cpu" and form.n + 1 <= 256:
            psd = "vec"
    sol = solve_sdp(data_fn(form), max_iters=max_iters, tol=tol,
                    psd_method=psd, init=init)
    return sol, tol


def solve_sdr(form: QCQPForm, max_iters: int = 20000, tol: float = 1e-8,
              check: bool = True, device="auto", warm: SDPState = None,
              full: bool = False, **_ignored):
    """Full Shor relaxation (reference: qcqp/qcqp.py:72-97).

    Returns (X, bound) with X the (n+1)x(n+1) PSD lifted solution.
    warm: a previous solution's `.state` for a *related* instance (same
    shapes) — parameterized problem families re-solve in a fraction of the
    cold iteration count.  full=True returns the SDPSolution (with `.state`)
    instead of the (X, bound) pair.
    """
    sol, eff_tol = _solve_single(_sdr_data, form, max_iters, tol, device,
                                 init=warm)
    if check:
        check_status(sol, eff_tol)
    if full:
        return sol
    return sol.X, sol.objective


def solve_sdr_batch(stacked: QCQPForm, max_iters: int = 5000,
                    tol: float = 1e-6, psd_method: str = "auto",
                    warm: SDPState = None, return_state: bool = False):
    """Scenario-batched SDR: vmapped splitting solver over stacked instances.

    This is the accelerator-resident path.  psd_method "auto" picks the
    warm-started Jacobi cone projection for float32 (device) data — under
    vmap its rotation rounds become batched MXU matmuls, measured >100x
    faster than the vmapped eigh on a v5e chip *and* more accurate (XLA's
    f32 TPU eigh stalls near 1e-2 residuals; warm reaches ~5e-5) — and the
    exact eigh for float64 (host) data.

    warm: batched SDPState from a previous call (serving loops over
    slowly-drifting instance banks re-solve warm).  return_state=True appends
    the batched final states to the return tuple.
    Returns (X (S, n+1, n+1), bounds (S,), primal_res (S,), dual_res (S,)
    [, states]).
    """
    if psd_method == "auto":
        psd_method = "warm" if stacked.dtype == jnp.float32 else "eigh"

    def one(P, q, r, is_eq, init):
        form = QCQPForm(P, q, r, is_eq)
        sol = solve_sdp(_sdr_data(form), max_iters=max_iters, tol=tol,
                        psd_method=psd_method, init=init)
        return sol.X, sol.objective, sol.primal_res, sol.dual_res, sol.state

    fn = jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0,
                                        None if warm is None else 0)))
    X, obj, rp, rd, states = fn(stacked.P, stacked.q, stacked.r,
                                stacked.is_eq, warm)
    if return_state:
        return X, obj, rp, rd, states
    return X, obj, rp, rd


def _spectral_data(form: QCQPForm) -> SDPData:
    M = homogeneous_forms(form)
    W0 = M[0]
    N = W0.shape[0]
    ineq_mask = (~form.is_eq).astype(form.dtype)
    eq_mask = form.is_eq.astype(form.dtype)
    W1 = jnp.einsum("i,ijk->jk", ineq_mask, M[1:])
    W2 = jnp.einsum("i,ijk->jk", eq_mask, M[1:])
    E = jnp.zeros((N, N), form.dtype).at[N - 1, N - 1].set(1.0)
    Ws = jnp.stack([W1, W2, E])
    b = jnp.asarray([0.0, 0.0, 1.0], form.dtype)
    is_ineq = jnp.asarray([True, False, False])
    return build_sdp(W0, Ws, b, is_ineq)


def solve_spectral(form: QCQPForm, max_iters: int = 20000, tol: float = 1e-8,
                   check: bool = True, device="auto",
                   **_ignored) -> Tuple[jax.Array, jax.Array]:
    """Spectral (aggregated) relaxation (reference: qcqp/qcqp.py:41-70):
    all '<=' rows summed into one constraint, all '==' rows into another,
    then the lifted SDP is solved and x recovered from the top eigenpair.
    """
    sol, eff_tol = _solve_single(_spectral_data, form, max_iters, tol, device)
    if check:
        check_status(sol, eff_tol)
    lam, V = jnp.linalg.eigh(sol.X)   # X symmetric: eigh == reference's eig
    x = jnp.sqrt(jnp.maximum(lam[-1], 0.0)) * V[:-1, -1]
    return x, sol.objective
