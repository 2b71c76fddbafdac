"""Independent brute-force oracles for kernel tests.

Deliberately structured nothing like either the library or the reference:
dense grid search + refinement, plus generic numerical optimizers.  These are
slow and only run on tiny instances, but they are *independent* evidence —
the role the reference fills with MOSEK SDP solves
(reference: examples/tests/one_constraint_qcqp.py).
"""

from __future__ import annotations

import numpy as np


def onevar_violation(p, q, r, is_eq, x):
    v = p * x * x + q * x + r
    return np.abs(v) if is_eq else np.maximum(v, 0.0)


def grid_onevar_min(p0, q0, r0, cons, s, lo=-50.0, hi=50.0, num=200001):
    """Brute-force min of the 1-D objective over the slack-s feasible set.

    cons: list of (p, q, r, is_eq).  Returns (xstar, fstar) or (None, None).
    NOTE: only sees [lo, hi]; callers must pick instances whose solution is
    interior to that window.
    """
    xs = np.linspace(lo, hi, num)
    feas = np.ones_like(xs, dtype=bool)
    for (p, q, r, is_eq) in cons:
        feas &= onevar_violation(p, q, r, is_eq, xs) <= s + 1e-12
    if not feas.any():
        return None, None
    vals = p0 * xs * xs + q0 * xs + r0
    vals = np.where(feas, vals, np.inf)
    i = int(np.argmin(vals))
    return xs[i], vals[i]


def project_onecons_oracle(z, P, q, r, is_eq):
    """Brute-force projection onto {x : x'Px + q'x + r (relop) 0} via dense
    penalty continuation with scipy, double-checked by feasibility."""
    import scipy.optimize as sopt

    z = np.asarray(z, float)

    def f(x):
        return float(x @ P @ x + q @ x + r)

    if (not is_eq) and f(z) <= 0:
        return z

    # Otherwise the projection is boundary-active (complementary slackness),
    # so solve the equality-constrained problem in both cases.
    cons = {"type": "eq", "fun": f}
    best, bestd = None, np.inf
    rng = np.random.default_rng(0)
    for trial in range(12):
        x0 = z + (0 if trial == 0 else 0.3 * rng.standard_normal(z.shape))
        res = sopt.minimize(
            lambda x: float(np.sum((x - z) ** 2)),
            x0,
            jac=lambda x: 2.0 * (x - z),
            constraints=[cons],
            method="SLSQP",
            options={"maxiter": 500, "ftol": 1e-14},
        )
        if res.success and abs(f(res.x)) < 1e-7:
            d = float(np.sum((res.x - z) ** 2))
            if d < bestd:
                best, bestd = res.x, d
    return best


def solve_sdp_oracle(C, As, bs, eqs, maxiter=200):
    """Small dense SDP oracle:  min <C,X> s.t. <A_i,X> (relop_i) b_i, X psd.

    Projected-subgradient-free approach: uses scipy SLSQP over a Cholesky-like
    parametrization is unreliable; instead uses cvxpy-free log-det barrier
    Newton on the dual is overkill.  We use scipy's trust-constr on the
    matrix entries with an eigenvalue constraint — adequate for n <= 12 tests.
    """
    import scipy.optimize as sopt

    n = C.shape[0]
    tri = np.triu_indices(n)

    def unpack(v):
        X = np.zeros((n, n))
        X[tri] = v
        X = X + X.T - np.diag(np.diag(X))
        return X

    def pack(X):
        return X[tri]

    def obj(v):
        return float(np.sum(C * unpack(v)))

    cons = []
    for A, b, eq in zip(As, bs, eqs):
        fun = (lambda A, b: lambda v: float(np.sum(A * unpack(v))) - b)(A, b)
        cons.append({"type": "eq" if eq else "ineq",
                     # scipy ineq convention: fun >= 0  (we need <A,X> <= b)
                     "fun": (fun if eq else (lambda f: lambda v: -f(v))(fun))})
    cons.append({"type": "ineq",
                 "fun": lambda v: float(np.linalg.eigvalsh(unpack(v))[0])})

    X0 = np.eye(n)
    res = sopt.minimize(obj, pack(X0), constraints=cons, method="SLSQP",
                        options={"maxiter": maxiter, "ftol": 1e-12})
    return unpack(res.x), float(res.fun), res.success
