#!/usr/bin/env python
"""On-TPU golden-value smoke gate (VERDICT r3 weak #4: the f32 on-device
golden assertions used to be manual bench runs — an f32/Mosaic regression
would ship silently).

Runs standalone on the chip (`python tests/tpu_smoke.py`) and is invoked by
bench.py each round, which records `tpu_smoke_ok` in the bench JSON extras.
Asserts, in f32 on the device:

  * SDR bounds on-device: boolean-LS 28.750 +- 2e-2 and maxcut 57.207
    +- 5e-2, both ACCEPTED by the residual gate (no host fallback);
  * fused-CD end-to-end: best of 256 restarts on boolean-LS reaches the
    brute-force optimum 35.551 +- 2e-2 at violation < 1e-2;
  * fused-ADMM quality bucket: improves a seeded start batch on the
    boolean-LS form to violation < 1e-2;
  * fused-CCP quality bucket: >= 90% of a seeded restart batch lands
    feasible with best objective within 1.35x of the optimum.

NOT a pytest file (pytest runs CPU-only via conftest); plain functions +
a main that prints one JSON line.
"""

import json
import sys
import time

import numpy as np


def _boolean_ls_form(jnp, QCQPForm, n=10, m=15):
    np.random.seed(1)
    A = np.random.randn(m, n)
    b = np.random.randn(m, 1).ravel()
    P = np.zeros((n + 1, n, n))
    P[0] = A.T @ A
    for i in range(n):
        P[1 + i, i, i] = 1.0
    q = np.zeros((n + 1, n))
    q[0] = -2.0 * A.T @ b
    r = np.zeros(n + 1)
    r[0] = float(b @ b)
    r[1:] = -1.0
    dt = jnp.float32
    form = QCQPForm(jnp.asarray(P, dt), jnp.asarray(q, dt),
                    jnp.asarray(r, dt), jnp.asarray(np.ones(n, bool)))
    # brute-force optimum over sign vectors
    best = np.inf
    for bits in range(1 << n):
        s = np.array([1.0 if bits >> i & 1 else -1.0 for i in range(n)])
        best = min(best, float(np.sum((A @ s - b) ** 2)))
    return form, best


def _circle_form(jnp, QCQPForm):
    """Circle-packing SDR form via the modeling layer (the inequality-heavy
    golden whose f32 residual floor used to force a host fallback)."""
    import qcqp_tpu as qt
    from qcqp_tpu.expressions import canonicalize
    nC, B = 5, 10.0
    X = qt.Variable(2, nC)
    r = qt.Variable()
    cons = [X >= r, X <= B - r, r >= 0]
    for i in range(nC):
        for j in range(i + 1, nC):
            cons.append(qt.square(2 * r) <= qt.sum_squares(X[:, i] - X[:, j]))
    prob = qt.Problem(qt.Maximize(r), cons)
    return canonicalize(prob, np.float32)[0]


def _maxcut_form(jnp, QCQPForm, n=25, p=0.2):
    np.random.seed(1)
    W = np.random.uniform(0, 1, (n, n))
    for i in range(n):
        W[i, i] = 1
        for j in range(i + 1, n):
            W[j, i] = W[i, j]
    W = (W < p).astype(float)
    P = np.zeros((n + 1, n, n))
    P[0] = 0.25 * W                      # minimize form (maximize negated)
    q = np.zeros((n + 1, n))
    r = np.zeros(n + 1)
    r[0] = -0.25 * W.sum()
    for i in range(n):
        P[1 + i, i, i] = 1.0
    r[1:] = -1.0
    dt = jnp.float32
    return QCQPForm(jnp.asarray(P, dt), jnp.asarray(q, dt),
                    jnp.asarray(r, dt), jnp.asarray(np.ones(n, bool)))


def run_smoke():
    """Returns (ok: bool, details: dict).  Raises nothing — failures are
    captured as strings so the bench JSON always carries the verdict."""
    import jax
    import jax.numpy as jnp
    from qcqp_tpu.core import QCQPForm, max_violation, eval_objective
    from qcqp_tpu.solvers.sdp import solve_sdr

    details = {}
    failures = []

    def check(name, cond, info):
        details[name] = info
        if not cond:
            failures.append(name)

    bls, brute = _boolean_ls_form(jnp, QCQPForm)
    mc = _maxcut_form(jnp, QCQPForm)

    # --- SDR bounds on-device, accepted by the residual gate (all four
    # golden relaxations run on-chip with zero host fallbacks, round 4).
    # Round 5: the Newton-Schulz cone projection solves ALL rows at
    # default knobs — the circle instance no longer needs the deeper-
    # projection retry its warm-Jacobi f32 floor used to force. ---
    circle = _circle_form(jnp, QCQPForm)
    for name, form, golden, tol, skw in (
            ("sdr_boolean_ls", bls, 28.750, 2e-2, None),
            ("sdr_maxcut", mc, -57.207, 5e-2, None),
            ("sdr_circle", circle, -5.000, 5e-2, None)):
        try:
            sol = solve_sdr(form, device="device", check=False, full=True,
                            solver_kwargs=skw)
            bound = float(sol.objective)
            rp, rd = float(sol.primal_res), float(sol.dual_res)
            accepted = rp <= 1e-4 and rd <= 1e-4
            check(name, accepted and abs(bound - golden) <= tol,
                  {"bound": round(bound, 4), "golden": golden,
                   "rp": float(f"{rp:.2e}"), "accepted": accepted})
        except Exception as e:  # noqa: BLE001 — verdict must always emit
            check(name, False, {"error": f"{type(e).__name__}: {e}"[:200]})

    # --- fused CD end-to-end: best of 256 restarts = global optimum ---
    try:
        from qcqp_tpu.parallel.restarts import solve_restarts
        x, f, v = solve_restarts(bls, 256, jax.random.PRNGKey(0),
                                 improve="coord-descent", num_iters=50)
        f, v = float(f), float(v)
        # a within-tolerance-infeasible f32 point can dip slightly BELOW
        # the exact-feasible optimum; bound the dip by 0.1
        check("cd_boolean_ls", v < 1e-2 and brute - 0.1 <= f <= brute + 2e-2,
              {"objective": round(f, 4), "brute_force": round(brute, 4),
               "violation": float(f"{v:.2e}")})
    except Exception as e:  # noqa: BLE001
        check("cd_boolean_ls", False,
              {"error": f"{type(e).__name__}: {e}"[:200]})

    # --- fused ADMM quality bucket ---
    try:
        from qcqp_tpu.kernels.admm_pallas import (ADMMFusedData,
                                                  improve_admm_fused)
        xs = jax.random.normal(jax.random.PRNGKey(1), (128, bls.n),
                               jnp.float32)
        data = ADMMFusedData(bls)
        out = improve_admm_fused(bls, xs, num_iters=300, data=data)
        vio = jax.vmap(lambda x: max_violation(bls, x))(out)
        bestv = float(jnp.min(vio))
        check("admm_boolean_ls", bestv < 1e-2,
              {"best_violation": float(f"{bestv:.2e}")})
    except Exception as e:  # noqa: BLE001
        check("admm_boolean_ls", False,
              {"error": f"{type(e).__name__}: {e}"[:200]})

    # --- fused CCP quality bucket ---
    try:
        from qcqp_tpu.kernels.ccp_pallas import (CCPFusedData,
                                                 improve_ccp_fused)
        xs = jax.random.normal(jax.random.PRNGKey(5), (64, bls.n),
                               jnp.float32)
        out = improve_ccp_fused(bls, xs, data=CCPFusedData(bls))
        vio = jax.vmap(lambda x: max_violation(bls, x))(out)
        obj = jax.vmap(lambda x: eval_objective(bls, x))(out)
        feas = np.asarray(vio) < 1e-2
        frac = float(feas.mean())
        bestf = float(np.min(np.where(feas, np.asarray(obj), np.inf)))
        check("ccp_boolean_ls", frac >= 0.9 and bestf <= 1.35 * brute,
              {"feasible_frac": round(frac, 3),
               "best_feasible_obj": round(bestf, 3),
               "brute_force": round(brute, 4)})
    except Exception as e:  # noqa: BLE001
        check("ccp_boolean_ls", False,
              {"error": f"{type(e).__name__}: {e}"[:200]})

    # --- infeasibility classifies BEFORE the device attempt (VERDICT r4
    # #5): an f32 contradictory-equality form must raise the distinct
    # error type in well under a second via the host-f64 Farkas
    # pre-check, not after ~12000 wasted device iterations ---
    try:
        import numpy as _np
        from qcqp_tpu.solvers.sdp import InfeasibleRelaxationError
        n = 3
        P = _np.zeros((3, n, n), _np.float32)
        q = _np.zeros((3, n), _np.float32)
        r = _np.zeros(3, _np.float32)
        q[1, 0] = 1.0
        q[2, 0] = 1.0
        r[2] = -1.0
        bad = QCQPForm(jnp.asarray(P), jnp.asarray(q), jnp.asarray(r),
                       jnp.asarray([True, True]))
        t0 = time.time()
        try:
            solve_sdr(bad, max_iters=20000)
            check("infeasible_precheck", False, {"error": "did not raise"})
        except InfeasibleRelaxationError:
            dt = time.time() - t0
            check("infeasible_precheck", dt < 1.0,
                  {"seconds": round(dt, 3)})
    except Exception as e:  # noqa: BLE001
        check("infeasible_precheck", False,
              {"error": f"{type(e).__name__}: {e}"[:200]})

    return not failures, {"checks": details, "failed": failures}


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    t0 = time.time()
    ok, details = run_smoke()
    details["seconds"] = round(time.time() - t0, 1)
    print(json.dumps({"tpu_smoke_ok": ok, **details}))
    sys.exit(0 if ok else 1)
