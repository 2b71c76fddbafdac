#!/usr/bin/env python
"""Headline benchmark: parallel-restart throughput of the CD improve path.

Workload: n=100, m=50 dense random QCQP (float32), RANDOM suggest + two-phase
coordinate descent capped at SWEEPS outer sweeps, R restarts in one jitted
batch, followed by the lexicographic best-point reduction.  Metric:
restarts/second/chip.

Baseline: the reference implementation is single-threaded Python+numpy
(SURVEY.md section 2c: no parallelism of any kind), so the comparison point is
a faithful reference-style scalar-loop coordinate descent on one restart of
the same workload, timed on this host's CPU and extrapolated.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "restarts/s", "vs_baseline": N}
"""

import json
import os
import time

import numpy as np

N = int(os.environ.get("BENCH_N", 100))
M = int(os.environ.get("BENCH_M", 50))
R = int(os.environ.get("BENCH_R", 10240))
SWEEPS = int(os.environ.get("BENCH_SWEEPS", 10))
SEED = 0


def make_problem():
    rng = np.random.default_rng(SEED)
    A = rng.standard_normal((M + 1, N, N)) / np.sqrt(N)
    P = 0.5 * (A + np.swapaxes(A, -1, -2))
    q = rng.standard_normal((M + 1, N)) / np.sqrt(N)
    r = rng.standard_normal(M + 1)
    is_eq = rng.random(M) < 0.5
    return P, q, r, is_eq


# ---------------------------------------------------------------------------
# Reference-style baseline: scalar Python loops, one restart (what the
# reference's pure-Python CD costs per chain; see qcqp/qcqp.py:101-192).
# ---------------------------------------------------------------------------

def _intervals_leq(p, q, c, tol=1e-4):
    """Solution set of p x^2 + q x + c <= 0 as a list of closed intervals."""
    if p > tol:
        D = q * q - 4 * p * c
        if D < 0:
            return []
        rD = D ** 0.5
        return [((-q - rD) / (2 * p), (-q + rD) / (2 * p))]
    if p < -tol:
        D = q * q - 4 * p * c
        if D < 0:
            return [(-np.inf, np.inf)]
        rD = D ** 0.5
        return [(-np.inf, (-q + rD) / (2 * p)), ((-q - rD) / (2 * p), np.inf)]
    if q > tol:
        return [(-np.inf, -c / q)]
    if q < -tol:
        return [(-c / q, np.inf)]
    return [(-np.inf, np.inf)]


def _feasible_pt(cons, s):
    """A point satisfying every (p,q,r,eq) within slack s, or None."""
    events = []
    lists = []
    for (p, q, r, eq) in cons:
        I = _intervals_leq(p, q, r - s)
        if eq:
            I2 = _intervals_leq(-p, -q, -r - s)
            I = [(max(a, c2), min(b, d2)) for a, b in I for c2, d2 in I2
                 if max(a, c2) <= min(b, d2)]
        if not I:
            return None
        lists.append(I)
    lo = max(min(a for a, _ in I) for I in lists)
    # candidate left endpoints
    cands = [a for I in lists for a, _ in I] + [0.0]
    for x in cands:
        ok = True
        for I in lists:
            if not any(a - 1e-12 <= x <= b + 1e-12 for a, b in I):
                ok = False
                break
        if ok:
            return x
    return None


def baseline_one_restart(P, q, r, is_eq, sweeps, viol_tol=1e-2, tol=1e-4):
    n = P.shape[-1]
    m = len(is_eq)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(n)
    for t in range(sweeps):
        viols = []
        for i in range(m):
            v = x @ P[1 + i] @ x + q[1 + i] @ x + r[1 + i]
            viols.append(abs(v) if is_eq[i] else max(0.0, v))
        if max(viols) < viol_tol:
            break
        for k in range(n):
            cons = []
            vmax = 0.0
            for i in range(1, m + 1):
                t2 = P[i][k, k]
                z = x.copy(); z[k] = 0.0
                t1 = 2 * (P[i][k] @ z) + q[i][k]
                t0 = z @ P[i] @ z + q[i] @ z + r[i]
                if t2 == 0 and t1 == 0:
                    continue
                val = t2 * x[k] ** 2 + t1 * x[k] + t0
                viol = abs(val) if is_eq[i - 1] else max(0.0, val)
                vmax = max(vmax, viol)
                cons.append((t2, t1, t0, bool(is_eq[i - 1])))
            ss, es = -tol, vmax - viol_tol
            best = None
            while es - ss > tol:
                sm = 0.5 * (ss + es)
                pt = _feasible_pt(cons, sm)
                if pt is None:
                    ss = sm
                else:
                    best, es = pt, sm
            if best is not None and es < vmax:
                x[k] = best
    return x


def run_baseline(P, q, r, is_eq, sweeps):
    # time one restart; extrapolate the single-thread rate
    t0 = time.time()
    baseline_one_restart(P, q, r, is_eq, sweeps)
    dt = time.time() - t0
    return 1.0 / dt


# ---------------------------------------------------------------------------
# Device benchmark
# ---------------------------------------------------------------------------

def run_device(P, q, r, is_eq):
    import jax
    import jax.numpy as jnp
    from qcqp_tpu.core import QCQPForm
    from qcqp_tpu.solvers.coord_descent import improve_coord_descent_batch
    from qcqp_tpu.solvers.coord_descent_fused import improve_coord_descent_fused
    from qcqp_tpu.parallel.restarts import best_point

    dt = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    form = QCQPForm(jnp.asarray(P, dt), jnp.asarray(q, dt),
                    jnp.asarray(r, dt), jnp.asarray(is_eq))

    # Fused Pallas phase-1 CD kernel is the default on accelerators (23%
    # faster than the vmapped path on v5e); BENCH_FUSED=0 falls back.
    on_accel = jax.default_backend() != "cpu"
    fused = os.environ.get("BENCH_FUSED", "1" if on_accel else "0") == "1"

    @jax.jit
    def step(key):
        xs = jax.random.normal(key, (R, N), dt)
        if fused:
            xs = improve_coord_descent_fused(form, xs, num_iters=SWEEPS)
        else:
            xs = improve_coord_descent_batch(form, xs, num_iters=SWEEPS)
        return best_point(form, xs)

    key = jax.random.PRNGKey(0)
    # compile
    out = step(key)
    jax.block_until_ready(out)
    # timed runs
    t0 = time.time()
    reps = int(os.environ.get("BENCH_REPS", 1))
    for i in range(reps):
        out = step(jax.random.PRNGKey(i + 1))
        jax.block_until_ready(out)
    elapsed = (time.time() - t0) / reps
    return R / elapsed, out


def run_admm(P, q, r, is_eq):
    """Secondary metric: fused whole-phase ADMM improve throughput
    (kernels/admm_pallas.py) at 50 iterations, R_ADMM restarts."""
    import jax
    import jax.numpy as jnp
    from qcqp_tpu.core import QCQPForm

    R_admm = int(os.environ.get("BENCH_ADMM_R", 1024))
    iters = int(os.environ.get("BENCH_ADMM_ITERS", 50))
    dt = jnp.float32
    form = QCQPForm(jnp.asarray(P, dt), jnp.asarray(q, dt),
                    jnp.asarray(r, dt), jnp.asarray(is_eq))
    xs = jax.random.normal(jax.random.PRNGKey(0), (R_admm, N), dt)
    on_accel = jax.default_backend() != "cpu"
    if on_accel:
        from qcqp_tpu.kernels.admm_pallas import (ADMMFusedData,
                                                  improve_admm_fused)
        data = ADMMFusedData(form)
        step = lambda: improve_admm_fused(form, xs, num_iters=iters,
                                          data=data)
    else:
        from qcqp_tpu.solvers.admm import improve_admm_batch
        step = lambda: improve_admm_batch(form, xs, num_iters=iters)
    jax.block_until_ready(step())      # compile
    t0 = time.time()
    jax.block_until_ready(step())
    return R_admm / (time.time() - t0), iters


def main():
    P, q, r, is_eq = make_problem()
    rate, out = run_device(P, q, r, is_eq)
    admm_rate, admm_iters = run_admm(P, q, r, is_eq)
    base_rate = run_baseline(P, q, r, is_eq, SWEEPS)
    print(json.dumps({
        "metric": f"restarts_per_sec_n{N}_m{M}_cd{SWEEPS}",
        "value": round(rate, 3),
        "unit": "restarts/s",
        "vs_baseline": round(rate / base_rate, 3),
        "extra": {
            f"admm_restarts_per_sec_n{N}_m{M}_it{admm_iters}":
                round(admm_rate, 3),
        },
    }))


if __name__ == "__main__":
    main()
