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
# Modeled VPU roofline of the CD mega-kernel at the default bench shape
# (BASELINE.md "CD mega-kernel roofline").  Round 3 folded the tangency slop
# into the canonical bounds (~9 -> ~7 lane-ops/row, bound ~36000 r/s);
# round 5's warm-started slack brackets cut the effective bisection trips
# from ~5.5 to ~4.4 (hopeless coordinates re-certify in one probe), which
# rescales the candidate-sweep bound to ~45000 restarts/s.  Only meaningful
# at default N/M/R.
CD_ROOFLINE_RS = 45000.0


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


def baseline_one_restart(P, q, r, is_eq, sweeps, viol_tol=1e-2, tol=1e-4,
                         seed=1):
    n = P.shape[-1]
    m = len(is_eq)
    rng = np.random.default_rng(seed)
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
    """Single-thread reference-style rate, averaged over BENCH_BASE_REPS
    restarts (VERDICT r2 item 7: a one-restart extrapolation made
    vs_baseline swing 5x between rounds on baseline-side noise alone).
    The averaged rate is cross-checked against the value pinned in
    BASELINE.md ("vs_baseline methodology")."""
    reps = int(os.environ.get("BENCH_BASE_REPS", 5))
    t0 = time.time()
    for i in range(reps):
        baseline_one_restart(P, q, r, is_eq, sweeps, seed=1 + i)
    dt = (time.time() - t0) / reps
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
    # compile + drain (block_until_ready does NOT reliably block over the
    # axon tunnel for pallas programs — a host read of a scalar does)
    out = step(key)
    _ = float(out[1])
    # timed runs
    t0 = time.time()
    reps = int(os.environ.get("BENCH_REPS", 1))
    for i in range(reps):
        out = step(jax.random.PRNGKey(i + 1))
        _ = float(out[1])
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
    _ = float(step()[0, 0])            # compile + drain (see run_device)
    t0 = time.time()
    _ = float(step()[0, 0])
    return R_admm / (time.time() - t0), iters


def run_ccp_nlp(P, q, r, is_eq):
    """Per-restart throughput of the remaining two improve methods
    (reference: qcqp/qcqp.py:288-364), vmapped over a restart batch."""
    import jax
    import jax.numpy as jnp
    from qcqp_tpu.core import QCQPForm
    from qcqp_tpu.solvers.ccp import improve_ccp, precompute_ccp
    from qcqp_tpu.solvers.nlp import improve_nlp

    R_b = int(os.environ.get("BENCH_CCP_R", 128))
    dt = jnp.float32
    form = QCQPForm(jnp.asarray(P, dt), jnp.asarray(q, dt),
                    jnp.asarray(r, dt), jnp.asarray(is_eq))
    xs = jax.random.normal(jax.random.PRNGKey(3), (R_b, N), dt)

    on_accel = jax.default_backend() != "cpu"
    if on_accel:
        # Whole-improve Pallas CCP mega-kernel (kernels/ccp_pallas.py);
        # 18.7x the vmapped path on v5e at BETTER violation quality
        # (warm inner duals + short inexact inner solves, BASELINE.md r4)
        from qcqp_tpu.kernels.ccp_pallas import (CCPFusedData,
                                                 improve_ccp_fused)
        cdata = CCPFusedData(form)
        ccp = lambda: improve_ccp_fused(form, xs, data=cdata)
        _ = float(ccp()[0, 0])
        t0 = time.time()
        _ = float(ccp()[0, 0])
        ccp_rate = R_b / (time.time() - t0)
    else:
        data = precompute_ccp(form)
        ccp = jax.jit(jax.vmap(lambda x: improve_ccp(form, x, data=data)))
        _ = float(ccp(xs)[0, 0])
        t0 = time.time()
        _ = float(ccp(xs)[0, 0])
        ccp_rate = R_b / (time.time() - t0)

    nlp = jax.jit(jax.vmap(lambda x: improve_nlp(form, x)))
    _ = float(nlp(xs)[0, 0])
    t0 = time.time()
    _ = float(nlp(xs)[0, 0])
    nlp_rate = R_b / (time.time() - t0)
    return ccp_rate, nlp_rate


def run_sdr(P, q, r, is_eq):
    """Single-instance SDR relaxation wall time, device vs host (VERDICT r2
    item 3), plus the scenario-batched SDR serving rate.

    Measured on an n=N boolean-least-squares instance (x_i^2 = 1): the
    bench's random dense QCQP has an unbounded Shor relaxation, so its
    splitting iterations never converge and time nothing meaningful."""
    import jax
    import jax.numpy as jnp
    from qcqp_tpu.core import QCQPForm
    from qcqp_tpu.solvers.sdp import solve_sdr, solve_sdr_batch

    iters = int(os.environ.get("BENCH_SDR_ITERS", 3000))
    dt = jnp.float32
    rng = np.random.default_rng(2)
    A = rng.standard_normal((N + 20, N))
    b = rng.standard_normal(N + 20)
    Pb = np.zeros((N + 1, N, N))
    Pb[0] = A.T @ A
    for i in range(N):
        Pb[1 + i, i, i] = 1.0
    qb = np.zeros((N + 1, N))
    qb[0] = -2.0 * A.T @ b
    rb = np.zeros(N + 1)
    rb[0] = float(b @ b)
    rb[1:] = -1.0
    eqb = np.ones(N, bool)
    form32 = QCQPForm(jnp.asarray(Pb, dt), jnp.asarray(qb, dt),
                      jnp.asarray(rb, dt), jnp.asarray(eqb))
    form64 = QCQPForm(jnp.asarray(Pb), jnp.asarray(qb), jnp.asarray(rb),
                      jnp.asarray(eqb))

    # Time-to-tolerance, not a fixed iteration budget (round 4): with
    # Anderson acceleration the host path pays ~2.6x per iteration for
    # ~4000x the residual, so equal-budget wall-clock rewards the WORSE
    # configuration.  Each path runs to its dtype-appropriate tolerance
    # (f32 device: the 3e-5 floor; f64 host: 1e-6) and reports ms + iters.
    out = {}
    dev = solve_sdr(form32, device="device", check=False, full=True,
                    max_iters=2 * iters)
    _ = float(dev.objective)
    t0 = time.time()
    dev = solve_sdr(form32, device="device", check=False, full=True,
                    max_iters=2 * iters)
    _ = float(dev.objective)        # drain: dispatch is async on the tunnel
    out["sdr_single_ms_device"] = round((time.time() - t0) * 1e3, 1)
    out["sdr_single_iters_device"] = int(dev.iterations)
    host = solve_sdr(form64, device="host", check=False, full=True,
                     max_iters=20000, tol=1e-6)
    _ = float(host.objective)
    t0 = time.time()
    host = solve_sdr(form64, device="host", check=False, full=True,
                     max_iters=20000, tol=1e-6)
    _ = float(host.objective)
    out["sdr_single_ms_host"] = round((time.time() - t0) * 1e3, 1)
    out["sdr_single_iters_host"] = int(host.iterations)

    # Scenario-batched serving path: S drifted boolean-LS instances.
    # BOUNDED relaxations with a per-instance acceptance gate + host-f64
    # fallback — the old random dense bank had unbounded Shor relaxations,
    # so its fixed-budget rate carried no quality meaning (VERDICT r4 weak
    # #5).  The metric is solves/s TO TOLERANCE with the acceptance rate.
    S, ns = 16, 24
    rng = np.random.default_rng(5)
    base_A = rng.standard_normal((ns + 8, ns))
    Ps = np.zeros((S, ns + 1, ns, ns))
    qs = np.zeros((S, ns + 1, ns))
    rs = np.zeros((S, ns + 1))
    for si in range(S):
        A_s = base_A + 0.05 * rng.standard_normal((ns + 8, ns))
        b_s = rng.standard_normal(ns + 8)
        Ps[si, 0] = A_s.T @ A_s
        for i in range(ns):
            Ps[si, 1 + i, i, i] = 1.0
        qs[si, 0] = -2.0 * A_s.T @ b_s
        rs[si, 0] = float(b_s @ b_s)
        rs[si, 1:] = -1.0
    stacked = QCQPForm(jnp.asarray(Ps, dt), jnp.asarray(qs, dt),
                       jnp.asarray(rs, dt),
                       jnp.asarray(np.ones((S, ns), bool)))
    kw = dict(max_iters=6000, tol=3e-5, return_accept=True)
    Xb, bounds, rp, rd, acc = solve_sdr_batch(stacked, **kw)
    _ = float(bounds[0])
    t0 = time.time()
    Xb, bounds, rp, rd, acc = solve_sdr_batch(stacked, **kw)
    _ = float(bounds[0])
    out["sdr_batch_to_tol_solves_per_sec"] = round(S / (time.time() - t0), 2)
    out["sdr_batch_accept_rate"] = round(float(np.mean(acc)), 3)
    return out


def run_smoke():
    """On-TPU golden gate (tests/tpu_smoke.py); returns extras to merge.
    BENCH_SMOKE=0 skips (e.g. CPU-only debugging)."""
    import jax
    if os.environ.get("BENCH_SMOKE", "1") == "0" or \
            jax.default_backend() == "cpu":
        return {}
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    from tpu_smoke import run_smoke as _rs
    ok, details = _rs()
    return {"tpu_smoke_ok": ok, "tpu_smoke_failed": details["failed"]}


def main():
    P, q, r, is_eq = make_problem()
    rate, out = run_device(P, q, r, is_eq)
    admm_rate, admm_iters = run_admm(P, q, r, is_eq)
    ccp_rate, nlp_rate = run_ccp_nlp(P, q, r, is_eq)
    sdr_extras = run_sdr(P, q, r, is_eq)
    smoke_extras = run_smoke()
    base_rate = run_baseline(P, q, r, is_eq, SWEEPS)
    extras = {
        f"admm_restarts_per_sec_n{N}_m{M}_it{admm_iters}":
            round(admm_rate, 3),
        "ccp_restarts_per_sec": round(ccp_rate, 3),
        "nlp_restarts_per_sec": round(nlp_rate, 3),
        # Fraction of the CD mega-kernel's algorithmic VPU roofline
        # (CD_ROOFLINE_RS above; derivation in BASELINE.md "CD mega-kernel
        # roofline").  Self-auditing perf claim (VERDICT r2 #7).
        "roofline_frac": round(rate / CD_ROOFLINE_RS, 3),
        "baseline_restarts_per_sec": round(base_rate, 4),
    }
    extras.update(sdr_extras)
    extras.update(smoke_extras)
    print(json.dumps({
        "metric": f"restarts_per_sec_n{N}_m{M}_cd{SWEEPS}",
        "value": round(rate, 3),
        "unit": "restarts/s",
        "vs_baseline": round(rate / base_rate, 3),
        "extra": extras,
    }))


if __name__ == "__main__":
    main()
