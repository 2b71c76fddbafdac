#!/usr/bin/env python
"""Mixed-precision study (ROADMAP item 8 / VERDICT r2 item 5).

Two questions, answered empirically on the bench workload (n=100, m=50,
f32 control):

  A. CD: does carrying the problem data in bfloat16 (8-bit mantissa) change
     solution quality?  (TPU VPU lane-ops run at f32 rate either way, so
     bf16 buys VMEM capacity, not speed — the question is pure accuracy.)
  B. ADMM fused: do the kernel's MXU matmuls (eigenbasis rotations,
     consensus sums, z-update) need precision=HIGHEST (6-pass f32), or is
     the single-pass bf16 multiply enough?  This is ~25% of per-iteration
     cost, so "default is fine" would be a real speedup.

Mode B runs in subprocesses because the precision is a trace-time module
constant (ADMM_MXU_PREC env).  Usage:  python benchmarks/mixed_precision.py
Each result prints as one JSON line; pin the table in BASELINE.md.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, M, R = 100, 50, 1024
SWEEPS, ADMM_ITERS = 10, 50


def make_problem():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((M + 1, N, N)) / np.sqrt(N)
    P = 0.5 * (A + np.swapaxes(A, -1, -2))
    q = rng.standard_normal((M + 1, N)) / np.sqrt(N)
    r = rng.standard_normal(M + 1)
    is_eq = rng.random(M) < 0.5
    return P, q, r, is_eq


def quality(form, xs):
    import jax
    import numpy as np
    from qcqp_tpu.core import max_violation, eval_objective
    from qcqp_tpu.parallel.restarts import best_point
    v = np.asarray(jax.vmap(lambda x: max_violation(form, x))(xs))
    x, f, vb = best_point(form, xs)
    return {"best_f": round(float(f), 4), "best_v": round(float(vb), 6),
            "feas_frac": round(float((v < 1e-2).mean()), 4),
            "median_v": round(float(np.median(v)), 5)}


def run_cd(bf16_data: bool):
    import jax
    import jax.numpy as jnp
    from qcqp_tpu.core import QCQPForm
    from qcqp_tpu.solvers.coord_descent_fused import improve_coord_descent_fused

    P, q, r, is_eq = make_problem()
    if bf16_data:
        P = np.asarray(jnp.asarray(P, jnp.bfloat16), np.float32)
        q = np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32)
        r = np.asarray(jnp.asarray(r, jnp.bfloat16), np.float32)
    form = QCQPForm(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
                    jnp.asarray(r, jnp.float32), jnp.asarray(is_eq))
    # quality is evaluated against the EXACT f32 problem in both runs
    Pe, qe, re, _ = make_problem()
    form_exact = QCQPForm(jnp.asarray(Pe, jnp.float32),
                          jnp.asarray(qe, jnp.float32),
                          jnp.asarray(re, jnp.float32), jnp.asarray(is_eq))
    xs = jax.random.normal(jax.random.PRNGKey(1), (R, N), jnp.float32)
    out = improve_coord_descent_fused(form, xs, num_iters=SWEEPS)
    _ = float(out[0, 0])
    t0 = time.time()
    out = improve_coord_descent_fused(form, xs, num_iters=SWEEPS)
    _ = float(out[0, 0])
    dt = time.time() - t0
    row = {"exp": "cd_bf16_data" if bf16_data else "cd_f32_control",
           "restarts_per_sec": round(R / dt, 1)}
    row.update(quality(form_exact, out))
    print(json.dumps(row), flush=True)


def run_admm():
    import jax
    import jax.numpy as jnp
    from qcqp_tpu.core import QCQPForm
    from qcqp_tpu.kernels.admm_pallas import ADMMFusedData, improve_admm_fused

    P, q, r, is_eq = make_problem()
    form = QCQPForm(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
                    jnp.asarray(r, jnp.float32), jnp.asarray(is_eq))
    xs = jax.random.normal(jax.random.PRNGKey(1), (R, N), jnp.float32)
    data = ADMMFusedData(form)
    out = improve_admm_fused(form, xs, num_iters=ADMM_ITERS, data=data)
    _ = float(out[0, 0])
    t0 = time.time()
    out = improve_admm_fused(form, xs, num_iters=ADMM_ITERS, data=data)
    _ = float(out[0, 0])
    dt = time.time() - t0
    row = {"exp": "admm_mxu_" + os.environ.get("ADMM_MXU_PREC", "highest"),
           "restarts_per_sec": round(R / dt, 1)}
    row.update(quality(form, out))
    print(json.dumps(row), flush=True)


def main():
    if len(sys.argv) > 1:
        mode = sys.argv[1]
        if mode == "cd_f32":
            run_cd(False)
        elif mode == "cd_bf16":
            run_cd(True)
        elif mode == "admm":
            run_admm()
        return
    here = os.path.abspath(__file__)
    for mode, env in (("cd_f32", {}), ("cd_bf16", {}),
                      ("admm", {"ADMM_MXU_PREC": "highest"}),
                      ("admm", {"ADMM_MXU_PREC": "default"})):
        e = dict(os.environ)
        e.update(env)
        subprocess.run([sys.executable, "-u", here, mode], env=e, check=True)


if __name__ == "__main__":
    main()
