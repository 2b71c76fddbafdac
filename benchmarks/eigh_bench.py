#!/usr/bin/env python
"""Batched symmetric eigh: vectorized Jacobi Pallas kernel vs XLA's eigh.

Measures wall time of `eigh_jacobi_vec` (kernels/eigh_pallas.py, matmul-free
VPU formulation) against `jnp.linalg.eigh` (f32) on the current accelerator
across batch x n grid, plus accuracy vs LAPACK f64.  This is the decision
bench for VERDICT round-2 item 1 (replace the LAPACK role of the reference,
qcqp/utilities.py:78,83,162).

Run on TPU:  python benchmarks/eigh_bench.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from qcqp_tpu.kernels.eigh_pallas import eigh_jacobi_vec

    rng = np.random.default_rng(0)
    results = []
    for n in (32, 100, 128):
        for B in (16, 64, 256):
            A = rng.standard_normal((B, n, n)).astype(np.float32)
            A = 0.5 * (A + np.swapaxes(A, -1, -2))
            Ad = jnp.asarray(A)
            lam_ref = np.linalg.eigvalsh(A.astype(np.float64))
            scale = np.abs(lam_ref).max()

            jac = jax.jit(lambda M: eigh_jacobi_vec(M, sweeps=8))
            xla = jax.jit(lambda M: jnp.linalg.eigh(M))

            row = {"n": n, "B": B}
            for name, fn in (("jacobi_vec", jac), ("xla_eigh", xla)):
                try:
                    out = fn(Ad)
                    jax.block_until_ready(out)
                    t0 = time.time()
                    reps = 3
                    for _ in range(reps):
                        out = fn(Ad)
                        jax.block_until_ready(out)
                    dt = (time.time() - t0) / reps
                    lam = np.asarray(out[0], np.float64)
                    err = np.abs(lam - lam_ref).max() / scale
                    row[name + "_ms"] = round(dt * 1e3, 3)
                    row[name + "_relerr"] = float(f"{err:.2e}")
                except Exception as e:  # noqa: BLE001
                    row[name + "_error"] = repr(e)[:200]
            if "jacobi_vec_ms" in row and "xla_eigh_ms" in row:
                row["speedup"] = round(row["xla_eigh_ms"] / row["jacobi_vec_ms"], 2)
            results.append(row)
            print(json.dumps(row), flush=True)

    ok = [r.get("speedup", 0) for r in results if r["n"] >= 100]
    print(json.dumps({"summary_min_speedup_n>=100": min(ok) if ok else None,
                      "summary_max_speedup_n>=100": max(ok) if ok else None}))


if __name__ == "__main__":
    main()
