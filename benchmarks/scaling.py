#!/usr/bin/env python
"""Restart-throughput scaling across a virtual device mesh.

Real multi-host TPU hardware is not available in this environment, so this
measures the *structural* scaling of the sharded restart pipeline on N
virtual CPU devices (the same GSPMD program that runs on a pod slice; only
the interconnect differs).  Run:

    python benchmarks/scaling.py

Prints restarts/s and parallel efficiency per mesh size.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from qcqp_tpu.core import random_form  # noqa: E402
from qcqp_tpu.parallel.restarts import solve_restarts  # noqa: E402

N = int(os.environ.get("SCALE_N", 40))
M = int(os.environ.get("SCALE_M", 20))
R = int(os.environ.get("SCALE_R", 256))
SWEEPS = int(os.environ.get("SCALE_SWEEPS", 5))


def run(mesh_devices):
    rng = np.random.default_rng(0)
    form = random_form(rng, n=N, m=M)
    mesh = Mesh(np.array(mesh_devices), ("r",)) if mesh_devices else None
    key = jax.random.PRNGKey(0)
    # warm-up / compile
    out = solve_restarts(form, R, key, mesh=mesh, num_iters=SWEEPS)
    jax.block_until_ready(out)
    t0 = time.time()
    out = solve_restarts(form, R, jax.random.PRNGKey(1), mesh=mesh,
                         num_iters=SWEEPS)
    jax.block_until_ready(out)
    return R / (time.time() - t0)


def main():
    devs = jax.devices()
    base = run(devs[:1])
    print(f"1 device : {base:9.1f} restarts/s  (eff 100.0%)")
    for nd in (2, 4, 8):
        if nd > len(devs):
            break
        rate = run(devs[:nd])
        eff = rate / (base * nd) * 100
        print(f"{nd} devices: {rate:9.1f} restarts/s  (eff {eff:5.1f}%)")


if __name__ == "__main__":
    main()
