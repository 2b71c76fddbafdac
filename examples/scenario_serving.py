#!/usr/bin/env python
"""Scenario-parallel serving: a batch of independent QCQP instances solved in
one compiled program — the production path the reference has no analog for.

Pipeline: generate an instance bank -> write/load it through the native
threaded problem-bank IO -> batched SDR relaxation (accelerator-resident,
eighs amortize across scenarios) -> Gaussian rounding -> batched multi-start
coordinate descent -> per-scenario best points.
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import qcqp_tpu as qt
from qcqp_tpu import native
from qcqp_tpu.core import QCQPForm
from qcqp_tpu.parallel.scenarios import stack_forms, forms_from_bank, solve_scenarios
from qcqp_tpu.solvers.sdp import solve_sdr_batch

S, n, m = 8, 12, 12  # scenarios x problem size
rng = np.random.default_rng(0)

# --- build S boolean least-squares instances and persist them as a bank ----
forms = []
for s_idx in range(S):
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    x = qt.Variable(n)
    prob = qt.Problem(qt.Minimize(qt.sum_squares(A @ x - b)),
                      [qt.square(x) == 1])
    form, _, _ = qt.canonicalize(prob)
    forms.append(form)
stacked = stack_forms(forms)

bank = os.path.join(tempfile.mkdtemp(), "instances.qcqp")
native.bank_write(bank, np.asarray(stacked.P), np.asarray(stacked.q),
                  np.asarray(stacked.r), np.asarray(stacked.is_eq))
print(f"bank: {S} instances (n={n}, m={m}) ->", bank)

# --- load a batch back and solve end-to-end --------------------------------
loaded = forms_from_bank(bank)

# batched SDR bounds (one vmapped splitting solve)
X, bounds, rp, rd = solve_sdr_batch(loaded, max_iters=4000, tol=1e-7)
print("SDR bounds:", np.round(np.asarray(bounds), 3))

# batched suggest+improve+reduce: 64 restarts per scenario
xs, fs, vs = solve_scenarios(loaded, num_restarts=64,
                             key=jax.random.PRNGKey(0),
                             improve=qt.COORD_DESCENT)
print("best objectives:", np.round(np.asarray(fs), 3))
print("max violations :", np.round(np.asarray(vs), 4))
assert (np.asarray(vs) < 1e-2).all()
assert (np.asarray(fs) >= np.asarray(bounds) - 1e-3).all()
print("all scenarios feasible; objectives dominate their SDR lower bounds")
