import numpy as np
import jax.numpy as jnp
import pytest

import qcqp_tpu as qt
from qcqp_tpu import core
from qcqp_tpu.expressions import canonicalize
from qcqp_tpu.solvers.admm import (
    improve_admm, improve_admm_batch, auto_rho, min_valid_rho,
)
from .test_cd import boolean_ls_form


def test_auto_rho_matches_heuristic():
    form, _, _ = boolean_ls_form(n=6, m=9, seed=2)
    lmb = np.linalg.eigvalsh(np.asarray(form.P[0]))
    expect = 50.0 * (2 * (1 - lmb.min()) / form.m if lmb.min() < 0 else 1.0 / form.m)
    np.testing.assert_allclose(float(auto_rho(form)), expect, rtol=1e-10)
    assert float(min_valid_rho(form)) == pytest.approx(max(-lmb.min() / form.m,
                                                           -np.inf), abs=1e-12)


def test_admm_convex_projection_problem():
    # min ||x - c||^2 s.t. ||x||^2 <= 1: optimum at c/||c||
    n = 5
    c = np.zeros(n); c[0] = 2.0
    x = qt.Variable(n)
    prob = qt.Problem(qt.Minimize(qt.sum_squares(x - c)),
                      [qt.sum_squares(x) <= 1])
    form, _, _ = canonicalize(prob)
    x0 = jnp.zeros(n, jnp.float64)
    out = np.asarray(improve_admm(form, x0))
    v = float(core.max_violation(form, jnp.asarray(out)))
    f = float(core.eval_objective(form, jnp.asarray(out)))
    assert v < 5e-2
    assert f <= 1.1  # optimum is 1.0


def test_admm_boolean_ls():
    form, A, b = boolean_ls_form(n=8, m=12, seed=4)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(np.sign(rng.standard_normal(form.n)))
    out = np.asarray(improve_admm(form, x0))
    v = float(core.max_violation(form, jnp.asarray(out)))
    # ADMM keeps the best-so-far under `better`; must not be worse than start
    assert np.array_equal(
        np.asarray(core.better(form, jnp.asarray(out), x0)), out)
    assert v < 0.5


def test_admm_phase1_reaches_feasibility():
    # Convex feasibility: two overlapping balls; phase-1 consensus must find
    # the intersection from a far-away start.  (On nonconvex boolean
    # constraints phase 1 can limit-cycle — the reference's identical
    # iteration does too, which is why improve_admm guards with `better`.)
    n = 4
    a = np.full(n, 0.5)
    x = qt.Variable(n)
    prob = qt.Problem(qt.Minimize(qt.sum_squares(x)),
                      [qt.sum_squares(x) <= 1, qt.sum_squares(x - a) <= 1])
    form, _, _ = canonicalize(prob)
    from qcqp_tpu.kernels.projection import precompute_eigh
    from qcqp_tpu.solvers.admm import admm_phase1
    x0 = jnp.asarray(np.full(n, 3.0))
    z = np.asarray(admm_phase1(form, precompute_eigh(form), x0, 1e-2, 500))
    v = float(core.max_violation(form, jnp.asarray(z)))
    assert v < 1e-2, v


def test_admm_batch_matches_single():
    form, _, _ = boolean_ls_form(n=5, m=7, seed=8)
    rng = np.random.default_rng(2)
    xs = jnp.asarray(np.sign(rng.standard_normal((3, form.n))))
    batched = np.asarray(improve_admm_batch(form, xs, num_iters=50))
    for i in range(3):
        single = np.asarray(improve_admm(form, xs[i], num_iters=50))
        np.testing.assert_allclose(batched[i], single, atol=1e-8)
