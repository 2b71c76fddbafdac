import numpy as np
import jax.numpy as jnp
import pytest

import qcqp_tpu as qt
from qcqp_tpu import core
from qcqp_tpu.expressions import canonicalize
from qcqp_tpu.solvers import sdp


def test_analytic_tiny_sdp():
    # min x11 + x22 s.t. x12 == 1 (via lifted encoding), X psd
    # -> X = [[1,1],[1,1]] scaled: min trace with off-diag fixed 1:
    # optimum trace = 2 (x11 = x22 = 1).
    W0 = jnp.eye(2, dtype=jnp.float64)
    Woff = jnp.asarray([[0.0, 0.5], [0.5, 0.0]], jnp.float64)
    data = sdp.build_sdp(
        W0, Woff[None], jnp.asarray([1.0], jnp.float64),
        jnp.asarray([False]))
    sol = sdp.solve_sdp(data, max_iters=5000, tol=1e-10)
    np.testing.assert_allclose(float(sol.objective), 2.0, atol=1e-6)
    lam = np.linalg.eigvalsh(np.asarray(sol.X))
    assert lam.min() > -1e-8


def test_sdr_boolean_ls_bound_is_lower_bound():
    from .test_cd import boolean_ls_form
    form, A, b = boolean_ls_form(n=8, m=12, seed=3)
    X, bound = sdp.solve_sdr(form, max_iters=20000, tol=1e-9)
    # true optimum by brute force
    best = np.inf
    for bits in range(1 << 8):
        s = np.array([1.0 if bits >> i & 1 else -1.0 for i in range(8)])
        best = min(best, float(np.sum((A @ s - b) ** 2)))
    assert float(bound) <= best + 1e-4
    # bound must be reasonably tight for boolean LS (SDR is strong here)
    assert float(bound) >= 0.2 * best - 1.0
    # lifted solution structure
    X = np.asarray(X)
    np.testing.assert_allclose(X[-1, -1], 1.0, atol=1e-6)
    assert np.linalg.eigvalsh(X).min() > -1e-7
    # diag of X[:n,:n] == 1 (from x_i^2 == 1 constraints)
    np.testing.assert_allclose(np.diag(X)[:-1], 1.0, atol=1e-5)


def test_sdr_convex_qp_matches_exact():
    # For a convex QP with convex constraint the SDR is tight:
    # min ||x - c||^2 s.t. ||x||^2 <= 1 -> optimum (||c||-1)^2
    n = 4
    c = np.zeros(n); c[0] = 2.0
    x = qt.Variable(n)
    prob = qt.Problem(qt.Minimize(qt.sum_squares(x - c)),
                      [qt.sum_squares(x) <= 1])
    form, _, _ = canonicalize(prob)
    X, bound = sdp.solve_sdr(form, max_iters=20000, tol=1e-9)
    np.testing.assert_allclose(float(bound), 1.0, atol=1e-5)
    mu = np.asarray(X)[:-1, -1]
    np.testing.assert_allclose(mu, [1, 0, 0, 0], atol=1e-4)


def test_spectral_boolean_ls():
    from .test_cd import boolean_ls_form
    form, A, b = boolean_ls_form(n=6, m=9, seed=5)
    xs, bound = sdp.solve_spectral(form, max_iters=20000, tol=1e-9)
    _, sdr_bound = sdp.solve_sdr(form, max_iters=20000, tol=1e-9)
    # spectral relaxation is weaker (aggregated): bound <= sdr bound
    assert float(bound) <= float(sdr_bound) + 1e-4
    assert np.asarray(xs).shape == (6,)


def test_sdp_against_slsqp_oracle():
    from . import oracle
    rng = np.random.default_rng(0)
    N = 4
    C = rng.standard_normal((N, N)); C = 0.5 * (C + C.T)
    A1 = np.eye(N)
    A2 = np.zeros((N, N)); A2[0, 1] = A2[1, 0] = 0.5
    As = [A1, A2]
    bs = [1.0, 0.1]
    eqs = [True, False]
    data = sdp.build_sdp(
        jnp.asarray(C, jnp.float64),
        jnp.asarray(np.stack(As), jnp.float64),
        jnp.asarray(bs, jnp.float64),
        jnp.asarray([not e for e in eqs]))
    sol = sdp.solve_sdp(data, max_iters=30000, tol=1e-10)
    Xo, fo, ok = oracle.solve_sdp_oracle(C, As, bs, eqs)
    if ok:
        assert float(sol.objective) <= fo + 1e-4
        # our X must satisfy the constraints
        X = np.asarray(sol.X)
        np.testing.assert_allclose(np.sum(A1 * X), 1.0, atol=1e-6)
        assert np.sum(A2 * X) <= 0.1 + 1e-6
        assert np.linalg.eigvalsh(X).min() > -1e-7


def test_sdr_batch_matches_single():
    from .test_cd import boolean_ls_form
    from qcqp_tpu.parallel.scenarios import stack_forms
    forms = [boolean_ls_form(n=6, m=9, seed=s)[0] for s in (11, 12)]
    Xb, bounds, rp, rd = sdp.solve_sdr_batch(stack_forms(forms),
                                             max_iters=8000, tol=1e-8)
    for i, form in enumerate(forms):
        X1, b1 = sdp.solve_sdr(form, max_iters=8000, tol=1e-8)
        assert float(bounds[i]) == pytest.approx(float(b1), abs=1e-4)
        np.testing.assert_allclose(np.asarray(Xb[i]), np.asarray(X1),
                                   atol=1e-3)


def test_warm_jacobi_cone_matches_eigh():
    # warm-started Jacobi PSD projection path converges to the same bound
    from .test_cd import boolean_ls_form
    form, _, _ = boolean_ls_form(n=9, m=14, seed=21)
    data = sdp._sdr_data(form)
    s_eigh = sdp.solve_sdp(data, max_iters=20000, tol=1e-9)
    s_warm = sdp.solve_sdp(data, max_iters=20000, tol=1e-9,
                           psd_method="warm", warm_sweeps=2)
    assert float(s_warm.objective) == pytest.approx(float(s_eigh.objective),
                                                    abs=1e-6)
    assert float(s_warm.primal_res) < 1e-8
    # 1 sweep also suffices
    s_w1 = sdp.solve_sdp(data, max_iters=20000, tol=1e-9,
                         psd_method="warm", warm_sweeps=1)
    assert float(s_w1.objective) == pytest.approx(float(s_eigh.objective),
                                                  abs=1e-6)


def test_jacobi_sweeps_pure_jnp():
    from qcqp_tpu.kernels.eigh_pallas import jacobi_sweeps
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    for n0 in (7, 12):  # odd size exercises the padding path
        A = rng.standard_normal((n0, n0))
        A = 0.5 * (A + A.T)
        lam, V = jacobi_sweeps(jnp.asarray(A), sweeps=10)
        rec = np.asarray(V) @ np.diag(np.asarray(lam)) @ np.asarray(V).T
        np.testing.assert_allclose(rec, A, atol=1e-8)
        np.testing.assert_allclose(sorted(np.asarray(lam)),
                                   np.linalg.eigvalsh(A), atol=1e-8)


def test_warm_start_resolve_fewer_iterations():
    """A perturbed instance re-solved from the previous state converges in a
    fraction of the cold iteration count (parameterized-family serving)."""
    from .test_cd import boolean_ls_form
    form, _, _ = boolean_ls_form(n=6, m=6, seed=7)
    sol0 = sdp.solve_sdr(form, max_iters=20000, tol=1e-8, full=True)

    # perturb the linear terms by 0.1% (a serving-style drift)
    form2 = type(form)(form.P, form.q * 1.001, form.r, form.is_eq)
    warm = sdp.solve_sdr(form2, max_iters=20000, tol=1e-8, full=True,
                         warm=sol0.state)
    cold = sdp.solve_sdr(form2, max_iters=20000, tol=1e-8, full=True)
    assert float(warm.primal_res) <= 1e-8 and float(warm.dual_res) <= 1e-8
    np.testing.assert_allclose(float(warm.objective), float(cold.objective),
                               rtol=1e-5, atol=1e-6)
    assert int(warm.iterations) < int(cold.iterations) * 0.7, (
        int(warm.iterations), int(cold.iterations))


def test_warm_start_batch_roundtrip():
    from .test_cd import boolean_ls_form
    from qcqp_tpu.parallel.scenarios import stack_forms
    forms = [boolean_ls_form(n=5, m=5, seed=s)[0] for s in range(3)]
    stacked = stack_forms(forms)
    X, b, rp, rd, states = sdp.solve_sdr_batch(
        stacked, max_iters=4000, tol=1e-7, return_state=True)
    X2, b2, rp2, rd2 = sdp.solve_sdr_batch(
        stacked, max_iters=50, tol=1e-7, warm=states)
    # warm restart of the same instances: already converged, stays converged
    assert np.asarray(rp2).max() < 1e-6
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b), rtol=1e-5,
                               atol=1e-7)
