import numpy as np
import jax.numpy as jnp
import pytest

from qcqp_tpu import core


@pytest.fixture
def form():
    rng = np.random.default_rng(0)
    return core.random_form(rng, n=6, m=4)


def _np_eval(P, q, r, x):
    return x @ P @ x + q @ x + r


def test_eval_all_matches_numpy(form):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(form.n)
    vals = np.asarray(core.eval_all(form, jnp.asarray(x)))
    for k in range(form.m + 1):
        expect = _np_eval(np.asarray(form.P[k]), np.asarray(form.q[k]),
                          float(form.r[k]), x)
        np.testing.assert_allclose(vals[k], expect, rtol=1e-10)


def test_violations_semantics(form):
    rng = np.random.default_rng(2)
    x = rng.standard_normal(form.n)
    vals = np.asarray(core.eval_all(form, jnp.asarray(x)))[1:]
    v = np.asarray(core.violations(form, jnp.asarray(x)))
    eq = np.asarray(form.is_eq)
    np.testing.assert_allclose(v[eq], np.abs(vals[eq]))
    np.testing.assert_allclose(v[~eq], np.maximum(vals[~eq], 0))
    assert (v >= 0).all()


def test_better_lexicographic(form):
    rng = np.random.default_rng(3)
    x1 = rng.standard_normal(form.n)
    x2 = rng.standard_normal(form.n)
    got = np.asarray(core.better(form, jnp.asarray(x1), jnp.asarray(x2)))
    # independent re-derivation of the ordering
    tol = 1e-4
    v1 = int(float(core.max_violation(form, jnp.asarray(x1))) / tol)
    v2 = int(float(core.max_violation(form, jnp.asarray(x2))) / tol)
    f1 = float(core.eval_objective(form, jnp.asarray(x1)))
    f2 = float(core.eval_objective(form, jnp.asarray(x2)))
    if v1 < v2 or (v1 == v2 and f1 < f2):
        np.testing.assert_array_equal(got, x1)
    else:
        np.testing.assert_array_equal(got, x2)


def test_better_prefers_second_on_tie(form):
    x = np.ones(form.n)
    got = np.asarray(core.better(form, jnp.asarray(x * 1.0), jnp.asarray(x)))
    np.testing.assert_array_equal(got, x)


def test_homogeneous_form(form):
    rng = np.random.default_rng(4)
    x = rng.standard_normal(form.n)
    M = np.asarray(core.homogeneous_forms(form))
    xh = np.concatenate([x, [1.0]])
    vals = np.asarray(core.eval_all(form, jnp.asarray(x)))
    for k in range(form.m + 1):
        np.testing.assert_allclose(xh @ M[k] @ xh, vals[k], rtol=1e-10)


def test_dc_split_modes(form):
    P1, P2 = core.dc_split(form)
    np.testing.assert_allclose(np.asarray(P1 - P2), np.asarray(form.P), atol=1e-8)
    assert (np.linalg.eigvalsh(np.asarray(P1)) > -1e-8).all()
    assert (np.linalg.eigvalsh(np.asarray(P2)) > -1e-8).all()

    P1e, P2e = core.dc_split_eigen(form)
    np.testing.assert_allclose(np.asarray(P1e - P2e), np.asarray(form.P), atol=1e-8)
    assert (np.linalg.eigvalsh(np.asarray(P1e)) > -1e-8).all()
    assert (np.linalg.eigvalsh(np.asarray(P2e)) > -1e-8).all()
