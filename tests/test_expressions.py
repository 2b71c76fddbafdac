import numpy as np
import pytest

import qcqp_tpu as qt
from qcqp_tpu import core
from qcqp_tpu.expressions import canonicalize


def canon_eval(prob, xflat):
    """Evaluate canonical objective/constraint rows at a flat point."""
    form, layout, maximize = canonicalize(prob)
    import jax.numpy as jnp
    vals = np.asarray(core.eval_all(form, jnp.asarray(xflat)))
    return form, layout, maximize, vals


def test_affine_canon_simple():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((3, 4))
    b = rng.standard_normal(3)
    x = qt.Variable(4)
    prob = qt.Problem(qt.Minimize(qt.sum_squares(A @ x - b)))
    xv = rng.standard_normal(4)
    form, layout, maximize, vals = canon_eval(prob, xv)
    assert not maximize
    np.testing.assert_allclose(vals[0], np.sum((A @ xv - b) ** 2), rtol=1e-10)
    assert form.m == 0


def test_square_elementwise_constraint_split():
    x = qt.Variable(3)
    prob = qt.Problem(qt.Minimize(qt.sum_squares(x)), [qt.square(x) == 1])
    xv = np.array([2.0, -1.0, 0.5])
    form, layout, maximize, vals = canon_eval(prob, xv)
    assert form.m == 3
    np.testing.assert_allclose(vals[1:], xv ** 2 - 1, rtol=1e-12)
    assert np.asarray(form.is_eq).all()


def test_maximize_negates():
    x = qt.Variable(2)
    W = np.array([[2.0, 0.5], [0.5, 1.0]])
    prob = qt.Problem(qt.Maximize(qt.quad_form(x, W)), [qt.square(x) <= 1])
    xv = np.array([0.3, -0.7])
    form, layout, maximize, vals = canon_eval(prob, xv)
    assert maximize
    np.testing.assert_allclose(vals[0], -(xv @ W @ xv), rtol=1e-12)


def test_affine_times_affine():
    x = qt.Variable(2)
    e = (x[0] + 1) * (x[1] - 2)
    prob = qt.Problem(qt.Minimize(e))
    xv = np.array([3.0, 5.0])
    _, _, _, vals = canon_eval(prob, xv)
    np.testing.assert_allclose(vals[0], (3 + 1) * (5 - 2), rtol=1e-12)


def test_matrix_variable_indexing_fortran_order():
    X = qt.Variable(2, 3)
    col_diff = X[:, 0] - X[:, 2]
    prob = qt.Problem(qt.Minimize(qt.sum_squares(col_diff)),
                      [X >= 0])
    form, layout, maximize = canonicalize(prob)
    # variables flatten column-major
    Xv = np.arange(6.0).reshape(2, 3)
    xflat = Xv.ravel(order="F")
    import jax.numpy as jnp
    vals = np.asarray(core.eval_all(form, jnp.asarray(xflat)))
    np.testing.assert_allclose(vals[0], np.sum((Xv[:, 0] - Xv[:, 2]) ** 2))
    # constraint rows: -X <= 0 elementwise, Fortran order
    np.testing.assert_allclose(vals[1:], -xflat)
    # assign round-trip
    layout.assign(xflat)
    np.testing.assert_allclose(X.value, Xv)
    np.testing.assert_allclose(layout.flatten(), xflat)


def test_sum_entries_and_mul_elemwise():
    rng = np.random.default_rng(1)
    W = rng.standard_normal((3, 3))
    x = qt.Variable(3)
    expr = 0.25 * (qt.sum_entries(np.asarray(W)) - qt.quad_form(x, W + W.T))
    prob = qt.Problem(qt.Maximize(expr), [qt.square(x) == 1])
    xv = rng.standard_normal(3)
    _, _, _, vals = canon_eval(prob, xv)
    expect = 0.25 * (W.sum() - xv @ (W + W.T) @ xv)
    np.testing.assert_allclose(vals[0], -expect, rtol=1e-10)


def test_quad_over_lin_and_matrix_frac_and_power():
    rng = np.random.default_rng(2)
    x = qt.Variable(3)
    S = np.eye(3) * 2.0
    xv = rng.standard_normal(3)

    prob = qt.Problem(qt.Minimize(qt.quad_over_lin(x, 4.0)))
    _, _, _, vals = canon_eval(prob, xv)
    np.testing.assert_allclose(vals[0], np.sum(xv ** 2) / 4.0)

    prob = qt.Problem(qt.Minimize(qt.matrix_frac(x, S)))
    _, _, _, vals = canon_eval(prob, xv)
    np.testing.assert_allclose(vals[0], xv @ np.linalg.inv(S) @ xv)

    prob = qt.Problem(qt.Minimize(qt.sum_entries(qt.power(x, 2))))
    _, _, _, vals = canon_eval(prob, xv)
    np.testing.assert_allclose(vals[0], np.sum(xv ** 2))


def test_scalar_variable_and_broadcast_constraints():
    X = qt.Variable(2, 4)
    r = qt.Variable()
    B = 10.0
    cons = [X >= r, X <= B - r, r >= 0]
    prob = qt.Problem(qt.Maximize(r), cons)
    form, layout, maximize = canonicalize(prob)
    # 8 + 8 + 1 scalar constraints
    assert form.m == 17
    Xv = np.arange(8.0).reshape(2, 4)
    rv = 2.5
    X.value, r.value = Xv, rv
    xflat = layout.flatten()
    import jax.numpy as jnp
    vals = np.asarray(core.eval_all(form, jnp.asarray(xflat)))
    np.testing.assert_allclose(vals[0], -rv)
    np.testing.assert_allclose(vals[1:9], rv - Xv.ravel(order="F"))
    np.testing.assert_allclose(vals[9:17], Xv.ravel(order="F") - (B - rv))
    np.testing.assert_allclose(vals[17], -rv)


def test_nonconvex_ge_constraint():
    # square(2r) <= sum_squares(Xi - Xj) becomes quad - quad <= 0
    X = qt.Variable(2, 2)
    rr = qt.Variable()
    c = qt.square(2 * rr) <= qt.sum_squares(X[:, 0] - X[:, 1])
    prob = qt.Problem(qt.Maximize(rr), [c])
    form, layout, maximize = canonicalize(prob)
    Xv = np.array([[0.0, 3.0], [0.0, 4.0]])
    rv = 2.0
    X.value, rr.value = Xv, rv
    xflat = layout.flatten()
    import jax.numpy as jnp
    vals = np.asarray(core.eval_all(form, jnp.asarray(xflat)))
    np.testing.assert_allclose(vals[1], (2 * rv) ** 2 - 25.0)


def test_variables_order_of_first_appearance():
    a = qt.Variable(2, name="a")
    b = qt.Variable(3, name="b")
    prob = qt.Problem(qt.Minimize(qt.sum_squares(b)), [a >= 0])
    vs = prob.variables()
    assert vs[0] is b and vs[1] is a


def test_dcp_warning_detection():
    x = qt.Variable(2)
    convex = qt.Problem(qt.Minimize(qt.sum_squares(x)), [x >= 0])
    assert convex.is_dcp()
    nonconvex = qt.Problem(qt.Minimize(qt.sum_squares(x)), [qt.square(x) == 1])
    assert not nonconvex.is_dcp()
