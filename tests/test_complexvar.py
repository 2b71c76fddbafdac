"""Complex-variable sugar: parity with manual realification.

The reference realifies complex beamforming by hand (reference:
examples/secondary_user_beamforming.py:18-42); these tests pin that the sugar
emits the same real quadratic model.
"""
import numpy as np
import pytest

import qcqp_tpu as qt
from qcqp_tpu import core
from qcqp_tpu.expressions import canonicalize


def _eval(prob, xflat):
    import jax.numpy as jnp
    form, layout, maximize, = canonicalize(prob)
    vals = np.asarray(core.eval_all(form, jnp.asarray(xflat)))
    return form, layout, maximize, vals


def test_abs2_of_hermitian_inner_product():
    rng = np.random.default_rng(0)
    n = 6
    h = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    z = qt.ComplexVariable(n)
    # |h^H z|^2 as sugar
    e = qt.abs2(np.conj(h) @ z)
    prob = qt.Problem(qt.Minimize(e))
    zv = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    xflat = np.concatenate([zv.real, zv.imag])
    _, _, _, vals = _eval(prob, xflat)
    np.testing.assert_allclose(vals[0], abs(np.vdot(h, zv)) ** 2, rtol=1e-10)


def test_sum_abs2_matches_norm():
    rng = np.random.default_rng(1)
    n, m = 5, 3
    A = rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    z = qt.ComplexVariable(n)
    prob = qt.Problem(qt.Minimize(qt.sum_abs2(A @ z - b)))
    zv = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    xflat = np.concatenate([zv.real, zv.imag])
    _, _, _, vals = _eval(prob, xflat)
    np.testing.assert_allclose(vals[0], np.linalg.norm(A @ zv - b) ** 2,
                               rtol=1e-10)


def test_cquad_form_hermitian():
    rng = np.random.default_rng(2)
    n = 4
    M = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = M + M.conj().T   # Hermitian
    z = qt.ComplexVariable(n)
    prob = qt.Problem(qt.Minimize(qt.cquad_form(z, H)))
    zv = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    xflat = np.concatenate([zv.real, zv.imag])
    _, _, _, vals = _eval(prob, xflat)
    np.testing.assert_allclose(vals[0], np.real(zv.conj() @ H @ zv), rtol=1e-9)
    with pytest.raises(ValueError):
        qt.cquad_form(z, M)  # non-Hermitian rejected


def test_complex_equality_splits_and_value_roundtrip():
    rng = np.random.default_rng(3)
    n = 3
    c = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    z = qt.ComplexVariable(n)
    prob = qt.Problem(qt.Minimize(qt.sum_abs2(z)), [z == c])
    form, layout, _, = canonicalize(prob)
    assert form.m == 2 * n     # re and im rows
    xflat = np.concatenate([c.real, c.imag])
    import jax.numpy as jnp
    vals = np.asarray(core.eval_all(form, jnp.asarray(xflat)))
    np.testing.assert_allclose(vals[1:], 0.0, atol=1e-12)
    layout.assign(xflat)
    np.testing.assert_allclose(z.value, c, rtol=1e-12)
    z.value = 2 * c
    np.testing.assert_allclose(z.re_var.value, 2 * c.real)


def test_complex_times_complex_elementwise():
    rng = np.random.default_rng(4)
    n = 3
    z = qt.ComplexVariable(n)
    w = qt.ComplexVariable(n)
    # real part of z * conj(w), summed — a real quadratic
    prod = z * w.conj()
    e = qt.sum_entries(prod.re)
    prob = qt.Problem(qt.Minimize(e))
    zv = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    wv = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    # variable order follows first appearance in the atoms, so place values
    # by layout offset instead of assuming [z.re, z.im, w.re, w.im]
    form, layout, _ = canonicalize(prob)
    xflat = np.zeros(layout.n)
    for var, val in [(z.re_var, zv.real), (z.im_var, zv.imag),
                     (w.re_var, wv.real), (w.im_var, wv.imag)]:
        off = layout.offset[var]
        xflat[off:off + var.size] = val
    import jax.numpy as jnp
    vals = np.asarray(core.eval_all(form, jnp.asarray(xflat)))
    np.testing.assert_allclose(vals[0], np.sum((zv * wv.conj()).real),
                               rtol=1e-10)


def test_beamforming_sugar_matches_manual_realification():
    """The reference's beamforming encoding (reference:
    examples/secondary_user_beamforming.py:36-42) vs the sugar, same seed."""
    rng = np.random.default_rng(5)
    n, m, l = 4, 3, 2
    tau, eta = 20.0, 2.0
    H = (rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))) / np.sqrt(2)
    G = (rng.standard_normal((l, n)) + 1j * rng.standard_normal((l, n))) / np.sqrt(2)

    # sugar model
    z = qt.ComplexVariable(n)
    cons = [qt.abs2(np.conj(H[i]) @ z) >= tau for i in range(m)]
    cons += [qt.abs2(np.conj(G[i]) @ z) <= eta for i in range(l)]
    prob_s = qt.Problem(qt.Minimize(qt.sum_abs2(z)), cons)

    # manual realification (the reference pattern)
    x = qt.Variable(2 * n)
    def rows(h):
        hr = np.concatenate([h.real, h.imag])
        hi = np.concatenate([-h.imag, h.real])
        return hr, hi
    mcons = []
    for i in range(m):
        hr, hi = rows(H[i])
        mcons.append(qt.square(hr @ x) + qt.square(hi @ x) >= tau)
    for i in range(l):
        gr, gi = rows(G[i])
        mcons.append(qt.square(gr @ x) + qt.square(gi @ x) <= eta)
    prob_m = qt.Problem(qt.Minimize(qt.sum_squares(x)), mcons)

    fs, _, _ = canonicalize(prob_s)
    fm, _, _ = canonicalize(prob_m)
    np.testing.assert_allclose(np.asarray(fs.P), np.asarray(fm.P), atol=1e-12)
    np.testing.assert_allclose(np.asarray(fs.q), np.asarray(fm.q), atol=1e-12)
    np.testing.assert_allclose(np.asarray(fs.r), np.asarray(fm.r), atol=1e-12)
    assert (np.asarray(fs.is_eq) == np.asarray(fm.is_eq)).all()


def test_complex_solve_end_to_end():
    """Unconstrained complex LS solved by the handler lands on the LS optimum."""
    rng = np.random.default_rng(6)
    n, m = 3, 5
    A = rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    z = qt.ComplexVariable(n)
    prob = qt.Problem(qt.Minimize(qt.sum_abs2(A @ z - b)))
    qc = qt.QCQP(prob, seed=0, check_dcp=False)
    qc.suggest(qt.RANDOM)
    f, v = qc.improve(qt.COORD_DESCENT)
    zls, *_ = np.linalg.lstsq(A, b, rcond=None)
    f_opt = np.linalg.norm(A @ zls - b) ** 2
    assert v < 1e-8
    assert f <= f_opt + 1e-4
    np.testing.assert_allclose(z.value, zls, atol=2e-3)
