import numpy as np
import pytest

from qcqp_tpu import native


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native lib unavailable (no g++?)")


@needs_native
def test_square_accumulate_matches_numpy():
    rng = np.random.default_rng(0)
    # force the native path by exceeding the size threshold
    s, n = 40, 50
    C = rng.standard_normal((s, n))
    d = rng.standard_normal(s)
    P = np.zeros((s, n, n)); q = np.zeros((s, n)); r = np.zeros(s)
    native.square_accumulate(C, d, 1.5, P, q, r)
    np.testing.assert_allclose(P, 1.5 * C[:, :, None] * C[:, None, :],
                               rtol=1e-12)
    np.testing.assert_allclose(q, 3.0 * d[:, None] * C, rtol=1e-12)
    np.testing.assert_allclose(r, 1.5 * d * d, rtol=1e-12)


@needs_native
def test_mul_accumulate_matches_numpy():
    rng = np.random.default_rng(1)
    s, n = 40, 50
    Ca, Cb = rng.standard_normal((2, s, n))
    da, db = rng.standard_normal((2, s))
    P = np.zeros((s, n, n)); q = np.zeros((s, n)); r = np.zeros(s)
    native.mul_accumulate(Ca, da, Cb, db, 2.0, P, q, r)
    expect = (Ca[:, :, None] * Cb[:, None, :]
              + Cb[:, :, None] * Ca[:, None, :])
    np.testing.assert_allclose(P, expect, rtol=1e-12)
    np.testing.assert_allclose(q, 2 * (da[:, None] * Cb + db[:, None] * Ca),
                               rtol=1e-12)
    np.testing.assert_allclose(r, 2 * da * db, rtol=1e-12)


@needs_native
def test_bank_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    count, n, m = 7, 6, 4
    P = rng.standard_normal((count, m + 1, n, n))
    q = rng.standard_normal((count, m + 1, n))
    r = rng.standard_normal((count, m + 1))
    eq = rng.random((count, m)) < 0.5
    path = str(tmp_path / "bank.qcqp")
    native.bank_write(path, P, q, r, eq)
    assert native.bank_info(path) == (count, n, m)
    P2, q2, r2, eq2 = native.bank_load(path, 2, 4)
    np.testing.assert_array_equal(P2, P[2:6])
    np.testing.assert_array_equal(q2, q[2:6])
    np.testing.assert_array_equal(r2, r[2:6])
    np.testing.assert_array_equal(eq2, eq[2:6])


def test_canonicalization_same_with_and_without_native(monkeypatch):
    import qcqp_tpu as qt
    rng = np.random.default_rng(3)
    A = rng.standard_normal((6, 5))
    x = qt.Variable(5)
    prob = qt.Problem(qt.Minimize(qt.sum_squares(A @ x)),
                      [qt.square(x) == 1, (x[0] + 1) * (x[1] - 2) <= 3])
    form1, _, _ = qt.canonicalize(prob)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load", lambda: None)
    form2, _, _ = qt.canonicalize(prob)
    np.testing.assert_allclose(np.asarray(form1.P), np.asarray(form2.P),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(form1.q), np.asarray(form2.q),
                               atol=1e-12)
