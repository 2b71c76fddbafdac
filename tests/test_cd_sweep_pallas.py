import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qcqp_tpu.core import QCQPForm, max_violation
from qcqp_tpu.kernels.cd_sweep_pallas import phase1_sweeps
from qcqp_tpu.solvers.coord_descent_fused import coord_descent_phase1_fused


def _random_form(n, m, seed, eq_frac=0.5):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m + 1, n, n)) / np.sqrt(n)
    P = 0.5 * (A + np.swapaxes(A, -1, -2))
    q = rng.standard_normal((m + 1, n)) / np.sqrt(n)
    r = rng.standard_normal(m + 1)
    is_eq = rng.random(m) < eq_frac
    form = QCQPForm(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
                    jnp.asarray(r, jnp.float32), jnp.asarray(is_eq))
    eq_idx = tuple(int(i) for i in np.nonzero(is_eq)[0])
    return form, eq_idx, rng


def _viols(form, xs):
    return np.asarray(jax.vmap(lambda x: max_violation(form, x))(xs))


@pytest.mark.parametrize("n,m,eq_frac,seed",
                         [(12, 7, 0.5, 0), (9, 5, 0.0, 1), (10, 4, 1.0, 2)])
def test_mega_matches_fused_quality(n, m, eq_frac, seed):
    """Whole-sweep kernel reaches feasibility statistically on par with the
    per-coordinate fused kernel (identical acceptance rules; trajectories may
    diverge at ulp-tangency oracles)."""
    form, eq_idx, rng = _random_form(n, m, seed, eq_frac)
    R = 128
    xs = jnp.asarray(rng.standard_normal((R, n)), jnp.float32)

    x_old = coord_descent_phase1_fused(form, xs, num_iters=10,
                                       interpret=True, eq_idx=eq_idx)
    x_new = phase1_sweeps(form.P, form.q, form.r, eq_idx, xs, num_iters=10,
                          interpret=True)
    v0, v_old, v_new = _viols(form, xs), _viols(form, x_old), _viols(form, x_new)
    # never worse than the start (documented ~1e-3 boundary slop)
    assert (v_new <= v0 + 1e-3).all()
    # statistically on par with the per-coordinate kernel
    assert np.median(v_new) <= np.median(v_old) * 1.5 + 1e-2
    assert (v_new < 1e-2).mean() >= (v_old < 1e-2).mean() - 0.1


def test_mega_zero_sweeps_is_identity():
    form, eq_idx, rng = _random_form(8, 4, 3)
    xs = jnp.asarray(rng.standard_normal((128, 8)), jnp.float32)
    out = phase1_sweeps(form.P, form.q, form.r, eq_idx, xs, num_iters=0,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xs), atol=0)


def test_mega_feasible_start_untouched():
    """Lanes already under viol_tol never move (alive gate)."""
    form, eq_idx, rng = _random_form(6, 3, 4, eq_frac=0.0)
    # scale constraints so x=0 is strictly feasible: r <= -1 for inequalities
    P, q, r = (np.array(form.P), np.array(form.q), np.array(form.r))
    r[1:] = -1.0
    form = QCQPForm(jnp.asarray(P), jnp.asarray(q), jnp.asarray(r),
                    form.is_eq)
    xs = jnp.zeros((128, 6), jnp.float32)
    out = phase1_sweeps(form.P, form.q, form.r, eq_idx, xs, num_iters=5,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=0)
