"""Fused whole-phase ADMM Pallas kernels vs the vmapped XLA path.

Both implement the reference driver (qcqp/qcqp.py:195-285); agreement is
statistical at f32 (same projections, same better-folds; separately compiled
float expressions can differ by ulps at bisection boundaries).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qcqp_tpu import core
from qcqp_tpu.core import QCQPForm, max_violation, eval_objective
from qcqp_tpu.solvers.admm import improve_admm_batch, improve_admm
from qcqp_tpu.kernels.admm_pallas import improve_admm_fused


def _random_form(n, m, seed, eq_frac=0.5):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m + 1, n, n)) / np.sqrt(n)
    P = 0.5 * (A + np.swapaxes(A, -1, -2))
    q = rng.standard_normal((m + 1, n)) / np.sqrt(n)
    r = rng.standard_normal(m + 1)
    is_eq = rng.random(m) < eq_frac
    return QCQPForm(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
                    jnp.asarray(r, jnp.float32), jnp.asarray(is_eq))


@pytest.mark.parametrize("seed,eq_frac", [(0, 0.5), (1, 0.0), (2, 1.0)])
def test_fused_admm_matches_vmapped(seed, eq_frac):
    """Parity is STATISTICAL (SURVEY.md section 7 'hard part 4'): the fused
    kernel's Newton projections and the vmapped path's 1e-6 bisections
    differ by ~1e-7 per projection, which nonconvex consensus iterations
    amplify into different per-lane trajectories.  The contract is equal
    violation distributions and best-restart quality, not pointwise state."""
    form = _random_form(8, 6, seed, eq_frac)
    rng = np.random.default_rng(seed + 100)
    xs = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)
    xf = improve_admm_fused(form, xs, num_iters=100, interpret=True)
    xu = improve_admm_batch(form, xs, num_iters=100)
    vf = np.asarray(jax.vmap(lambda z: max_violation(form, z))(xf))
    vu = np.asarray(jax.vmap(lambda z: max_violation(form, z))(xu))
    # violation distributions match across the restart batch
    np.testing.assert_allclose(np.sort(vf), np.sort(vu), atol=3e-2)
    # the best restart is as good (lexicographic order, coarse buckets)
    assert np.floor(vf.min() / 1e-2) <= np.floor(vu.min() / 1e-2)
    if eq_frac == 0.0:
        # pure-inequality runs converge exactly in both paths
        ff = np.asarray(jax.vmap(lambda z: eval_objective(form, z))(xf))
        fu = np.asarray(jax.vmap(lambda z: eval_objective(form, z))(xu))
        feas = (vf < 1e-2) & (vu < 1e-2)
        assert feas.any()
        fu_best = fu[feas].min()
        assert ff[feas].min() <= fu_best + 1e-2 + 5e-3 * abs(fu_best)


def test_fused_admm_never_worse_than_start():
    form = _random_form(10, 7, 5)
    rng = np.random.default_rng(9)
    xs = jnp.asarray(rng.standard_normal((4, 10)), jnp.float32)
    out = improve_admm_fused(form, xs, num_iters=60, interpret=True)
    for i in range(4):
        # the better-folds guarantee the result is >= the start under the
        # lexicographic order (reference: qcqp.py:281,284-285)
        b = core.better(form, out[i], xs[i])
        np.testing.assert_array_equal(np.asarray(b), np.asarray(out[i]))


def test_fused_admm_padding():
    form = _random_form(6, 4, 3)
    rng = np.random.default_rng(4)
    for R in (1, 3):
        xs = jnp.asarray(rng.standard_normal((R, 6)), jnp.float32)
        out = improve_admm_fused(form, xs, num_iters=30, interpret=True)
        assert out.shape == (R, 6)
        assert np.isfinite(np.asarray(out)).all()


def test_fused_admm_phase1_false():
    """phase1=False skips straight to the objective phase (the reference
    improve kwarg, qcqp.py:255)."""
    form = _random_form(6, 4, 7)
    rng = np.random.default_rng(8)
    xs = jnp.asarray(np.sign(rng.standard_normal((2, 6))), jnp.float32)
    out = improve_admm_fused(form, xs, num_iters=40, phase1=False,
                             interpret=True)
    assert out.shape == (2, 6)
    assert np.isfinite(np.asarray(out)).all()
