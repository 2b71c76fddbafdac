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


def _convex_ineq_form(n, m, seed):
    """Inequality-only instance with convex (PSD) constraints: both paths'
    trajectories are contraction-like and cannot diverge in a few steps, so
    pointwise (lockstep) comparison is meaningful."""
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((m, n, n)) / np.sqrt(n)
    Pc = np.einsum("mij,mkj->mik", B, B) + 0.1 * np.eye(n)
    A0 = rng.standard_normal((n, n)) / np.sqrt(n)
    P0 = A0 @ A0.T + 0.1 * np.eye(n)
    P = np.concatenate([P0[None], Pc])
    q = rng.standard_normal((m + 1, n)) / np.sqrt(n)
    r = np.concatenate([rng.standard_normal(1), -np.abs(rng.standard_normal(m)) - 0.5])
    is_eq = np.zeros(m, bool)
    return QCQPForm(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
                    jnp.asarray(r, jnp.float32), jnp.asarray(is_eq))


@pytest.mark.parametrize("n,m,iters", [
    (8, 6, 1),      # m > _CHUNK, not a chunk multiple
    (33, 7, 1),     # odd n, padded m
    (120, 12, 1),   # n near the 128 VMEM cap, m across 3 chunks
    (8, 6, 3),      # a few lockstep iterations still match pointwise
])
def test_fused_admm_lockstep_parity(n, m, iters):
    """LOCKSTEP (pointwise) parity against the vmapped XLA path, per
    VERDICT r2 item 6: with convex inequality-only constraints and few
    iterations the trajectories cannot diverge, so kernel bugs cannot hide
    behind the distributional 3e-2 tolerance of the nonconvex tests."""
    form = _convex_ineq_form(n, m, seed=n + m)
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.standard_normal((4, n)), jnp.float32)
    # nw_trips=12 converges the secular root to f32 exactness, matching
    # the unfused path (the fused default is the measured-better 6-trip
    # inexact projection, round 5)
    xf = np.asarray(improve_admm_fused(form, xs, num_iters=iters,
                                       nw_trips=12, interpret=True))
    xu = np.asarray(improve_admm_batch(form, xs, num_iters=iters))
    scale = np.abs(xu).max() + 1.0
    # single-step: ~f32 roundoff; multi-step: roundoff compounds per
    # iteration (~1e-4/iter observed), still pointwise and far below the
    # 3e-2 distributional tolerance of the nonconvex tests
    atol = (2e-5 if iters == 1 else 3e-4 * iters) * scale
    np.testing.assert_allclose(xf, xu, atol=atol, rtol=0)


def test_fused_admm_wide_root_rescue():
    """A constraint whose secular root lies beyond |nu| = 2^10 (the fixed
    doubling budget) must still project correctly via the x1024 rescue jumps
    (ADVICE r2): negative-semidefinite row -> s-side unbounded, tiny |lam|
    pushes the root far out."""
    n = 4
    lam_small = 1e-4
    P1 = -lam_small * np.eye(n)            # concave constraint, lmax <= 0
    P = np.stack([np.eye(n), P1])
    q = np.zeros((2, n))
    r = np.array([0.0, 0.25])              # -lam_small ||x||^2 + 0.25 <= 0
    form = QCQPForm(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
                    jnp.asarray(r, jnp.float32), jnp.asarray(np.zeros(1, bool)))
    # projection of the origin-ish point onto ||x||^2 >= 0.25/lam_small = 2500
    xs = jnp.asarray(0.01 * np.ones((1, n)), jnp.float32)
    out = np.asarray(improve_admm_fused(form, xs, num_iters=200,
                                        interpret=True))
    v = float(max_violation(form, jnp.asarray(out[0])))
    assert np.isfinite(out).all()
    assert v < 1e-2


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


def test_fused_admm_vmem_guard_fallback(monkeypatch):
    """Problems whose working set exceeds the VMEM budget route to the
    vmapped XLA improve instead of failing to compile (round-3 guard)."""
    from qcqp_tpu.kernels import admm_pallas as ap
    import qcqp_tpu.solvers.admm as admm_mod
    assert not ap.admm_fused_fits(1030, 4)       # n past the lane budget
    assert ap.admm_fused_fits(100, 50)           # bench shape fits

    calls = []
    orig = admm_mod.improve_admm_batch

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(admm_mod, "improve_admm_batch", spy)
    form = _random_form(12, 4, seed=11)
    monkeypatch.setattr(ap, "admm_fused_fits", lambda n, m: False)
    xs = jnp.asarray(np.random.default_rng(0).standard_normal((2, 12)),
                     jnp.float32)
    out = improve_admm_fused(form, xs, num_iters=20)
    assert calls, "VMEM guard did not fall back to the vmapped path"
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
