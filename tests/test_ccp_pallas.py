"""Whole-improve Pallas CCP mega-kernel tests (interpret mode on CPU).

Contract (mirrors the fused-ADMM test strategy, tests/test_admm_pallas.py):
lockstep pointwise parity with the vmapped solvers/ccp.py at matched knobs
(warm_inner=False, same caps, full 64-lane tile so the lockstep group is
identical), quality assertions on a seeded boolean-LS instance at the fused
defaults, and the VMEM-guard fallback.  Reference behavior matched:
qcqp/qcqp.py:288-322.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qcqp_tpu.core import (QCQPForm, make_form, random_form, max_violation,
                           eval_objective)
from qcqp_tpu.solvers.ccp import improve_ccp
from qcqp_tpu.kernels.ccp_pallas import (CCPFusedData, ccp_fused_fits,
                                         improve_ccp_fused, L_TILE)


@pytest.mark.parametrize("n,m,eqf,seed", [
    (8, 5, 0.5, 0), (6, 4, 1.0, 1), (9, 7, 0.3, 2)])
def test_lockstep_parity_vs_vmapped(n, m, eqf, seed):
    """Pointwise parity with solvers/ccp.py at matched knobs.  A full
    L_TILE-lane batch makes the kernel's tile-lockstep group identical to
    jax.vmap's whole-batch lockstep; small caps bound the chaotic
    amplification of f32 summation-order differences (measured: eps-level
    at 1 outer, ~6e-5 by 3x20)."""
    rng = np.random.default_rng(seed)
    form = random_form(rng, n=n, m=m, eq_frac=eqf, dtype=np.float32)
    xs = jnp.asarray(rng.standard_normal((L_TILE, n)), jnp.float32)
    kw = dict(max_iter=3, inner_iters=20)
    ref = jax.vmap(lambda x: improve_ccp(form, x, **kw))(xs)
    # n_newton=15 matches the vmapped _hinge_prox trip count (the fused
    # default is the measured-better 5-trip inexact prox, round 5)
    out = improve_ccp_fused(form, xs, warm_inner=False, interpret=True,
                            n_newton=15, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=5e-4)


def test_boolean_ls_quality_at_fused_defaults():
    """At the fused defaults (warm inner duals, 10-trip inner solves) the
    kernel drives a seeded boolean-LS instance feasible with a sane
    objective — the quality bar the 18.7x throughput claim rides on."""
    np.random.seed(1)
    n, m = 6, 9
    A = np.random.randn(m, n)
    b = np.random.randn(m, 1).ravel()
    P = np.zeros((n + 1, n, n))
    P[0] = A.T @ A
    for i in range(n):
        P[1 + i, i, i] = 1.0
    q = np.zeros((n + 1, n))
    q[0] = -2.0 * A.T @ b
    r = np.zeros(n + 1)
    r[0] = float(b @ b)
    r[1:] = -1.0
    form = QCQPForm(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
                    jnp.asarray(r, jnp.float32), jnp.asarray(np.ones(n, bool)))
    xs = jax.random.normal(jax.random.PRNGKey(5), (8, n), jnp.float32)
    out = improve_ccp_fused(form, xs, max_iter=45, interpret=True)
    v = jax.vmap(lambda x: max_violation(form, x))(out)
    f = jax.vmap(lambda x: eval_objective(form, x))(out)
    # brute-force optimum for the quality floor
    best = np.inf
    for bits in range(1 << n):
        s = np.array([1.0 if bits >> i & 1 else -1.0 for i in range(n)])
        best = min(best, float(np.sum((A @ s - b) ** 2)))
    feas = np.asarray(v) < 1e-2
    assert feas.sum() >= 6          # most restarts land feasible
    assert float(np.min(np.where(feas, np.asarray(f), np.inf))) <= 3 * best


def test_vmem_guard_falls_back_to_vmapped(monkeypatch):
    import qcqp_tpu.kernels.ccp_pallas as cp
    import qcqp_tpu.solvers.ccp as ccp_mod
    assert not ccp_fused_fits(600, 4, 2)       # n past the guard
    assert ccp_fused_fits(100, 50, 25)         # bench shape fits

    calls = []
    orig = ccp_mod.improve_ccp

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(ccp_mod, "improve_ccp", spy)
    monkeypatch.setattr(cp, "ccp_fused_fits", lambda n, m, E: False)
    rng = np.random.default_rng(3)
    form = random_form(rng, n=6, m=3, eq_frac=0.5, dtype=np.float32)
    xs = jnp.asarray(rng.standard_normal((2, 6)), jnp.float32)
    out = improve_ccp_fused(form, xs, max_iter=2, inner_iters=5)
    assert calls and out.shape == (2, 6)


def test_api_routes_dccp_through_fused(monkeypatch):
    """QCQP.improve(DCCP) reaches the mega-kernel when the fused default
    is on (accelerator+f32 in production; forced here)."""
    import qcqp_tpu as qt
    import qcqp_tpu.api as api_mod
    import qcqp_tpu.kernels.ccp_pallas as cp

    calls = []
    orig = cp.improve_ccp_fused

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(cp, "improve_ccp_fused", spy)

    np.random.seed(1)
    x = qt.Variable(3)
    prob = qt.Problem(qt.Minimize(qt.sum_squares(x)),
                      [qt.square(x) == 1])
    q = qt.QCQP(prob, dtype=np.float32)
    q.suggest(qt.RANDOM)
    # the fused defaults (10-trip warm inner solves) need their full
    # default outer budget; capping max_iter=30 leaves tau too small
    f, v = q.improve(qt.DCCP, use_fused=True, interpret=True)
    assert calls
    assert v < 1e-2
