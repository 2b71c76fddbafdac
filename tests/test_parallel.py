import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qcqp_tpu as qt
from qcqp_tpu import core
from qcqp_tpu.parallel import (
    make_mesh, best_point, suggest_batch, improve_chain, solve_restarts,
    admm_phase1_sharded,
)
from .test_cd import boolean_ls_form


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8
    assert jax.devices()[0].platform == "cpu"


def test_best_point_lexicographic():
    form, _, _ = boolean_ls_form(n=5, m=7, seed=0)
    rng = np.random.default_rng(0)
    xs = np.concatenate([
        rng.standard_normal((6, form.n)),            # infeasible-ish
        np.sign(rng.standard_normal((2, form.n))),   # feasible
    ])
    x, f, v = best_point(form, jnp.asarray(xs))
    # winner must be one of the feasible rows with smaller objective
    f6 = float(core.eval_objective(form, jnp.asarray(xs[6])))
    f7 = float(core.eval_objective(form, jnp.asarray(xs[7])))
    expect = xs[6] if f6 <= f7 else xs[7]
    np.testing.assert_array_equal(np.asarray(x), expect)
    assert float(v) < 1e-9


def test_suggest_batch_shapes_and_stats():
    form, _, _ = boolean_ls_form(n=6, m=8, seed=1)
    key = jax.random.PRNGKey(0)
    xs = suggest_batch(form, 512, key, qt.RANDOM)
    assert xs.shape == (512, 6)
    assert abs(float(xs.mean())) < 0.1
    assert abs(float(xs.std()) - 1.0) < 0.1


def test_solve_restarts_unsharded():
    form, A, b = boolean_ls_form(n=8, m=12, seed=3)
    best = np.inf
    for bits in range(1 << 8):
        s = np.array([1.0 if bits >> i & 1 else -1.0 for i in range(8)])
        best = min(best, float(np.sum((A @ s - b) ** 2)))
    x, f, v = solve_restarts(form, 64, jax.random.PRNGKey(0))
    assert float(v) < 1e-2
    assert float(f) <= best * 1.05 + 1e-9


def test_solve_restarts_fused_path():
    """use_fused routes CD through the Pallas kernel (interpret on CPU) and
    still reaches the boolean-LS optimum region."""
    form, A, b = boolean_ls_form(n=8, m=12, seed=3)
    form32 = core.QCQPForm(form.P.astype(jnp.float32),
                           form.q.astype(jnp.float32),
                           form.r.astype(jnp.float32), form.is_eq)
    eq_idx = tuple(int(i) for i in np.nonzero(np.asarray(form.is_eq))[0])
    x, f, v = solve_restarts(form32, 128, jax.random.PRNGKey(0),
                             use_fused=True, eq_idx=eq_idx, interpret=True,
                             num_iters=30)
    assert float(v) < 1e-2
    x_ref, f_ref, v_ref = solve_restarts(form32, 128, jax.random.PRNGKey(0),
                                         use_fused=False, num_iters=30)
    assert float(f) <= float(f_ref) * 1.1 + 1e-6


def test_solve_restarts_fused_sharded():
    """Mesh + use_fused maps the Pallas chain per shard (shard_map) and
    matches the unsharded fused run's best point quality."""
    form, A, b = boolean_ls_form(n=8, m=12, seed=3)
    form32 = core.QCQPForm(form.P.astype(jnp.float32),
                           form.q.astype(jnp.float32),
                           form.r.astype(jnp.float32), form.is_eq)
    eq_idx = tuple(int(i) for i in np.nonzero(np.asarray(form.is_eq))[0])
    kw = dict(use_fused=True, eq_idx=eq_idx, interpret=True, num_iters=30)
    key = jax.random.PRNGKey(2)
    x0, f0, v0 = solve_restarts(form32, 256, key, **kw)
    x1, f1, v1 = solve_restarts(form32, 256, key, mesh=make_mesh(), **kw)
    assert float(v1) < 1e-2
    # same suggest keys; sharding must not change the best point
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1), atol=1e-6)


def test_fused_auto_on_under_mesh(monkeypatch):
    """With an accelerator-like _fused_default, solve_restarts(mesh=...)
    engages the fused CD path automatically (no explicit use_fused=True) —
    ROADMAP 5b / VERDICT r1 item 5."""
    from qcqp_tpu.parallel import restarts as rmod
    form, _, _ = boolean_ls_form(n=8, m=12, seed=3)
    form32 = core.QCQPForm(form.P.astype(jnp.float32),
                           form.q.astype(jnp.float32),
                           form.r.astype(jnp.float32), form.is_eq)
    monkeypatch.setattr(rmod, "_fused_default", lambda form: True)

    import qcqp_tpu.solvers.coord_descent_fused as cdf
    calls = []
    orig = cdf.improve_coord_descent_fused

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(cdf, "improve_coord_descent_fused", spy)
    x, f, v = solve_restarts(form32, 128, jax.random.PRNGKey(0),
                             mesh=make_mesh(), interpret=True, num_iters=10)
    assert calls, "fused kernel was not engaged under the mesh"
    assert float(v) < 1e-2


def test_admm_fused_auto_on(monkeypatch):
    """With an accelerator-like _fused_default, solve_restarts(improve=ADMM)
    routes through the whole-phase Pallas mega-kernel — VERDICT r2 item 2."""
    from qcqp_tpu.parallel import restarts as rmod
    form, _, _ = boolean_ls_form(n=8, m=12, seed=3)
    form32 = core.QCQPForm(form.P.astype(jnp.float32),
                           form.q.astype(jnp.float32),
                           form.r.astype(jnp.float32), form.is_eq)
    monkeypatch.setattr(rmod, "_fused_default", lambda form: True)

    import qcqp_tpu.kernels.admm_pallas as ap
    calls = []
    orig = ap.improve_admm_fused

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(ap, "improve_admm_fused", spy)
    # improve_chain imports the symbol inside the function body, so patch at
    # the source module; single-device and mesh routes both engage it.
    x, f, v = solve_restarts(form32, 128, jax.random.PRNGKey(0),
                             improve=qt.ADMM, interpret=True, num_iters=10)
    assert calls, "fused ADMM was not engaged on the single-device path"
    calls.clear()
    x, f, v = solve_restarts(form32, 128, jax.random.PRNGKey(0),
                             improve=[qt.COORD_DESCENT, qt.ADMM],
                             mesh=make_mesh(), interpret=True, num_iters=10)
    assert calls, "fused ADMM was not engaged under the mesh"
    assert np.asarray(x).shape == (form.n,)
    assert np.isfinite(float(f))


def test_handler_improve_admm_fused(monkeypatch):
    """QCQP.improve(ADMM) routes through the mega kernel when fused is on
    (use_fused=True mimics the accelerator default on the CPU backend)."""
    n = 6
    rng = np.random.default_rng(0)
    A = rng.standard_normal((9, n))
    b = rng.standard_normal(9)
    x = qt.Variable(n)
    prob = qt.Problem(qt.Minimize(qt.sum_squares(A @ x - b)),
                      [qt.square(x) == 1])
    q = qt.QCQP(prob, dtype=np.float32)
    q.suggest(qt.RANDOM)

    import qcqp_tpu.kernels.admm_pallas as ap
    calls = []
    orig_improve = ap.improve_admm_fused

    def spy(*a, **kw):
        calls.append(1)
        return orig_improve(*a, **kw)

    monkeypatch.setattr(ap, "improve_admm_fused", spy)
    f1, v1 = q.improve(qt.ADMM, use_fused=True, interpret=True, num_iters=60)
    assert calls, "handler ADMM did not hit the fused kernel"
    assert np.isfinite(f1)
    # same rho cache key reused on the second call
    q.improve(qt.ADMM, use_fused=True, interpret=True, num_iters=60)
    assert len(q._admm_fused) == 1


def test_fused_sharded_padding_edges(monkeypatch):
    """Restart counts that are neither device- nor lane-multiples pad
    correctly through the shard_map + in-kernel padding layers."""
    form, _, _ = boolean_ls_form(n=6, m=9, seed=7)
    form32 = core.QCQPForm(form.P.astype(jnp.float32),
                           form.q.astype(jnp.float32),
                           form.r.astype(jnp.float32), form.is_eq)
    eq_idx = tuple(int(i) for i in np.nonzero(np.asarray(form.is_eq))[0])
    kw = dict(use_fused=True, eq_idx=eq_idx, interpret=True, num_iters=5)
    for R in (1, 7, 130):   # 1 restart; sub-device; over one lane tile
        x, f, v = solve_restarts(form32, R, jax.random.PRNGKey(R),
                                 mesh=make_mesh(), **kw)
        assert np.asarray(x).shape == (form.n,)
        assert np.isfinite(float(f))


def test_improve_chain_forwards_stage_kwargs(monkeypatch):
    """Chained improve forwards the filtered kwargs to the DCCP and IPOPT
    stages like QCQP._improve_one does (VERDICT r1 item 6)."""
    form, _, _ = boolean_ls_form(n=4, m=6, seed=9)
    xs = jnp.asarray(np.random.default_rng(0).standard_normal((2, form.n)))

    seen = {}

    import qcqp_tpu.solvers.ccp as ccp_mod
    import qcqp_tpu.solvers.nlp as nlp_mod

    def fake_ccp(form, x, **kw):
        seen.setdefault("ccp", kw)
        return x

    def fake_nlp(form, x, **kw):
        seen.setdefault("nlp", kw)
        return x

    monkeypatch.setattr(ccp_mod, "improve_ccp", fake_ccp)
    monkeypatch.setattr(nlp_mod, "improve_nlp", fake_nlp)
    improve_chain(form, xs, [qt.DCCP, qt.IPOPT],
                  max_iter=7, tau=0.1, inner_iters=11,
                  num_outer=3, mu0=2.0, rho=99.0)
    assert seen["ccp"]["max_iter"] == 7
    assert seen["ccp"]["tau"] == 0.1
    assert seen["ccp"]["inner_iters"] == 11
    assert "rho" not in seen["ccp"]          # foreign kwargs filtered out
    assert seen["nlp"]["num_outer"] == 3
    assert seen["nlp"]["mu0"] == 2.0
    assert "tau" not in seen["nlp"]


def test_solve_restarts_sharded_matches_unsharded():
    form, _, _ = boolean_ls_form(n=6, m=9, seed=4)
    mesh = make_mesh()
    key = jax.random.PRNGKey(1)
    x0, f0, v0 = solve_restarts(form, 32, key)
    x1, f1, v1 = solve_restarts(form, 32, key, mesh=mesh)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1), atol=1e-10)
    assert float(f0) == pytest.approx(float(f1), abs=1e-10)


def test_improve_chain_composition():
    form, _, _ = boolean_ls_form(n=5, m=7, seed=5)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((4, form.n)))
    out = improve_chain(form, xs, [qt.COORD_DESCENT, qt.ADMM],
                        num_iters=100)
    assert out.shape == xs.shape
    # chain must not be worse than CD alone under `better`
    cd = improve_chain(form, xs, qt.COORD_DESCENT, num_iters=100)
    for i in range(4):
        chained = np.asarray(core.better(form, out[i], cd[i]))
        # chained result wins or ties (better returns second arg on tie)
        assert np.array_equal(chained, np.asarray(out[i])) or \
            np.array_equal(chained, np.asarray(cd[i]))


def test_constraint_sharded_admm_matches_replicated():
    n = 4
    a = np.full(n, 0.5)
    x = qt.Variable(n)
    prob = qt.Problem(qt.Minimize(qt.sum_squares(x)),
                      [qt.sum_squares(x) <= 1, qt.sum_squares(x - a) <= 1,
                       qt.square(x) <= 4])
    form, _, _ = qt.canonicalize(prob)
    from qcqp_tpu.kernels.projection import precompute_eigh
    from qcqp_tpu.solvers.admm import admm_phase1
    x0 = jnp.asarray(np.full(n, 3.0))
    mesh = make_mesh(axis="c")
    z_sharded = np.asarray(admm_phase1_sharded(form, x0, mesh, num_iters=300))
    z_ref = np.asarray(admm_phase1(form, precompute_eigh(form), x0,
                                   1e-2, 300))
    v = float(core.max_violation(form, jnp.asarray(z_sharded)))
    assert v < 1e-2
    np.testing.assert_allclose(z_sharded, z_ref, atol=1e-6)
