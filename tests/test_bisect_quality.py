"""Quality curve for the relative-termination slack bisection across
violation scales (VERDICT r2 weak item 6).

The fused CD kernel terminates its phase-1 slack bisection at
es - ss <= tol + rel*max(ss, 0) with rel = 1/16 (kernels/onevar_pallas.py),
a deviation from the reference's absolute-tol bisection
(/root/reference/qcqp/qcqp.py:122-131) that was quality-pinned only at the
bench shape.  Here the same contract — fused quality is not distributionally
worse than the unfused absolute-tol path — is asserted with the problem data
scaled over four orders of magnitude, which scales the violations (and hence
the absolute slack magnitudes the relative term acts on) accordingly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qcqp_tpu.core import QCQPForm, max_violation, eval_objective
from qcqp_tpu.solvers.coord_descent import improve_coord_descent_batch
from qcqp_tpu.solvers.coord_descent_fused import improve_coord_descent_fused


def _form(scale, n=10, m=8, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m + 1, n, n)) / np.sqrt(n)
    P = 0.5 * (A + np.swapaxes(A, -1, -2)) * scale
    q = rng.standard_normal((m + 1, n)) / np.sqrt(n) * scale
    r = rng.standard_normal(m + 1) * scale
    is_eq = rng.random(m) < 0.5
    return QCQPForm(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
                    jnp.asarray(r, jnp.float32), jnp.asarray(is_eq))


@pytest.mark.parametrize("scale", [1e-2, 1.0, 1e2])
def test_relative_bisection_quality_across_scales(scale):
    form = _form(scale)
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.standard_normal((128, 10)), jnp.float32)
    xf = improve_coord_descent_fused(form, xs, num_iters=10, interpret=True)
    xu = improve_coord_descent_batch(form, xs, num_iters=10)
    vf = np.asarray(jax.vmap(lambda x: max_violation(form, x))(xf))
    vu = np.asarray(jax.vmap(lambda x: max_violation(form, x))(xu))
    # All comparisons in RAW units: the algorithm's quality bars (viol_tol,
    # better bucket 1e-4) are absolute, so that is the semantics users get.
    # (At scale 0.01 every start is already below viol_tol and neither path
    # moves; at scale 100 the relative term rel*ss dominates the bisection.)
    assert np.median(vf) <= np.median(vu) * 1.5 + 1e-4 * scale
    feas_f = (vf < 1e-2).mean()
    feas_u = (vu < 1e-2).mean()
    assert feas_f >= feas_u - 0.1
    # best lane lands in the same reference violation bucket (1e-2) or better
    assert np.floor(vf.min() / 1e-2) <= np.floor(vu.min() / 1e-2)
