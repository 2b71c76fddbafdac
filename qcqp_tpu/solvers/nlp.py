"""Augmented-Lagrangian NLP polish — the device-native IPOPT replacement.

The reference hands the point to the external IPOPT interior-point NLP solver
via PyIpopt callbacks (reference: qcqp/qcqp.py:325-364).  Interior-point
methods are host-sequential (sparse factorizations per iteration), so the
TPU-native equivalent is a classic augmented-Lagrangian method whose inner
minimization is pure batched tensor algebra:

    L_mu(x; lmb) = f0(x) + sum_eq [lmb_i f_i + (mu/2) f_i^2]
                 + sum_ineq (mu/2) [max(0, f_i + lmb_i/mu)^2 - (lmb_i/mu)^2]

Inner loop: spectral-step (Barzilai-Borwein) gradient descent with a fixed
iteration count — every gradient is one batched (m+1, n, n) x (n,)
contraction.  Outer loop: first-order multiplier updates and mu growth when
the violation stalls.  Like the reference (which swallows IPOPT failures and
returns x regardless, qcqp.py:359-362), the result is returned through
`better` so a failed polish cannot lose ground.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import QCQPForm, better, eval_all, max_violation


def _al_value_grad(form: QCQPForm, x, lmb, mu):
    """Value and gradient of the augmented Lagrangian (batched)."""
    Px = jnp.einsum("kij,j->ki", form.P, x)
    vals = (Px + form.q) @ x + form.r          # (m+1,)
    grads = 2.0 * Px + form.q                  # (m+1, n) gradient of each f_k
    f0, g0 = vals[0], grads[0]
    c, gc = vals[1:], grads[1:]

    t = c + lmb / mu
    # equality rows: lmb c + mu/2 c^2 ; inequality rows: hinge-squared form
    w_eq = lmb * c + 0.5 * mu * c * c
    w_in = 0.5 * mu * (jnp.maximum(t, 0.0) ** 2 - (lmb / mu) ** 2)
    val = f0 + jnp.sum(jnp.where(form.is_eq, w_eq, w_in))

    coef_eq = lmb + mu * c
    coef_in = mu * jnp.maximum(t, 0.0)
    coef = jnp.where(form.is_eq, coef_eq, coef_in)
    grad = g0 + coef @ gc
    return val, grad


@partial(jax.jit, static_argnames=("num_outer", "num_inner"))
def improve_nlp(form: QCQPForm, x0, num_outer: int = 25, num_inner: int = 150,
                mu0: float = 10.0):
    """Augmented-Lagrangian improve (the reference's IPOPT method slot)."""
    dt = x0.dtype
    m = form.m

    def inner_step(carry, _):
        x, x_prev, g_prev, lmb, mu = carry
        _, g = _al_value_grad(form, x, lmb, mu)
        # Barzilai-Borwein spectral step with safeguards
        s = x - x_prev
        y = g - g_prev
        sy = s @ y
        ss = s @ s
        step = jnp.where(sy > 1e-12, ss / jnp.maximum(sy, 1e-12), 1e-3)
        step = jnp.clip(step, 1e-8, 1e2)
        x_new = x - step * g
        return (x_new, x, g, lmb, mu), None

    def outer_step(carry, _):
        x, lmb, mu, viol_prev = carry
        # initialize BB with a tiny gradient step
        _, g = _al_value_grad(form, x, lmb, mu)
        x1 = x - 1e-6 * g
        (x, _, _, _, _), _ = jax.lax.scan(
            inner_step, (x1, x, g, lmb, mu), None, length=num_inner)

        c = eval_all(form, x)[1:]
        lmb_eq = lmb + mu * c
        lmb_in = jnp.maximum(lmb + mu * c, 0.0)
        lmb = jnp.where(form.is_eq, lmb_eq, lmb_in)

        viol = max_violation(form, x)
        grow = viol > 0.5 * viol_prev
        mu = jnp.where(grow, mu * 3.0, mu)
        return (x, lmb, mu, viol), None

    lmb0 = jnp.zeros(m, dt)
    viol0 = max_violation(form, x0)
    (x_fin, _, _, _), _ = jax.lax.scan(
        outer_step, (x0, lmb0, jnp.asarray(mu0, dt), viol0), None,
        length=num_outer)
    return better(form, x0, x_fin)
