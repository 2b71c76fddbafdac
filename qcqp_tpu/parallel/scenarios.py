"""Scenario/instance parallelism: solve batches of independent QCQPs at once.

The third parallel dimension (SURVEY.md section 2c): many problem instances
of identical shape (n, m) stack along a leading scenario axis and run through
the same jitted suggest->improve->reduce program — a second vmap axis on top
of restarts, shardable over the mesh.  Instances stream from disk through the
native threaded problem-bank loader (qcqp_tpu.native.bank_load).

This is the production serving path: one compiled program, (S, R) grid of
independent chains per step, per-scenario best points out.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import settings as s
from ..core import QCQPForm
from .restarts import best_point, improve_chain, suggest_batch


def stack_forms(forms: List[QCQPForm]) -> QCQPForm:
    """Stack same-shape instances along a leading scenario axis."""
    return QCQPForm(
        jnp.stack([f.P for f in forms]),
        jnp.stack([f.q for f in forms]),
        jnp.stack([f.r for f in forms]),
        jnp.stack([f.is_eq for f in forms]),
    )


def forms_from_bank(path: str, start: int = 0, batch: Optional[int] = None,
                    dtype=None) -> QCQPForm:
    """Load a stacked scenario batch from a native problem bank."""
    from .. import native
    count, n, m = native.bank_info(path)
    if batch is None:
        batch = count - start
    Pm, qm, rm, eq = native.bank_load(path, start, batch)
    if dtype is not None:
        Pm, qm, rm = (a.astype(dtype) for a in (Pm, qm, rm))
    return QCQPForm(jnp.asarray(Pm), jnp.asarray(qm), jnp.asarray(rm),
                    jnp.asarray(eq))


def solve_scenarios(stacked: QCQPForm, num_restarts: int, key: jax.Array,
                    suggest: str = s.RANDOM,
                    improve: Union[str, List[str]] = s.COORD_DESCENT,
                    mesh: Optional[Mesh] = None, axis: str = "r",
                    better_tol: float = 1e-4, **kwargs):
    """Solve S stacked instances with R restarts each.

    Returns (xs (S, n), fs (S,), viols (S,)).  With a mesh, restarts shard
    over `axis` (scenarios stay replicated — they are the outer vmap, which
    XLA parallelizes across the sharded inner axis).
    """
    S = stacked.P.shape[0]

    def one_scenario(form: QCQPForm, k):
        xs = suggest_batch(form, num_restarts, k, suggest)
        if mesh is not None:
            xs = jax.lax.with_sharding_constraint(
                xs, NamedSharding(mesh, P(axis)))
        xs = improve_chain(form, xs, improve, **kwargs)
        return best_point(form, xs, better_tol)

    keys = jax.random.split(key, S)
    fn = jax.jit(jax.vmap(one_scenario))
    return fn(stacked, keys)
