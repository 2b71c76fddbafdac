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


def solve_scenarios_sharded(stacked: QCQPForm, num_restarts: int,
                            key: jax.Array, mesh: Mesh,
                            s_axis: str = "s", r_axis: str = "r",
                            suggest: str = s.RANDOM,
                            improve: Union[str, List[str]] = s.COORD_DESCENT,
                            better_tol: float = 1e-4, **kwargs):
    """Solve S stacked instances with the SCENARIO axis sharded too.

    `solve_scenarios` replicates the instance bank on every device; past one
    chip that caps the bank size and wastes HBM.  Here the (S, R) grid is
    laid out over a 2-D mesh: problem tensors and per-scenario outputs shard
    over `s_axis`, the restart axis of the working set over `r_axis` — XLA
    inserts the best-point reduction collectives over `r_axis` only, so
    scenario shards never communicate (they are independent programs).

    Requires S to be a multiple of the s-axis size and num_restarts a
    multiple of the r-axis size.  Returns (xs (S, n), fs (S,), viols (S,)),
    sharded over `s_axis`.
    """
    S = stacked.P.shape[0]
    s_size = mesh.shape[s_axis]
    r_size = mesh.shape[r_axis]
    if S % s_size:
        raise ValueError(f"S={S} not a multiple of the {s_axis} axis "
                         f"({s_size})")
    num_restarts = -(-num_restarts // r_size) * r_size

    form_sh = NamedSharding(mesh, P(s_axis))
    xs_sh = NamedSharding(mesh, P(s_axis, r_axis))
    out_sh = NamedSharding(mesh, P(s_axis))
    stacked = jax.tree.map(lambda a: jax.device_put(a, form_sh), stacked)
    keys = jax.device_put(jax.random.split(key, S), form_sh)

    def step(stk, ks):
        xs = jax.vmap(
            lambda f, k: suggest_batch(f, num_restarts, k, suggest))(stk, ks)
        xs = jax.lax.with_sharding_constraint(xs, xs_sh)
        xs = jax.vmap(
            lambda f, x: improve_chain(f, x, improve, **kwargs))(stk, xs)
        x, fv, v = jax.vmap(
            lambda f, x: best_point(f, x, better_tol))(stk, xs)
        return x, fv, v

    fn = jax.jit(step, out_shardings=(out_sh, out_sh, out_sh))
    return fn(stacked, keys)
