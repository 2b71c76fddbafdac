"""Batched symmetric eigendecomposition: Pallas round-robin Jacobi on the MXU.

Everything in this framework leans on batches of small (n ~ 100) symmetric
eigendecompositions (SURVEY.md "hard parts" #2): the per-constraint projection
precompute, the PSD cone projection inside the SDP solver, auto-rho, and the
DC splits.  XLA's eigh lowers to a sequential QR-ish pipeline that neither
batches well nor keeps the working set in VMEM.  This kernel instead runs the
classic parallel one-round-robin Jacobi scheme entirely on-chip:

  * each round zeroes n/2 disjoint pivots (pairs (2i, 2i+1)); the n/2 Givens
    rotations form one block-diagonal orthogonal matrix J built with masked
    elementwise algebra, so the update A <- J^T A J and the eigenvector
    accumulation V <- V J are plain 128x128 MXU matmuls;
  * a fixed tournament permutation Pi (circle method, conjugated so the
    paired elements are always adjacent) re-seats the matrix between rounds;
    n-1 rounds visit every pivot pair exactly once (verified in tests);
  * sweeps x (n-1) rounds run in a fori_loop inside a single pallas_call per
    batch element — zero HBM traffic during iteration (one (128,128) A, one
    V, and the constant masks live in VMEM).

float32 only (TPU path); float64 callers stay on jnp.linalg.eigh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_LANE = 128


def tournament_permutation(n: int) -> np.ndarray:
    """Index permutation sigma with: pairing (2i,2i+1) applied to
    sigma^k-reseated elements enumerates all unordered pairs over k=0..n-2.

    Circle method: seats s = [0, 1, ..., n-1], pairs are (s[i], s[n-1-i]);
    one round rotates all seats but seat 0.  Conjugating by the interleave
    arrangement (s[0], s[n-1], s[1], s[n-2], ...) makes every pair adjacent.
    Returns sigma as an index array: round k+1 element at slot j is the
    round-k element at slot sigma[j].
    """
    assert n % 2 == 0
    # arrangement: slot -> seat
    arr = np.empty(n, dtype=np.int64)
    arr[0::2] = np.arange(n // 2)
    arr[1::2] = n - 1 - np.arange(n // 2)
    inv_arr = np.argsort(arr)
    # seat rotation: seat 0 fixed; seats 1..n-1 rotate by one
    rot = np.empty(n, dtype=np.int64)
    rot[0] = 0
    rot[1:] = np.concatenate([[n - 1], np.arange(1, n - 1)])
    # slot-level permutation: slot -> slot
    return inv_arr[rot[arr]]


@functools.lru_cache(maxsize=8)
def _constants(n: int):
    """Constant masks as numpy arrays: identity, pair-offdiag selectors,
    pair-spread matrices, and the permutation matrix."""
    eye = np.eye(n, dtype=np.float32)
    E1 = np.zeros((n, n), np.float32)   # (2i, 2i+1)
    E2 = np.zeros((n, n), np.float32)   # (2i+1, 2i)
    Sp_a = np.zeros((n, n), np.float32)  # spread diag[2i] to rows 2i, 2i+1
    Sp_b = np.zeros((n, n), np.float32)  # spread diag[2i+1] to both rows
    Sp_c = np.zeros((n, n), np.float32)  # spread offdiag[2i] to both rows
    for i in range(n // 2):
        a, b = 2 * i, 2 * i + 1
        E1[a, b] = 1.0
        E2[b, a] = 1.0
        Sp_a[a, a] = Sp_a[b, a] = 1.0
        Sp_b[a, b] = Sp_b[b, b] = 1.0
        Sp_c[a, a] = Sp_c[b, a] = 1.0
    sigma = tournament_permutation(n)
    Pi = np.zeros((n, n), np.float32)
    # X_new = Pi^T X Pi reseats element sigma[j] into slot j
    Pi[sigma, np.arange(n)] = 1.0
    return eye, E1, E2, Sp_a, Sp_b, Sp_c, Pi


def jacobi_sweeps(A, V0=None, sweeps: int = 2):
    """Pure-jnp round-robin Jacobi sweeps (same scheme as the Pallas kernel,
    usable anywhere, any dtype, odd sizes padded).

    Returns (lam_unsorted, V) with A ~= V diag(lam) V^T after `sweeps` full
    sweeps.  Intended for *warm-started* eigendecomposition: pass the
    previous eigenbasis via A' = V_prev^T A V_prev, then compose — a nearly
    diagonal A' converges in 1-2 sweeps of pure matmuls, replacing a
    sequential eigh in iterative loops (the SDP cone projection).
    """
    n0 = A.shape[-1]
    n = n0 + (n0 % 2)
    if n != n0:
        A = jnp.pad(A, ((0, 1), (0, 1)))
    consts = [jnp.asarray(c, A.dtype) for c in _constants(n)]
    eye, E1, E2, Sp_a, Sp_b, Sp_c, Pi = consts
    V = eye if V0 is None else (
        jnp.pad(V0, ((0, 1), (0, 1))).at[n0, n0].set(1.0) if n != n0 else V0)

    def round_body(_, carry):
        A, V = carry
        d = jnp.sum(A * eye, axis=1)
        o = jnp.sum(A * E1, axis=1)
        a = Sp_a @ d
        b = Sp_b @ d
        c = Sp_c @ o
        tau = (b - a) / jnp.where(c == 0.0, 1.0, 2.0 * c)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0.0, 1.0, t)
        t = jnp.where(c == 0.0, 0.0, t)
        cs = jax.lax.rsqrt(1.0 + t * t)
        sn = t * cs
        J = eye * cs[:, None] + E1 * sn[:, None] - E2 * sn[:, None]
        hp = jax.lax.Precision.HIGHEST
        JP = jnp.dot(J, Pi, preferred_element_type=A.dtype, precision=hp)
        A = jnp.dot(JP.T, jnp.dot(A, JP, preferred_element_type=A.dtype,
                                  precision=hp),
                    preferred_element_type=A.dtype, precision=hp)
        V = jnp.dot(V, JP, preferred_element_type=A.dtype, precision=hp)
        return A, V

    A, V = jax.lax.fori_loop(jnp.int32(0), jnp.int32(sweeps * (n - 1)),
                             round_body, (A, V))
    lam = jnp.sum(A * eye, axis=1)
    if n != n0:
        lam = lam[:n0]
        V = V[:n0, :n0]
    return lam, V


def _jacobi_kernel(A_ref, eye_ref, E1_ref, E2_ref, Spa_ref, Spb_ref,
                   Spc_ref, Pi_ref, lam_ref, V_ref, *, n: int, sweeps: int):
    A = A_ref[0]
    eye = eye_ref[:]
    E1 = E1_ref[:]
    E2 = E2_ref[:]
    Sp_a = Spa_ref[:]
    Sp_b = Spb_ref[:]
    Sp_c = Spc_ref[:]
    Pi = Pi_ref[:]
    V = eye

    def round_body(_, carry):
        A, V = carry
        d = jnp.sum(A * eye, axis=1)            # diagonal
        o = jnp.sum(A * E1, axis=1)             # offdiag at rows 2i
        a = Sp_a @ d                            # per-row: pair's A[2i,2i]
        b = Sp_b @ d                            # per-row: pair's A[2i+1,2i+1]
        c = Sp_c @ o                            # per-row: pair's A[2i,2i+1]
        # Inner rotation (|theta| <= pi/4), Golub-Van Loan 8.4.1: required for
        # cyclic-Jacobi convergence — the atan2 angle can pick the outer
        # (near-swap) rotation, which endlessly permutes mass instead of
        # annihilating it.
        tau = (b - a) / jnp.where(c == 0.0, 1.0, 2.0 * c)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0.0, 1.0, t)   # a == b: theta = pi/4
        t = jnp.where(c == 0.0, 0.0, t)     # already diagonal: no-op
        cs = jax.lax.rsqrt(1.0 + t * t)
        sn = t * cs
        # per pair: [[cs, sn], [-sn, cs]] annihilates A[2i, 2i+1]
        J = eye * cs[:, None] + E1 * sn[:, None] - E2 * sn[:, None]
        # precision='highest' (f32 passes): the default single-bf16-pass MXU
        # matmul loses orthogonality over ~1000 accumulated rotations.
        hp = jax.lax.Precision.HIGHEST
        JP = jnp.dot(J, Pi, preferred_element_type=jnp.float32, precision=hp)
        A = jnp.dot(
            JP.T, jnp.dot(A, JP, preferred_element_type=jnp.float32,
                          precision=hp),
            preferred_element_type=jnp.float32, precision=hp)
        V = jnp.dot(V, JP, preferred_element_type=jnp.float32, precision=hp)
        return A, V

    # int32 bounds: Mosaic cannot legalize the i64 counters that
    # jax_enable_x64 would otherwise give the loop.
    A, V = jax.lax.fori_loop(jnp.int32(0), jnp.int32(sweeps * (n - 1)),
                             round_body, (A, V))
    # lam block is (1, 8, n) to satisfy TPU tiling; row 0 carries the values
    lam_ref[0, :, :] = jnp.broadcast_to(jnp.sum(A * eye, axis=1)[None, :],
                                        (8, n))
    V_ref[0] = V


def eigh_jacobi(A: jax.Array, sweeps: int = 8,
                interpret: bool = False):
    """Batched symmetric eigh via the Pallas Jacobi kernel.

    A: (..., n, n) float32 symmetric.  Returns (lam ascending, V) with
    A = V diag(lam) V^T, matching jnp.linalg.eigh conventions.
    """
    batch_shape = A.shape[:-2]
    n0 = A.shape[-1]
    n = max(_LANE, ((n0 + _LANE - 1) // _LANE) * _LANE)
    B = int(np.prod(batch_shape)) if batch_shape else 1
    Af = A.reshape(B, n0, n0).astype(jnp.float32)
    if n != n0:
        Af = jnp.pad(Af, ((0, 0), (0, n - n0), (0, n - n0)))

    eye, E1, E2, Sp_a, Sp_b, Sp_c, Pi = (jnp.asarray(c)
                                         for c in _constants(n))

    kernel = functools.partial(_jacobi_kernel, n=n, sweeps=sweeps)
    const_spec = pl.BlockSpec((n, n), lambda i: (0, 0))
    # The package enables jax_enable_x64 globally; Mosaic requires i32 grid
    # index arithmetic, so trace the kernel with x64 off (all data is f32).
    with jax.enable_x64(False):
        return _run(Af, eye, E1, E2, Sp_a, Sp_b, Sp_c, Pi, kernel,
                    const_spec, B, n, n0, batch_shape, interpret)


def _run(Af, eye, E1, E2, Sp_a, Sp_b, Sp_c, Pi, kernel, const_spec,
         B, n, n0, batch_shape, interpret):
    lam_all, V_all = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0)),
            const_spec, const_spec, const_spec, const_spec, const_spec,
            const_spec, const_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, 8, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 8, n), jnp.float32),
            jax.ShapeDtypeStruct((B, n, n), jnp.float32),
        ],
        interpret=interpret,
    )(Af, eye, E1, E2, Sp_a, Sp_b, Sp_c, Pi)

    lam = lam_all[:, 0, :n0]
    V = V_all[:, :n0, :n0]
    order = jnp.argsort(lam, axis=-1)
    lam = jnp.take_along_axis(lam, order, axis=-1)
    V = jnp.take_along_axis(V, order[:, None, :], axis=-1)
    return (lam.reshape(*batch_shape, n0),
            V.reshape(*batch_shape, n0, n0))
