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
from jax.experimental.pallas import tpu as pltpu

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


def vec_round_ctx(n: int):
    """Build the vectorized tournament-Jacobi round body for (K, n, n)
    stacks, reusable inside ANY Pallas kernel (a seam for future fused
    kernels; today's only consumer is _jacobi_vec_kernel below — the SDP
    device path moved to the Newton-Schulz projection instead, round 5).
    Returns (round_body, eye3) where
    round_body(_, (A, V)) performs ONE round: J^T A J, V <- V J, then the
    tournament reseat on both — see _jacobi_vec_kernel's docstring for the
    scheme.  eye3 is the (1, n, n) identity (diag extraction mask)."""
    f32 = jnp.float32
    i32 = jnp.int32
    ri = jax.lax.broadcasted_iota(i32, (1, n, 1), 1)
    ci = jax.lax.broadcasted_iota(i32, (1, 1, n), 2)
    even_r = (ri % 2) == 0
    even_c = (ci % 2) == 0
    rr2 = jax.lax.broadcasted_iota(i32, (n, n), 0)
    cc2 = jax.lax.broadcasted_iota(i32, (n, n), 1)
    eye = (rr2 == cc2).astype(f32)[None]                 # (1, n, n)
    # E1[a, a+1] = 1 for even a (selects A[a,b] via a lane reduction)
    E1 = ((cc2 == rr2 + 1) & (rr2 % 2 == 0)).astype(f32)[None]
    sgn_r = jnp.where(even_r, -1.0, 1.0).astype(f32)     # (1, n, 1)
    sgn_c = jnp.where(even_c, -1.0, 1.0).astype(f32)     # (1, 1, n)

    # pltpu.roll requires non-negative shifts: -k == n - k on a size-n axis
    def swap_r(X):
        return jnp.where(even_r, pltpu.roll(X, n - 1, 1),
                         pltpu.roll(X, 1, 1))

    def swap_c(X):
        return jnp.where(even_c, pltpu.roll(X, n - 1, 2),
                         pltpu.roll(X, 1, 2))

    def perm_r(X):
        """Row reseat X[j] <- X[sigma[j]]: evens shift down 2, odds up 2,
        fixups at slots 0 (keep), 2 (from 1) and n-1 (from n-2)."""
        base = jnp.where(even_r, pltpu.roll(X, 2, 1),
                         pltpu.roll(X, n - 2, 1))
        d1 = pltpu.roll(X, 1, 1)
        base = jnp.where((ri == 2) | (ri == n - 1), d1, base)
        return jnp.where(ri == 0, X, base)

    def perm_c(X):
        base = jnp.where(even_c, pltpu.roll(X, 2, 2),
                         pltpu.roll(X, n - 2, 2))
        d1 = pltpu.roll(X, 1, 2)
        base = jnp.where((ci == 2) | (ci == n - 1), d1, base)
        return jnp.where(ci == 0, X, base)

    def params(d, o, even, swap):
        """Per-pair inner rotation (Golub-Van Loan 8.4.1) from the pair's
        diagonal values d and offdiagonal o, broadcast to both slots."""
        a = jnp.where(even, d, swap(d))
        b = jnp.where(even, swap(d), d)
        c = o + swap(o)
        tau = (b - a) / jnp.where(c == 0.0, 1.0, 2.0 * c)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0.0, 1.0, t)
        t = jnp.where(c == 0.0, 0.0, t)
        cs = jax.lax.rsqrt(1.0 + t * t)
        return cs, t * cs

    def round_body(_, carry):
        A, V = carry
        # ONE set of rotation params (row-side extraction), transposed for
        # the column application.  Computing the column set independently
        # from sublane reductions looks equivalent by symmetry, but f32
        # rounding lets A drift asymmetric and the row/column coefficient
        # mismatch then feeds back explosively (measured: offdiag norm
        # GROWS after sweep 2).  The matmul formulation never hits this
        # because a single J serves both sides.
        d_r = jnp.sum(A * eye, axis=2, keepdims=True)    # (K, n, 1)
        o_r = jnp.sum(A * E1, axis=2, keepdims=True)
        cs_r, sn_r = params(d_r, o_r, even_r, swap_r)
        cs_c = jnp.swapaxes(cs_r, 1, 2)                  # (K, 1, n)
        sn_c = jnp.swapaxes(sn_r, 1, 2)

        A = cs_r * A + (sgn_r * sn_r) * swap_r(A)        # J^T A
        A = cs_c * A + (sgn_c * sn_c) * swap_c(A)        # ... J
        V = cs_c * V + (sgn_c * sn_c) * swap_c(V)        # V J
        A = perm_r(perm_c(A))                            # Pi^T A Pi
        V = perm_c(V)                                    # V Pi
        return A, V

    return round_body, eye


def _jacobi_vec_kernel(A_ref, lam_ref, V_ref, *, n: int, K: int,
                       sweeps: int, rounds: int = None):
    """Vectorized round-robin Jacobi: K matrices per grid cell, ZERO matmuls.

    The MXU formulation (below) spends 4 n^3 matmuls per round although a
    Givens J has only 2 nonzeros per row and the reseat Pi is a permutation:
    both are O(n^2) data movement.  Here each round is pure VPU work on the
    (K, n, n) stack:

      * J two-sided apply = masked adjacent-row/column swaps (roll +-1)
        combined with the per-pair (cs, sn) coefficients — rows first, then
        columns, coefficients computed from the pre-update A on both axes
        (bitwise equal by symmetry, so no sublane<->lane relayout);
      * the tournament reseat sigma (see tournament_permutation) is two
        interleaved +-2 cyclic shifts with 3 boundary fixups (slots 0, 2,
        n-1) = rolls + masked selects on each axis.

    Per round: ~30 elementwise ops on (K, n, n) instead of 4 K n^3 MXU
    FLOPs — ~n/8 less arithmetic, and the VPU does it at f32 without the
    multi-pass penalty f32 MXU matmuls pay.
    """
    round_body, eye = vec_round_ctx(n)
    A = A_ref[:]                                         # (K, n, n)
    V0 = jnp.broadcast_to(eye, (K, n, n))
    total = sweeps * (n - 1) if rounds is None else rounds
    A, V = jax.lax.fori_loop(jnp.int32(0), jnp.int32(total),
                             round_body, (A, V0))
    lam_ref[:] = jnp.sum(A * eye, axis=2)                # (K, n)
    V_ref[:] = V


def eigh_jacobi_vec(A: jax.Array, sweeps: int = 8, block: int = 16,
                    interpret: bool = False, _rounds: int = None):
    """Batched symmetric eigh via the vectorized (matmul-free) Jacobi kernel.

    A: (..., n, n) float32 symmetric.  Returns (lam ascending, V) with
    A = V diag(lam) V^T, matching jnp.linalg.eigh conventions.  `block`
    matrices are processed per grid cell (VMEM-bound; 16 fits n<=128).
    """
    batch_shape = A.shape[:-2]
    n0 = A.shape[-1]
    n = max(_LANE, ((n0 + _LANE - 1) // _LANE) * _LANE)
    B = int(np.prod(batch_shape)) if batch_shape else 1
    K = min(block, B)
    Bp = -(-B // K) * K
    Af = A.reshape(B, n0, n0).astype(jnp.float32)
    Af = jnp.pad(Af, ((0, Bp - B), (0, n - n0), (0, n - n0)))

    kernel = functools.partial(_jacobi_vec_kernel, n=n, K=K, sweeps=sweeps,
                               rounds=_rounds)
    with jax.enable_x64(False):
        lam_all, V_all = pl.pallas_call(
            kernel,
            grid=(Bp // K,),
            in_specs=[pl.BlockSpec((K, n, n), lambda i: (i, 0, 0))],
            out_specs=[
                pl.BlockSpec((K, n), lambda i: (i, 0)),
                pl.BlockSpec((K, n, n), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Bp, n), jnp.float32),
                jax.ShapeDtypeStruct((Bp, n, n), jnp.float32),
            ],
            interpret=interpret,
        )(Af)

    lam = lam_all[:B, :n0]
    V = V_all[:B, :n0, :n0]
    order = jnp.argsort(lam, axis=-1)
    lam = jnp.take_along_axis(lam, order, axis=-1)
    V = jnp.take_along_axis(V, order[:, None, :], axis=-1)
    return (lam.reshape(*batch_shape, n0),
            V.reshape(*batch_shape, n0, n0))


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
