"""Closed-form batched linear algebra for tiny symmetric systems.

The DESeq2 design matrix has P <= ~10 columns, and the hot solvers need
per-gene (P, P) solves / inverses / log-determinants with G up to ~60k.
XLA:TPU lowers generic batched ``jnp.linalg`` (LU/QR) for such shapes into
scalar-ish loops that run orders of magnitude below VPU speed, so for
P in {1, 2, 3} we use adjugate/cofactor closed forms - pure elementwise
arithmetic that fuses into the surrounding kernels - and fall back to the
generic routines only for larger P.

All matrices here are symmetric positive (semi-)definite Gram matrices
M = X^T W X (+ ridge), batched as (..., P, P).
"""

from __future__ import annotations

import jax.numpy as jnp


_UNROLL_MAX = 8  # beyond this, generic batched linalg wins on code size


def _chol_unrolled(M: jnp.ndarray) -> dict:
    """Unrolled Cholesky factors of symmetric PD M, batched (..., P, P).

    Returns {(i, j): L_ij} arrays for i >= j. Pure elementwise arithmetic
    (static index loops), so XLA fuses it with surrounding VPU work instead
    of lowering a batched LAPACK kernel.
    """
    P = M.shape[-1]
    L: dict = {}
    for j in range(P):
        s = M[..., j, j]
        for k in range(j):
            s = s - L[(j, k)] * L[(j, k)]
        L[(j, j)] = jnp.sqrt(jnp.maximum(s, jnp.finfo(M.dtype).tiny))
        for i in range(j + 1, P):
            s = M[..., i, j]
            for k in range(j):
                s = s - L[(i, k)] * L[(j, k)]
            L[(i, j)] = s / L[(j, j)]
    return L


def _chol_solve_unrolled(L: dict, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L L^T x = b given unrolled factors. b: (..., P)."""
    P = b.shape[-1]
    y = []
    for i in range(P):
        s = b[..., i]
        for k in range(i):
            s = s - L[(i, k)] * y[k]
        y.append(s / L[(i, i)])
    x = [None] * P
    for i in reversed(range(P)):
        s = y[i]
        for k in range(i + 1, P):
            s = s - L[(k, i)] * x[k]
        x[i] = s / L[(i, i)]
    return jnp.stack(x, axis=-1)


def sym_solve(M: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve M x = b for symmetric M, batched. b: (..., P) -> (..., P)."""
    P = M.shape[-1]
    if P == 1:
        return b / M[..., 0, 0:1]
    if P == 2:
        a, c = M[..., 0, 0], M[..., 0, 1]
        d = M[..., 1, 1]
        det = a * d - c * c
        x0 = (d * b[..., 0] - c * b[..., 1]) / det
        x1 = (a * b[..., 1] - c * b[..., 0]) / det
        return jnp.stack([x0, x1], axis=-1)
    if P == 3:
        return (sym_inv(M) @ b[..., None])[..., 0]
    if P <= _UNROLL_MAX:
        return _chol_solve_unrolled(_chol_unrolled(M), b)
    return jnp.linalg.solve(M, b[..., None])[..., 0]


def sym_inv(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of symmetric M, batched (..., P, P)."""
    P = M.shape[-1]
    if P == 1:
        return 1.0 / M
    if P == 2:
        a, c = M[..., 0, 0], M[..., 0, 1]
        d = M[..., 1, 1]
        det = a * d - c * c
        inv = jnp.stack(
            [
                jnp.stack([d, -c], axis=-1),
                jnp.stack([-c, a], axis=-1),
            ],
            axis=-2,
        )
        return inv / det[..., None, None]
    if P == 3:
        a, b_, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
        d, e = M[..., 1, 1], M[..., 1, 2]
        f = M[..., 2, 2]
        # Cofactors of the symmetric matrix [[a,b,c],[b,d,e],[c,e,f]]
        A = d * f - e * e
        B = c * e - b_ * f
        C = b_ * e - c * d
        D = a * f - c * c
        E = b_ * c - a * e
        F = a * d - b_ * b_
        det = a * A + b_ * B + c * C
        inv = jnp.stack(
            [
                jnp.stack([A, B, C], axis=-1),
                jnp.stack([B, D, E], axis=-1),
                jnp.stack([C, E, F], axis=-1),
            ],
            axis=-2,
        )
        return inv / det[..., None, None]
    if P <= _UNROLL_MAX:
        L = _chol_unrolled(M)
        eye = jnp.eye(P, dtype=M.dtype)
        cols = [
            _chol_solve_unrolled(L, jnp.broadcast_to(eye[j], M.shape[:-1]))
            for j in range(P)
        ]
        return jnp.stack(cols, axis=-1)
    return jnp.linalg.inv(M)


def sym_logdet(M: jnp.ndarray) -> jnp.ndarray:
    """log |det M| for symmetric PSD M, batched (..., P, P) -> (...)."""
    P = M.shape[-1]
    tiny = jnp.finfo(M.dtype).tiny
    if P == 1:
        return jnp.log(jnp.maximum(M[..., 0, 0], tiny))
    if P == 2:
        a, c = M[..., 0, 0], M[..., 0, 1]
        d = M[..., 1, 1]
        det = a * d - c * c
        return jnp.log(jnp.maximum(det, tiny))
    if P == 3:
        a, b_, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
        d, e = M[..., 1, 1], M[..., 1, 2]
        f = M[..., 2, 2]
        det = (
            a * (d * f - e * e) + b_ * (c * e - b_ * f) + c * (b_ * e - c * d)
        )
        return jnp.log(jnp.maximum(det, tiny))
    if P <= _UNROLL_MAX:
        L = _chol_unrolled(M)
        out = 0.0
        for j in range(P):
            out = out + jnp.log(L[(j, j)])
        return 2.0 * out
    return jnp.linalg.slogdet(M)[1]
