"""Batched apeGLM MAP LFC shrinkage (heavy-tailed Cauchy prior).

Parity target (reference, owkin/PyDESeq2): pydeseq2/utils.py:990-1207
(``nbinomGLM``/``nbinomFn``: scipy L-BFGS-B per gene in a joblib pool) and
pydeseq2/grid_search.py:224-320 (``grid_fit_shrink_beta`` fallback).

TPU design: damped batched Newton with exact (autodiff-free) gradient and
Hessian, backtracking line search, all genes in one program. Non-converged
lanes are reported; the inference layer re-solves them on a gathered padded
batch with a vectorized 2-D grid when P == 2.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pydeseq2_tpu.ops.smalllinalg import sym_inv, sym_solve


def nbinom_fn_batch(
    beta: jnp.ndarray,
    design_matrix: jnp.ndarray,
    counts: jnp.ndarray,
    size: jnp.ndarray,
    offset: jnp.ndarray,
    prior_no_shrink_scale: float,
    prior_scale: jnp.ndarray,
    shrink_index: int,
) -> jnp.ndarray:
    """apeGLM objective: Cauchy + normal prior minus NB log-likelihood.

    beta: (G, P); counts: (G, N); size: (G,); offset: (N,).
    Parity: reference pydeseq2/utils.py:1147-1207.
    """
    P = design_matrix.shape[1]
    shrink_mask = jnp.zeros((P,), beta.dtype).at[shrink_index].set(1.0)
    no_shrink_mask = 1.0 - shrink_mask

    xbeta = beta @ design_matrix.T  # (G, N)
    beta_s = beta[:, shrink_index]
    prior = ((beta * no_shrink_mask) ** 2).sum(-1) / (
        2.0 * prior_no_shrink_scale**2
    ) + jnp.log1p((beta_s / prior_scale) ** 2)

    log_size = jnp.log(size)[:, None]
    ll = (
        counts * xbeta
        - (counts + size[:, None]) * jnp.logaddexp(xbeta + offset[None, :], log_size)
    ).sum(-1)
    return prior - ll


def _grad(beta, X, counts, size, offset, pns, ps, shrink_index):
    """Exact gradient. Parity: reference pydeseq2/utils.py:1079-1091."""
    P = X.shape[1]
    shrink_mask = jnp.zeros((P,), beta.dtype).at[shrink_index].set(1.0)
    no_shrink_mask = 1.0 - shrink_mask
    xbeta = beta @ X.T
    beta_s = beta[:, shrink_index]
    d_neg_prior = beta * no_shrink_mask[None, :] / pns**2 + (
        2.0 * beta * shrink_mask[None, :]
    ) / (ps**2 + beta_s**2)[:, None]
    d_nll = (
        counts
        - (counts + size[:, None]) / (1.0 + size[:, None] * jnp.exp(-xbeta - offset[None, :]))
    ) @ X
    return d_neg_prior - d_nll


def _hess(beta, X, counts, size, offset, pns, ps, shrink_index):
    """Exact Hessian. Parity: reference pydeseq2/utils.py:1093-1109."""
    P = X.shape[1]
    shrink_mask = jnp.zeros((P,), beta.dtype).at[shrink_index].set(1.0)
    no_shrink_mask = 1.0 - shrink_mask
    xbeta = beta @ X.T
    exp_xbeta_off = jnp.exp(xbeta + offset[None, :])
    frac = (
        (counts + size[:, None])
        * size[:, None]
        * exp_xbeta_off
        / (size[:, None] + exp_xbeta_off) ** 2
    )  # (G, N)
    beta_s = beta[:, shrink_index]
    h11 = 1.0 / pns**2
    h22 = 2.0 * (ps**2 - beta_s**2) / (ps**2 + beta_s**2) ** 2  # (G,)
    diag = no_shrink_mask[None, :] * h11 + shrink_mask[None, :] * h22[:, None]
    H = jnp.einsum("gn,np,nq->gpq", frac, X, X, optimize=True)
    return H + _diag_embed(diag)


def _diag_embed(d: jnp.ndarray) -> jnp.ndarray:
    """(G, P) -> (G, P, P) diagonal matrices."""
    P = d.shape[-1]
    return d[..., None] * jnp.eye(P, dtype=d.dtype)[None]


@partial(jax.jit, static_argnames=("shrink_index", "maxiter"))
def nbinom_glm_batch(
    design_matrix: jnp.ndarray,
    counts: jnp.ndarray,
    size: jnp.ndarray,
    offset: jnp.ndarray,
    prior_no_shrink_scale: float,
    prior_scale: float,
    shrink_index: int = 1,
    maxiter: int = 60,
):
    """Batched apeGLM MAP fit.

    Returns
    -------
    beta : (G, P) MAP coefficients.
    inv_hessian : (G, P, P) inverse Hessian of the UNscaled objective (for
        posterior SDs, reference pydeseq2/utils.py:1142).
    converged : (G,) bool.
    """
    X = design_matrix
    G = counts.shape[0]
    P = X.shape[1]
    dtype = counts.dtype
    pns = jnp.asarray(prior_no_shrink_scale, dtype)
    ps = jnp.asarray(prior_scale, dtype)

    # Alternating +/-0.1 init as in the reference (pydeseq2/utils.py:1048),
    # except the intercept starts at the log mean normalized count: with very
    # large counts the objective is extremely flat at the origin (the Hessian
    # scale is exp(xbeta)/size) and a scale-aware start keeps Newton in its
    # quadratic-convergence basin. The optimum is unchanged.
    beta_init = jnp.broadcast_to(
        0.1 * (-1.0) ** jnp.arange(P, dtype=dtype), (G, P)
    ).astype(dtype)
    log_norm_mean = jnp.log(
        jnp.maximum((counts * jnp.exp(-offset)[None, :]).mean(-1), 0.1)
    )
    beta_init = beta_init.at[:, 0].set(log_norm_mean)

    # Optimization scale: objective at zero, floored at 1
    # (reference pydeseq2/utils.py:1051-1061).
    cnst = jnp.maximum(
        nbinom_fn_batch(
            jnp.zeros((G, P), dtype), X, counts, size, offset, pns, ps, shrink_index
        ),
        1.0,
    )  # (G,)

    def f(beta):
        return (
            nbinom_fn_batch(beta, X, counts, size, offset, pns, ps, shrink_index)
            / cnst
        )

    # The outer Newton loop is a convergence-driven while_loop: a lane
    # freezes once its per-iteration objective decrease drops below a
    # dtype-scaled relative ftol (10*eps*(|f|+1) of the cnst-scaled
    # objective — same role as scipy L-BFGS-B's ftol stop the reference
    # relies on, pydeseq2/utils.py:1111-1124) on TWO CONSECUTIVE steps, or
    # once its backtracking finds no improving step (an absorbing state:
    # the identical grad/Hessian/step would be recomputed forever). The
    # two-step requirement guards against freezing a lane whose single
    # sub-ftol decrease was objective EVAL NOISE rather than convergence —
    # f32 objective differences near optima are unreliable on TPU (see
    # CLAUDE.md), and a still-moving lane re-arms the counter. The loop
    # ends when every lane is frozen. Sustained sub-ftol progress is eval
    # noise, and the gradient-gated Newton polish below independently
    # drives the iterate to the f32 gradient floor, so the freeze does not
    # change what the polish converges to. (The previous fixed maxiter x 16
    # full-width schedule spent ~4x the evals re-processing converged
    # lanes.)
    ftol = 10.0 * float(jnp.finfo(dtype).eps)

    def outer_cond(state):
        _, _, i, done, _ = state
        return (~jnp.all(done)) & (i < maxiter)

    def body(state):
        beta, f_val, i, done, prev_small = state
        g = _grad(beta, X, counts, size, offset, pns, ps, shrink_index) / cnst[:, None]
        H = _hess(beta, X, counts, size, offset, pns, ps, shrink_index) / cnst[:, None, None]
        Hd = H + 1e-10 * jnp.eye(P, dtype=dtype)[None]
        step = sym_solve(Hd, g)

        def bt(j, carry):
            t, best_beta, best_f, captured = carry
            cand = beta - t[:, None] * step
            f_cand = f(cand)
            improve = (f_cand < best_f) & ~captured
            best_beta = jnp.where(improve[:, None], cand, best_beta)
            best_f = jnp.where(improve, f_cand, best_f)
            return t * 0.5, best_beta, best_f, captured | improve

        t0 = jnp.ones((G,), dtype)
        _, beta_new, f_new, improved = jax.lax.fori_loop(
            0, 16, bt, (t0, beta, f_val, jnp.zeros((G,), bool))
        )
        beta_new = jnp.where(done[:, None], beta, beta_new)
        f_new = jnp.where(done, f_val, f_new)
        small = (f_val - f_new) < ftol * (jnp.abs(f_new) + 1.0)
        done = done | ~improved | (small & prev_small)
        return beta_new, f_new, i + 1, done, small

    beta, f_val, _, _, _ = jax.lax.while_loop(
        outer_cond,
        body,
        (
            beta_init,
            f(beta_init),
            jnp.asarray(0, jnp.int32),
            jnp.zeros((G,), bool),
            jnp.zeros((G,), bool),
        ),
    )

    # f32 polish: the backtracking accept compares objective values, whose
    # f32 eval noise exceeds the true decrease once the iterate is within
    # ~1e-3 of the optimum, so lanes stall there (measured: |beta_f32 -
    # beta_f64| p99 ~2e-3, 34% of lanes left with |g| > 1e-6) even though
    # the f32 GRADIENT at the optimum is clean (~1e-8 scaled). Two exact
    # Newton steps accepted on gradient sup-norm descent (the IRLS-polish
    # pattern, ops/irls.py) restore quadratic contraction to the f32
    # gradient floor; lanes at a genuine non-stationary stop reject the
    # step and keep their flag.
    def polish(i, carry):
        beta, g_s = carry
        H_s = _hess(beta, X, counts, size, offset, pns, ps, shrink_index) / cnst[
            :, None, None
        ] + 1e-10 * jnp.eye(P, dtype=dtype)[None]
        cand = beta - sym_solve(H_s, g_s)
        g_c = _grad(cand, X, counts, size, offset, pns, ps, shrink_index) / cnst[
            :, None
        ]
        better = (
            jnp.isfinite(cand).all(axis=1)
            & (jnp.abs(cand) <= 30.0).all(axis=1)
            & (jnp.abs(g_c).max(axis=1) < jnp.abs(g_s).max(axis=1))
        )
        return (
            jnp.where(better[:, None], cand, beta),
            jnp.where(better[:, None], g_c, g_s),
        )

    g_scaled = _grad(beta, X, counts, size, offset, pns, ps, shrink_index) / cnst[
        :, None
    ]
    beta, g_final = jax.lax.fori_loop(0, 2, polish, (beta, g_scaled))
    converged = (
        jnp.isfinite(beta).all(axis=1) & (jnp.abs(g_final).max(axis=1) < 1e-6)
    )

    H_unscaled = _hess(beta, X, counts, size, offset, pns, ps, shrink_index)
    inv_hessian = sym_inv(H_unscaled)
    return beta, inv_hessian, converged


@partial(jax.jit, static_argnames=("shrink_index", "grid_length", "min_beta", "max_beta"))
def grid_fit_shrink_beta_batch(
    counts: jnp.ndarray,
    offset: jnp.ndarray,
    design_matrix: jnp.ndarray,
    size: jnp.ndarray,
    prior_no_shrink_scale: float,
    prior_scale: float,
    scale_cnst: jnp.ndarray,
    shrink_index: int = 1,
    grid_length: int = 60,
    min_beta: float = -30.0,
    max_beta: float = 30.0,
):
    """Vectorized coarse->fine 2-D grid for the apeGLM objective (P == 2).

    Parity: reference pydeseq2/grid_search.py:224-320.
    """
    X = design_matrix
    dtype = counts.dtype
    pns = jnp.asarray(prior_no_shrink_scale, dtype)
    ps = jnp.asarray(prior_scale, dtype)
    G = counts.shape[0]

    def eval_row(x_val_g, y_grid_g):
        # x_val_g: (G,), y_grid_g: (G, K) -> objective (G, K)
        K = y_grid_g.shape[1]
        betas = jnp.stack(
            [jnp.broadcast_to(x_val_g[:, None], (G, K)), y_grid_g], axis=-1
        )  # (G, K, 2)
        flat = betas.reshape(G * K, 2)
        rep = lambda a: jnp.repeat(a, K, axis=0)
        obj = nbinom_fn_batch(
            flat, X, rep(counts), jnp.repeat(size, K), offset, pns, ps, shrink_index
        )
        return obj.reshape(G, K) / scale_cnst[:, None]

    def search(x_grid_g, y_grid_g):
        # x_grid_g, y_grid_g: (G, K). Scan over x index to bound memory.
        K = x_grid_g.shape[1]

        def body(carry, k):
            best_f, best_x, best_y = carry
            fvals = eval_row(x_grid_g[:, k], y_grid_g)  # (G, K)
            j = jnp.argmin(fvals, axis=1)
            f_row = jnp.take_along_axis(fvals, j[:, None], 1)[:, 0]
            better = f_row < best_f
            return (
                (
                    jnp.where(better, f_row, best_f),
                    jnp.where(better, x_grid_g[:, k], best_x),
                    jnp.where(better, jnp.take_along_axis(y_grid_g, j[:, None], 1)[:, 0], best_y),
                ),
                None,
            )

        init = (
            jnp.full((G,), jnp.inf, dtype),
            jnp.zeros((G,), dtype),
            jnp.zeros((G,), dtype),
        )
        (f, bx, by), _ = jax.lax.scan(body, init, jnp.arange(K))
        return f, bx, by

    base = jnp.linspace(min_beta, max_beta, grid_length, dtype=dtype)
    base_g = jnp.broadcast_to(base, (G, grid_length))
    _, bx, by = search(base_g, base_g)
    delta = base[1] - base[0]
    offs = jnp.linspace(-delta, delta, grid_length, dtype=dtype)
    _, fx, fy = search(bx[:, None] + offs[None, :], by[:, None] + offs[None, :])
    return jnp.stack([fx, fy], axis=1)
