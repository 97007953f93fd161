"""Dispersion-trend gamma GLM fit (2 parameters, projected Newton).

Parity target (reference, owkin/PyDESeq2):
pydeseq2/default_inference.py:200-230 - scipy L-BFGS-B on the gamma-deviance
loss mean(y/mu + log(mu)) with mu = c0 + c1/normed_mean and bounds
c >= 1e-12. Here it is a tiny fixed-iteration projected Newton in JAX; the
iterated gene-exclusion loop around it lives in the model layer
(reference pydeseq2/dds.py:1199-1275).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_LOWER = 1e-12


@partial(jax.jit, static_argnames=("maxiter",))
def gamma_glm_trend_fit(
    covariates: jnp.ndarray,
    targets: jnp.ndarray,
    valid: jnp.ndarray,
    maxiter: int = 60,
):
    """Fit coeffs (a0, a1) minimizing nanmean(y/mu + log mu), mu = a0 + a1*x.

    Parameters
    ----------
    covariates : (G,) 1/normed_mean values.
    targets : (G,) genewise dispersions.
    valid : (G,) bool mask of genes currently included in the fit.

    Returns
    -------
    coeffs : (2,) fitted coefficients.
    predictions : (G,) mu evaluated at all covariates (including masked ones).
    converged : scalar bool.
    """
    dtype = targets.dtype
    x = jnp.stack([jnp.ones_like(covariates), covariates], axis=1)  # (G, 2)
    w = valid.astype(dtype)
    n = jnp.maximum(w.sum(), 1.0)

    def loss(c):
        mu = x @ c
        mu_safe = jnp.maximum(mu, _LOWER)
        per = targets / mu_safe + jnp.log(mu_safe)
        return jnp.sum(jnp.where(valid, per, 0.0)) / n

    grad = jax.grad(loss)

    def fisher(c):
        # Expected information of the gamma GLM with identity link:
        # E[d2 loss] = X^T diag(1/mu^2) X / n - always PSD, so Fisher-scoring
        # steps are descent directions even where the exact Hessian is
        # indefinite (which it is at the [1, 1] init on real dispersion data).
        mu = jnp.maximum(x @ c, _LOWER)
        wgt = w / mu**2
        return (x.T * wgt) @ x / n

    # Both loops are convergence-driven while_loops, not fixed-trip foris:
    # every iteration is a handful of (G,) reductions whose cost is kernel
    # latency, not flops, so evaluating 60 x 20 steps when Newton converges
    # in ~10 outer trips (2 parameters, quadratic contraction) made this
    # tiny fit one of the larger stages of the fused program (~12 ms of a
    # 99 ms wall at 100x60k — prefix-DCE attribution in ROOFLINE.json).

    def bt_cond(carry):
        j, t, best_c, best_f, done = carry
        return ~done & (j < 20)

    def outer_cond(state):
        i, c, f_val, stalled = state
        return ~stalled & (i < maxiter)

    def body(state):
        i, c, f_val, _ = state
        g = grad(c)
        H = fisher(c) + 1e-12 * jnp.eye(2, dtype=dtype)
        step = jnp.linalg.solve(H, g)

        def bt(carry):
            j, t, best_c, best_f, done = carry
            cand = jnp.maximum(c - t * step, _LOWER)
            f_cand = loss(cand)
            improve = f_cand < best_f
            best_c = jnp.where(improve, cand, best_c)
            best_f = jnp.where(improve, f_cand, best_f)
            return j + 1, t * 0.5, best_c, best_f, done | improve

        _, _, c_new, f_new, improved = jax.lax.while_loop(
            bt_cond,
            bt,
            (
                jnp.asarray(0, jnp.int32),
                jnp.asarray(1.0, dtype),
                c,
                f_val,
                jnp.asarray(False),
            ),
        )
        # Stop when backtracking found nothing, or the accepted decrease
        # fell below eval roundoff — further trips only burn latency.
        tiny = 10.0 * jnp.finfo(dtype).eps * (jnp.abs(f_val) + 1.0)
        stalled = ~improved | (f_val - f_new <= tiny)
        return i + 1, c_new, f_new, stalled

    c0 = jnp.array([1.0, 1.0], dtype=dtype)
    _, coeffs, f_val, _ = jax.lax.while_loop(
        outer_cond, body, (jnp.asarray(0, jnp.int32), c0, loss(c0), jnp.asarray(False))
    )
    predictions = x @ coeffs
    # Converged = projected Newton decrement below a dtype-scaled relative
    # tolerance. An absolute gradient threshold misreports in f32: the fit
    # lands at the f64 optimum to ~1e-4 relative, but the gradient noise
    # floor sits above any fixed cutoff tight enough for f64, and a false
    # "not converged" here forces the model layer into the mean-trend
    # fallback on data the reference fits parametrically.
    g_final = grad(coeffs)
    at_bound = (coeffs <= _LOWER * (1 + 1e-9)) & (g_final > 0)
    pg = jnp.where(at_bound, 0.0, g_final)
    H_final = fisher(coeffs) + 1e-12 * jnp.eye(2, dtype=dtype)
    decrement = 0.5 * pg @ jnp.linalg.solve(H_final, pg)
    ftol = 1e3 * jnp.finfo(dtype).eps
    converged = jnp.isfinite(f_val) & (decrement <= ftol * (jnp.abs(f_val) + 1.0))
    return coeffs, predictions, converged
