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

    def body(i, state):
        c, f_val = state
        g = grad(c)
        H = fisher(c) + 1e-12 * jnp.eye(2, dtype=dtype)
        step = jnp.linalg.solve(H, g)

        def bt(j, carry):
            t, best_c, best_f, done = carry
            cand = jnp.maximum(c - t * step, _LOWER)
            f_cand = loss(cand)
            improve = (f_cand < best_f) & ~done
            best_c = jnp.where(improve, cand, best_c)
            best_f = jnp.where(improve, f_cand, best_f)
            return t * 0.5, best_c, best_f, done | improve

        _, c_new, f_new, _ = jax.lax.fori_loop(
            0, 20, bt, (jnp.asarray(1.0, dtype), c, f_val, jnp.asarray(False))
        )
        return c_new, f_new

    c0 = jnp.array([1.0, 1.0], dtype=dtype)
    coeffs, f_val = jax.lax.fori_loop(0, maxiter, body, (c0, loss(c0)))
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
