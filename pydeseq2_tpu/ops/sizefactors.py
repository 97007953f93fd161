"""Batched trimmed-likelihood size-factor optimization (iterative mode).

Parity target (reference, owkin/PyDESeq2): the inner optimization of
``_fit_iterate_size_factors`` (pydeseq2/dds.py:1486-1532) — minimise the
summed NB negative log-likelihood of the best ``quant``-fraction of genes
over per-sample log size factors.

TPU design: the reference hands scipy Powell an N-dimensional vector, which
is hopeless past a few hundred samples (it walls at 10k). But with the
trimmed gene set held fixed, the objective SEPARATES per sample:

    sum_{i in keep} nll_i = sum_j [ sum_{i in keep} nll_ij(s_j) ]

and each per-sample term is CONVEX in s_j = log sf_j (the Hessian
mu r (y+r)/(mu+r)^2 is nonnegative). So the device solver alternates
(a) recompute the per-gene NLL and the kept-gene set at the current size
factors — the reference recomputes the trim inside every objective
evaluation too — with (b) a few guarded Newton steps on all samples at
once. Everything is (G, N) elementwise math plus per-axis reductions: one
jit program, no per-sample control flow, shards over the gene mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pydeseq2_tpu.ops.nb import nb_nll


@partial(jax.jit, static_argnames=("quant", "outer_iters", "newton_iters"))
def trimmed_sf_newton(
    counts: jnp.ndarray,
    base_mu: jnp.ndarray,
    disp: jnp.ndarray,
    log_sf0: jnp.ndarray,
    quant: float = 0.95,
    outer_iters: int = 6,
    newton_iters: int = 8,
) -> jnp.ndarray:
    """Minimise the trimmed NB NLL over per-sample log size factors.

    Parameters
    ----------
    counts : (G, N) gene-major counts (non-zero genes only).
    base_mu : (G, N) size-factor-free baseline means (mu_hat / sf).
    disp : (G,) dispersions.
    log_sf0 : (N,) starting log size factors.
    quant : trim quantile — genes with per-gene NLL at or above the
        ``quant`` quantile are excluded from the sum (reference
        pydeseq2/dds.py:1497-1499).

    Returns the optimized (N,) log size factors, NOT recentred (the caller
    subtracts the mean, reference dds.py:1530-1532).
    """
    r = (1.0 / disp)[:, None]  # (G, 1)
    y = counts

    def keep_mask(log_sf):
        mu = base_mu * jnp.exp(log_sf)[None, :]
        per_gene = nb_nll(y, mu, disp)  # (G,)
        q = jnp.quantile(per_gene, quant)
        return per_gene < q

    def newton_step(log_sf, keep):
        mu = base_mu * jnp.exp(log_sf)[None, :]
        # d/ds nll_ij = mu (y + r)/(mu + r) - y ;  d2/ds2 = mu r (y+r)/(mu+r)^2
        w = (y + r) / (mu + r)
        g = jnp.where(keep[:, None], mu * w - y, 0.0).sum(axis=0)
        h = jnp.where(keep[:, None], mu * r * w / (mu + r), 0.0).sum(axis=0)
        # Convex per-sample objective: full Newton, clipped to +-1 in log
        # space as a safeguard against overshoot far from the optimum.
        step = jnp.where(h > 0, g / h, jnp.sign(g))
        return log_sf - jnp.clip(step, -1.0, 1.0)

    def outer(log_sf, _):
        keep = keep_mask(log_sf)
        log_sf = jax.lax.fori_loop(
            0, newton_iters, lambda i, s: newton_step(s, keep), log_sf
        )
        return log_sf, None

    log_sf, _ = jax.lax.scan(outer, log_sf0, None, length=outer_iters)
    return log_sf
