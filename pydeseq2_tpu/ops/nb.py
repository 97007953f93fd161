"""Negative-binomial log-likelihood kernels, batched over genes.

The NB(μ, α) parameterization follows DESeq2: the variance is μ + α μ².
Behavioral parity target: reference pydeseq2/utils.py:163-270 (``nb_nll``,
``dnb_nll``) and pydeseq2/grid_search.py:7-51 (``vec_nb_nll``) — but computed
here as gene-major batched VPU kernels: counts/mu are (..., N) tiles and alpha
broadcasts over the leading (gene) axes, so a single fused XLA program
evaluates the likelihood for a whole gene block at once.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln


def nb_nll(counts: jnp.ndarray, mu: jnp.ndarray, alpha) -> jnp.ndarray:
    r"""Batched negative log-likelihood of NB(``mu``, ``alpha``).

    .. math::
        \ell(\mu, \alpha) = \frac{n}{\alpha} \log(\alpha)
            + \sum_i \Big[ -\log \binom{y_i + 1/\alpha - 1}{y_i}
            + (1/\alpha + y_i) \log(1/\alpha + \mu_i) - y_i \log \mu_i \Big]

    Parameters
    ----------
    counts : ndarray
        Observed counts, shape (..., N). Leading axes are gene lanes.
    mu : ndarray
        NB means, broadcastable to ``counts``.
    alpha : ndarray or float
        Dispersions, broadcastable to the leading axes of ``counts``.

    Returns
    -------
    ndarray
        Per-lane negative log-likelihood, shape ``counts.shape[:-1]``.
    """
    counts = jnp.asarray(counts)
    mu = jnp.asarray(mu)
    alpha = jnp.asarray(alpha)
    n = counts.shape[-1]
    alpha_neg1 = 1.0 / alpha[..., None]
    logbinom = (
        gammaln(counts + alpha_neg1) - gammaln(counts + 1.0) - gammaln(alpha_neg1)
    )
    # y * log(mu) with the convention 0 * log(anything) = 0 so that all-zero
    # lanes with mu -> 0 stay finite (matches numpy's 0 * -inf handling only
    # when counts > 0 wherever mu == 0 is impossible; guard explicitly).
    ylogmu = jnp.where(counts > 0, counts * jnp.log(mu), 0.0)
    per_sample = -logbinom + (counts + alpha_neg1) * jnp.log(mu + alpha_neg1) - ylogmu
    return (n / alpha) * jnp.log(alpha) + per_sample.sum(-1)


def dnb_nll(counts: jnp.ndarray, mu: jnp.ndarray, alpha) -> jnp.ndarray:
    """Batched gradient of :func:`nb_nll` with respect to ``alpha``.

    Parity target: reference pydeseq2/utils.py:237-270. Uses the digamma
    identity rather than autodiff so the same closed form is available inside
    custom solvers.

    Returns the derivative with the same leading shape as ``alpha`` broadcast
    against the gene lanes of ``counts``.
    """
    from jax.scipy.special import digamma

    counts = jnp.asarray(counts)
    mu = jnp.asarray(mu)
    alpha = jnp.asarray(alpha)
    alpha_neg1 = 1.0 / alpha[..., None]
    term = (
        digamma(alpha_neg1)
        - digamma(counts + alpha_neg1)
        + jnp.log1p(mu * alpha[..., None])
        + (counts - mu) / (mu + alpha_neg1)
    )
    ll_part = (1.0 / alpha**2) * term.sum(-1)
    return -ll_part
