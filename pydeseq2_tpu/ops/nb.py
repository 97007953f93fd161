"""Negative-binomial log-likelihood kernels, batched over genes.

The NB(mu, alpha) parameterization follows DESeq2: the variance is
mu + alpha mu^2. Behavioral parity target: reference pydeseq2/utils.py:163-270
(``nb_nll``, ``dnb_nll``) and pydeseq2/grid_search.py:7-51 (``vec_nb_nll``) -
but computed here as gene-major batched VPU kernels: counts/mu are (..., N)
tiles and alpha broadcasts over the leading (gene) axes, so a single fused
XLA program evaluates the likelihood for a whole gene block at once.

Numerical stability: with r = 1/alpha up to 1e8 (min_disp = 1e-8) the naive
form computes gammaln(y + r) - gammaln(r) ~ 1e9 - 1e9 and the O(100) signal
is destroyed in float32 (and wastes bits in float64). For r >= 8 we therefore
use the cancellation-free Stirling-difference form, where the huge
r log r terms cancel analytically:

    per_i = lgamma(y+1) + y - (y + r - 1/2) log1p(y/r)
            + (y + r) log1p(mu/r) - y log(mu) + y / (12 r (y+r))

whose terms are all O(y + mu). This keeps the whole pipeline valid in f32 on
TPU (validated against f64 in tests) and reduces per-evaluation lgamma calls
to the K-invariant lgamma(y+1).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

_R_SWITCH = 8.0  # Stirling-difference form is used for r = 1/alpha >= 8

_HALF_LOG_2PI = 0.9189385332046727


def _lgamma_stirling8(z: jnp.ndarray) -> jnp.ndarray:
    """log Gamma(z) for z > 0 via an 8-step shift + Stirling series.

    gammaln(z) = gammaln(z + 8) - log(prod_{k=0}^{7} (z + k)), with
    gammaln(z + 8) from the Stirling series at w = z + 8 >= 8 (Bernoulli
    terms through 1/w^5; remainder ~3e-10 absolute at w = 8, far below f32
    rounding). The product is split in two so it cannot overflow f32 for
    counts up to ~1e7. Why not the library gammaln: its BACKWARD is a
    digamma evaluation — on the dispersion solver's Newton path that
    transcendental (both in the forward objective and through autodiff)
    dominated the stage wall; this form's forward is 3 logs and its
    autodiff backward is divides only. f32-only (the f64 CPU golden path
    keeps the library call bit-for-bit).
    """
    p1 = z * (z + 1.0) * (z + 2.0) * (z + 3.0)
    p2 = (z + 4.0) * (z + 5.0) * (z + 6.0) * (z + 7.0)
    w = z + 8.0
    iw = 1.0 / w
    iw2 = iw * iw
    series = iw * (
        (1.0 / 12.0) - iw2 * ((1.0 / 360.0) - iw2 * (1.0 / 1260.0))
    )
    return (
        (w - 0.5) * jnp.log(w)
        - w
        + _HALF_LOG_2PI
        + series
        - jnp.log(p1)
        - jnp.log(p2)
    )


def _lgamma_fast(z: jnp.ndarray) -> jnp.ndarray:
    """Dtype-gated gammaln: Stirling-shift form in f32, library in f64."""
    if z.dtype == jnp.float32:
        return _lgamma_stirling8(z)
    return gammaln(z)


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
        Per-lane negative log-likelihood, shape of the broadcast leading axes.

    Parity: reference pydeseq2/utils.py:163-234 (scalar- and vector-alpha
    forms), evaluated with the large-r stable reformulation above.
    """
    counts = jnp.asarray(counts)
    mu = jnp.asarray(mu)
    alpha = jnp.asarray(alpha)
    r = 1.0 / alpha[..., None]

    ylogmu = jnp.where(counts > 0, counts * jnp.log(mu), 0.0)
    lgy1 = gammaln(counts + 1.0)

    # Plain form (selected for r < 8; harmless garbage elsewhere, discarded).
    # The per-sample share of the n * (1/alpha) * log(alpha) prefactor is
    # r * log(1/r) = -r log r.
    logbinom = gammaln(counts + r) - lgy1 - gammaln(r)
    plain = (
        -r * jnp.log(r)
        - logbinom
        + (counts + r) * jnp.log(mu + r)
        - ylogmu
    )

    # Stable Stirling-difference form (r >= 8): huge terms cancel exactly.
    l1y = jnp.log1p(counts / r)
    l1m = jnp.log1p(mu / r)
    yr = counts + r
    stable = (
        lgy1
        + counts
        - (yr - 0.5) * l1y
        + yr * l1m
        - ylogmu
        + counts / (12.0 * r * yr)  # first Stirling-difference correction
        + (1.0 / yr**3 - 1.0 / r**3) / 360.0  # second correction (r >= 8)
    )

    per = jnp.where(r < _R_SWITCH, plain, stable)
    return per.sum(-1)


def nb_nll_centered(
    counts: jnp.ndarray, mu: jnp.ndarray, alpha, branch: str = "auto"
) -> jnp.ndarray:
    r"""``nb_nll`` minus its alpha-independent Poisson-limit constant.

    The NB NLL is dominated by a Poisson bulk ``mu - y log mu + lgamma(y+1)``
    that does not depend on alpha; in f32 that bulk (O(1e4) per sample)
    swamps the O(y^2/r) alpha-signal, which is why dispersion optimization
    in f32 collapses with the raw objective. Subtracting the constant
    *analytically* leaves, for r = 1/alpha >= 8 (with u = y/r, v = mu/r and
    L1(x) = log1p(x) - x):

        c_i = -r L1(u) - (y - 1/2) log1p(u) + r L1(v) + y log1p(v) + ...

    every term of which is O(y^2/r) and f32-exact in the absolute sense.
    The argmin over alpha is unchanged, so this is the objective used by the
    dispersion solvers.

    ``branch`` selects which form to evaluate: ``"auto"`` computes both and
    selects per element (general case); ``"plain"``/``"stable"`` evaluate a
    single branch, for callers that statically know every lane satisfies
    r < 8 resp. r >= 8 (the dispersion coarse grid scan, whose per-step
    log-alpha is a static constant shared by all lanes) - this halves the
    transcendental work of those steps.
    """
    counts = jnp.asarray(counts)
    mu = jnp.asarray(mu)
    alpha = jnp.asarray(alpha)
    r = 1.0 / alpha[..., None]

    def plain_branch():
        # r < 8: plain minus Poisson (moderate magnitudes, mild
        # cancellation; y log mu and lgamma(y+1) cancel analytically).
        # gammaln(counts + r) is the (G, N) transcendental on the Newton
        # hot path — _lgamma_fast swaps in the Stirling-shift form in f32
        # (cheap forward, divide-only backward); gammaln(r) is (G, 1) and
        # keeps the library call.
        return (
            -r * jnp.log(r)
            - _lgamma_fast(counts + r)
            + gammaln(r)
            + (counts + r) * jnp.log(mu + r)
            - mu
        )

    def stable_branch():
        # r >= 8: fully cancellation-free.
        u = counts / r
        v = mu / r
        l1p_u = jnp.log1p(u)
        l1p_v = jnp.log1p(v)
        yr = counts + r
        return (
            -r * (l1p_u - u)
            - (counts - 0.5) * l1p_u
            + r * (l1p_v - v)
            + counts * l1p_v
            + counts / (12.0 * r * yr)
            + (1.0 / yr**3 - 1.0 / r**3) / 360.0
        )

    if branch == "plain":
        per = plain_branch()
    elif branch == "stable":
        per = stable_branch()
    else:
        # Dual-branch evaluation with the (G, N) transcendentals SHARED:
        # log(mu + r) = log r + log1p(mu/r), so the plain branch rides the
        # stable branch's l1p_v and the only plain-exclusive heavy op is the
        # lgamma — 3 transcendental groups instead of 4. This is the Newton
        # hot path of the dispersion solvers (the grid scans use the static
        # single-branch forms).
        u = counts / r
        v = mu / r
        l1p_u = jnp.log1p(u)
        l1p_v = jnp.log1p(v)
        yr = counts + r
        log_r = jnp.log(r)  # (G, 1): per-lane, cheap
        plain = (
            -r * log_r
            - _lgamma_fast(yr)
            + gammaln(r)
            + yr * (log_r + l1p_v)
            - mu
        )
        stable = (
            -r * (l1p_u - u)
            - (counts - 0.5) * l1p_u
            + r * (l1p_v - v)
            + counts * l1p_v
            + counts / (12.0 * r * yr)
            + (1.0 / yr**3 - 1.0 / r**3) / 360.0
        )
        per = jnp.where(r < _R_SWITCH, plain, stable)
    return per.sum(-1)


def dnb_nll(counts: jnp.ndarray, mu: jnp.ndarray, alpha) -> jnp.ndarray:
    """Batched gradient of :func:`nb_nll` with respect to ``alpha``.

    Parity target: reference pydeseq2/utils.py:237-270. Uses the digamma
    identity rather than autodiff so the same closed form is available inside
    custom solvers.
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
