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


def _digamma_stirling8(z: jnp.ndarray) -> jnp.ndarray:
    """psi(z) = d/dz lgamma(z), exactly the autodiff derivative of
    :func:`_lgamma_stirling8` (8-step shift + asymptotic series): log and
    divides only."""
    w = z + 8.0
    iw = 1.0 / w
    iw2 = iw * iw
    recip = (
        1.0 / z
        + 1.0 / (z + 1.0)
        + 1.0 / (z + 2.0)
        + 1.0 / (z + 3.0)
        + 1.0 / (z + 4.0)
        + 1.0 / (z + 5.0)
        + 1.0 / (z + 6.0)
        + 1.0 / (z + 7.0)
    )
    series = iw2 * ((1.0 / 12.0) - iw2 * ((1.0 / 120.0) - iw2 * (1.0 / 252.0)))
    return jnp.log(w) - 0.5 * iw - series - recip


def _trigamma_stirling8(z: jnp.ndarray) -> jnp.ndarray:
    """psi'(z), the derivative of :func:`_digamma_stirling8`: divides only."""
    w = z + 8.0
    iw = 1.0 / w
    iw2 = iw * iw
    recip2 = (
        1.0 / z**2
        + 1.0 / (z + 1.0) ** 2
        + 1.0 / (z + 2.0) ** 2
        + 1.0 / (z + 3.0) ** 2
        + 1.0 / (z + 4.0) ** 2
        + 1.0 / (z + 5.0) ** 2
        + 1.0 / (z + 6.0) ** 2
        + 1.0 / (z + 7.0) ** 2
    )
    series = iw * iw2 * ((1.0 / 6.0) - iw2 * ((1.0 / 30.0) - iw2 * (1.0 / 42.0)))
    return iw + 0.5 * iw2 + series + recip2


def _digamma_fast(z: jnp.ndarray):
    """Dtype-gated (psi, psi'): Stirling-shift forms in f32 (matching
    :func:`_lgamma_fast`'s autodiff chain), library digamma/polygamma in
    f64 (matching the library gammaln's autodiff chain)."""
    if z.dtype == jnp.float32:
        return _digamma_stirling8(z), _trigamma_stirling8(z)
    from jax.scipy.special import digamma, polygamma

    return digamma(z), polygamma(1, z)


def nb_nll_centered_fgh(
    counts: jnp.ndarray, mu: jnp.ndarray, la: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    r"""Value, gradient and curvature of :func:`nb_nll_centered` in log-alpha.

    Closed-form (f, g, h) with g = df/d(la), h = d^2 f/d(la)^2, la =
    log(alpha), per lane — the same dual-branch (r >= 8 Stirling-difference
    vs plain) selection and the same dtype-gated lgamma/digamma
    approximations autodiff would differentiate through, but evaluated in
    ONE pass with the transcendentals (lgamma/psi of y + r, two log1p)
    shared across f, g and h. The dispersion Newton previously obtained
    (f, g, h) by a jvp-over-vjp of the objective, whose generated chain
    cost ~8x a plain objective evaluation on TPU (measured 11.6 ms vs 1.5
    ms per (6000, 10000) f32 pass); this form is ~2.5x a plain evaluation.

    Derivatives use dr/d(la) = -r, du/d(la) = u, dv/d(la) = v for
    u = y/r, v = mu/r. Validated against jax.jvp/vjp of the objective in
    tests/test_ops.py (f64 to 1e-9 relative, f32 to 1e-4).
    """
    counts = jnp.asarray(counts)
    mu = jnp.asarray(mu)
    r = jnp.exp(-la)[..., None]
    y = counts

    u = y / r
    v = mu / r
    l1p_u = jnp.log1p(u)
    l1p_v = jnp.log1p(v)
    yr = y + r
    s_u = y / yr  # u/(1+u)
    s_v = mu / (mu + r)  # v/(1+v)
    q_u = y * r / yr**2  # d s_u / d la
    q_v = mu * r / (mu + r) ** 2  # d s_v / d la

    # ---- stable branch (r >= 8): Stirling-difference form -----------------
    iyr = 1.0 / yr
    iyr2 = iyr * iyr
    ir = 1.0 / r
    ir3 = ir * ir * ir
    f_st = (
        -r * (l1p_u - u)
        - (y - 0.5) * l1p_u
        + r * (l1p_v - v)
        + y * l1p_v
        + y * ir * iyr / 12.0
        + (iyr2 * iyr - ir3) / 360.0
    )
    # T5 = y/(12 r yr): dT5 = y (y + 2r) / (12 r yr^2)
    dT5 = y * (y + 2.0 * r) * ir * iyr2 / 12.0
    # T6 = (yr^-3 - r^-3)/360: dT6 = (r yr^-4 - r^-3)/120
    dT6 = (r * iyr2 * iyr2 - ir3) / 120.0
    g_st = (
        r * (l1p_u - s_u)
        - (y - 0.5) * s_u
        - r * (l1p_v - s_v)
        + y * s_v
        + dT5
        + dT6
    )
    # d2T5 = y (y^2 + 3 r y + 4 r^2) / (12 r yr^3)
    d2T5 = y * (y * y + 3.0 * r * y + 4.0 * r * r) * ir * iyr2 * iyr / 12.0
    # d2T6 = (-r yr^-4 + 4 r^2 yr^-5 - 3 r^-3)/120
    d2T6 = (-r * iyr2 * iyr2 + 4.0 * r * r * iyr2 * iyr2 * iyr - 3.0 * ir3) / 120.0
    h_st = (
        -r * (l1p_u - s_u)
        + r * (s_u - q_u)
        - (y - 0.5) * q_u
        + r * (l1p_v - s_v)
        - r * (s_v - q_v)
        + y * q_v
        + d2T5
        + d2T6
    )

    # ---- plain branch (r < 8) ---------------------------------------------
    log_r = jnp.log(r)
    lg_yr = _lgamma_fast(yr)
    lg_r = gammaln(r)
    psi_yr, tri_yr = _digamma_fast(yr)
    psi_r, tri_r = _digamma_fast(r)
    f_pl = -r * log_r - lg_yr + lg_r + yr * (log_r + l1p_v) - mu
    # (y + r)/(mu + r) = s_v + (y - mu + mu... ) -> use yr/(mu+r) directly
    yr_over = yr / (mu + r)
    g_pl = r * (1.0 + psi_yr - psi_r - l1p_v - yr_over)
    h_pl = (
        r * (l1p_v - 1.0 - s_v + psi_r - psi_yr)
        + r * r * (tri_r - tri_yr)
        + r * (y + 2.0 * r) / (mu + r)
        - r * r * yr / (mu + r) ** 2
    )

    sel = r < _R_SWITCH
    f = jnp.where(sel, f_pl, f_st).sum(-1)
    g = jnp.where(sel, g_pl, g_st).sum(-1)
    h = jnp.where(sel, h_pl, h_st).sum(-1)
    return f, g, h


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
