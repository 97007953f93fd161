"""Fully-fused single-program DESeq2 Wald pipeline (jit end-to-end).

This is the TPU "flagship model": the entire per-gene analysis - size-factor
normalization, MoM dispersions, mu initialization, genewise dispersion MLE,
trend + prior, MAP dispersions, IRLS LFC fitting and Wald statistics - as ONE
jit-compiled program over a gene-major (G, N) counts tile. No host roundtrips,
no data-dependent Python control flow: all-zero genes are masked lanes, the
trend is the trimmed-mean curve (the reference's "mean" fit type,
pydeseq2/dds.py:1277-1299), and every solver is the batched kernel from
:mod:`pydeseq2_tpu.ops`.

Compared with the stage-by-stage :class:`DeseqDataSet` driver (which matches
the reference's stage semantics exactly, including the host-side parametric
trend-exclusion loop and Cook's refitting), this fused path trades the two
host-interleaved stages for a single XLA program - the layout used for
benchmarking, for multi-chip sharding (shard the G axis of every gene-major
operand over a 1-D mesh; XLA inserts psum/all-gathers for the trend and prior
reductions automatically), and for embedding in larger JAX programs.

The parametric trend variant is also available: coefficients are fitted with
the same Fisher-scoring gamma GLM, but the gene-exclusion iteration is fixed
at ``trend_rounds`` rounds with masking instead of dynamic drops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pydeseq2_tpu.ops import stats as stats_ops
from pydeseq2_tpu.ops.dispersion import alpha_mle_batch
from pydeseq2_tpu.ops.irls import (
    grid_fit_beta_batch,
    hat_diagonals,
    irls_beta_init,
    irls_core,
    newton_box_nbglm,
)
from pydeseq2_tpu.ops.linreg import (
    fit_lin_mu_batch,
    fit_moments_dispersions_batch,
    fit_rough_dispersions_batch,
)
from pydeseq2_tpu.ops.select import masked_median_select
from pydeseq2_tpu.ops.trend import gamma_glm_trend_fit
from pydeseq2_tpu.ops.wald import wald_test_batch


def _irls_with_rescue(
    counts: jnp.ndarray,
    size_factors: jnp.ndarray,
    design_matrix: jnp.ndarray,
    disp: jnp.ndarray,
    beta_init: jnp.ndarray,
    min_mu: float,
    beta_tol: float,
    phase1_iters: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched IRLS with the full rescue cascade fused into the program.

    The staged backend host-gathers diverged lanes and re-solves them
    (jax_inference.py JaxInference.irls, mirroring the reference cascade at
    pydeseq2/utils.py:374-412); here both rescue tiers run inside the single
    jit program behind ``lax.cond``s, so they only execute at runtime when
    some lane actually needs them: (1) projected-Newton restart from the QR
    ``beta_init`` for diverged/stalled lanes, then (2) for P == 2 designs,
    the vectorized 2-D grid search on lanes where Newton also failed —
    matching the staged backend's full cascade.

    Returns (beta, converged, overflow) where ``overflow`` is the number of
    flagged lanes beyond the compaction budget K (see below) that therefore
    never entered the rescue tiers — 0 in normal operation. Callers surface
    it (the pipelines return it as ``rescue_overflow``; the streamed host
    wrapper warns when it is non-zero) so users are not left inferring a
    hit cap from converged flags.

    Cost note: the IRLS itself is TWO-PHASE. The per-lane iteration counts
    are extremely tail-heavy (measured at 100x60k: 99.2% of lanes converge
    within 6 trips, yet the masked full-width while_loop runs 24 trips for
    the last ~84 stragglers — every trip processing all G lanes). Phase 1
    runs ``maxiter=phase1_iters`` at full width; lanes still unfinished are
    gathered (argsort, flagged-first) into the same compacted (K, N) tile
    the rescue tiers use, K = max(512, G/64), and continue there from their
    current iterate with the remaining 250 - phase1_iters budget. Per-lane
    arithmetic is lane-local (row-wise reductions over N), so lanes that
    converge in phase 1 are bit-identical to the single-phase result; the
    restart only resets the straggler lanes' deviance-history sentinel,
    which can delay (never hasten) their stop by a trip or two.

    If MORE than K lanes are still unfinished after phase 1 (>~1.5% of all
    genes — continuous/many-sample designs where the 1-phase tail CDF the
    constant was tuned on does not hold), the compacted tile cannot hold
    them; instead of freezing the beyond-K lanes at their phase-1 iterate,
    the continuation falls back to the FULL-WIDTH while_loop with the
    remaining 250 - phase1_iters budget — paying the full-width latency
    only in that pathological regime, and restoring the pre-two-phase
    guarantee that every lane gets the whole 250-trip IRLS budget before
    any cap applies.

    The rescue tiers likewise run on the compacted tile; the projected-
    Newton line search evaluates its objective ~780 times, so at full width
    it would dominate the whole pipeline (measured: ~900 ms of a 1.24 s
    program at 60k x 100, and still 31 ms at K = G/16) for what is
    typically a handful of lanes. ``overflow`` therefore counts lanes that
    exhausted the full IRLS budget and needed the rescue tiers but sat
    beyond the K tile: they keep their final IRLS iterate and report
    converged=False, exactly like a reference lane whose optimizer failed
    (the staged backend's host-gathered rescue has no such cap if that
    regime matters).
    """
    if phase1_iters is None:
        phase1_iters = 8  # vast majority of lanes finish by here (measured tail CDF; stragglers continue compacted or full-width)
    beta, needs_fb, converged = irls_core(
        counts, size_factors, design_matrix, disp, beta_init,
        min_mu=min_mu, beta_tol=beta_tol, maxiter=phase1_iters,
    )
    G = counts.shape[0]
    K = min(G, max(512, G // 64))
    # Flagged lanes first: argsort of ~needs_fb puts False (= flagged) at
    # the front; ties keep ascending lane order (argsort is stable).
    order1 = jnp.argsort(~needs_fb)
    idx1 = order1[:K]

    def continue_compacted(operands):
        beta, needs_fb, converged = operands
        sel1 = needs_fb[idx1]
        b2, nfb2, conv2 = irls_core(
            counts[idx1], size_factors, design_matrix, disp[idx1], beta[idx1],
            min_mu=min_mu, beta_tol=beta_tol, maxiter=250 - phase1_iters,
        )
        return (
            beta.at[idx1].set(jnp.where(sel1[:, None], b2, beta[idx1])),
            needs_fb.at[idx1].set(jnp.where(sel1, nfb2, needs_fb[idx1])),
            converged.at[idx1].set(jnp.where(sel1, conv2, converged[idx1])),
        )

    def continue_full_width(operands):
        # Unfinished lanes overflow the K tile: give EVERY unfinished lane
        # the remaining budget at full width (already-finished lanes'
        # outputs are discarded by the mask, so they are untouched).
        beta, needs_fb, converged = operands
        b2, nfb2, conv2 = irls_core(
            counts, size_factors, design_matrix, disp, beta,
            min_mu=min_mu, beta_tol=beta_tol, maxiter=250 - phase1_iters,
        )
        return (
            jnp.where(needs_fb[:, None], b2, beta),
            jnp.where(needs_fb, nfb2, needs_fb),
            jnp.where(needs_fb, conv2, converged),
        )

    n_unfinished = needs_fb.sum()
    branch = jnp.where(n_unfinished > K, 2, jnp.where(n_unfinished > 0, 1, 0))
    beta, needs_fb, converged = jax.lax.switch(
        branch,
        [lambda ops: ops, continue_compacted, continue_full_width],
        (beta, needs_fb, converged),
    )
    # Rescue-tier compaction on the POST-continuation flags (the
    # continuation resolves most phase-1 flags; after a full-width
    # continuation the survivors can sit anywhere in the gene axis).
    overflow = jnp.maximum(needs_fb.sum() - K, 0)
    order = jnp.argsort(~needs_fb)
    idx = order[:K]
    sel = needs_fb[idx]

    def newton_rescue(operands):
        beta, converged = operands
        b_fb, ok = newton_box_nbglm(
            counts[idx],
            size_factors,
            design_matrix,
            disp[idx],
            beta_init[idx],
            min_mu=min_mu,
        )
        new_beta = beta.at[idx].set(jnp.where(sel[:, None], b_fb, beta[idx]))
        new_conv = converged.at[idx].set(jnp.where(sel, ok, converged[idx]))
        return new_beta, new_conv

    beta, converged = jax.lax.cond(
        needs_fb.any(), newton_rescue, lambda ops: ops, (beta, converged)
    )

    if design_matrix.shape[1] == 2:
        # Tertiary grid fallback (reference pydeseq2/utils.py:405-412,
        # grid_search.py:145-221): lanes where the Newton rescue still
        # reports failure take the 2-D grid optimum. still_bad lanes are a
        # subset of the flagged lanes, so the same compacted index covers
        # them.
        still_bad = needs_fb & ~converged
        sel_grid = still_bad[idx]

        def grid_rescue(operands):
            beta, converged = operands
            b_grid = grid_fit_beta_batch(
                counts[idx], size_factors, design_matrix, disp[idx], min_mu=min_mu
            )
            new_beta = beta.at[idx].set(
                jnp.where(sel_grid[:, None], b_grid, beta[idx])
            )
            return new_beta, converged

        beta, converged = jax.lax.cond(
            still_bad.any(), grid_rescue, lambda ops: ops, (beta, converged)
        )
    return beta, converged, overflow


def fit_fused_trend(
    base_mean: jnp.ndarray,
    genewise_m: jnp.ndarray,
    non_zero: jnp.ndarray,
    min_disp: float,
    trend_type: str,
    max_rounds: int = 20,
    return_rounds: bool = False,
) -> tuple[jnp.ndarray, ...]:
    """Dispersion trend curve, fully in-program, with the mean fallback.

    ``parametric``: iterated gamma-GLM fit of alpha(mu) = a1/mu + a0 with
    off-curve gene exclusion (ratio < 1e-4 or >= 15), run as a
    ``lax.while_loop`` until successive coefficient vectors drift < 1e-6 in
    squared log-distance — the reference's convergence rule
    (pydeseq2/dds.py:1236-1263) rather than a fixed round count. When a GLM
    round fails or degenerates (coeff <= 1e-10), the result switches to the
    trimmed-mean trend in-program, mirroring the staged fallback
    (pydeseq2/dds.py:1243-1252).

    ``mean``: trimmed mean (cut 0.001) of dispersions > 10*min_disp
    (pydeseq2/dds.py:1277-1299).

    Returns ``(fitted, trend_coeffs, used_mean, mean_disp)``; ``fitted`` is
    NOT non_zero-masked (callers mask), ``used_mean`` is a traced scalar
    bool (True when the mean trend was used, either by request or via
    fallback). With ``return_rounds=True`` an int32 scalar — the number of
    gamma-GLM exclusion rounds the while_loop ran — is appended (measured
    for the trip-count-aware roofline).
    """
    dtype = base_mean.dtype
    sel = genewise_m > 10.0 * min_disp
    mean_disp = stats_ops.trimmed_mean_masked(genewise_m, sel, 0.001)

    if trend_type == "mean":
        G = base_mean.shape[0]
        out = (
            jnp.full((G,), mean_disp, dtype=dtype),
            jnp.zeros((2,), dtype),
            jnp.asarray(True),
            mean_disp,
        )
        return out + (jnp.asarray(0, jnp.int32),) if return_rounds else out

    covariates = 1.0 / base_mean
    valid0 = non_zero & jnp.isfinite(covariates) & jnp.isfinite(genewise_m)
    # Zero out excluded lanes BEFORE the fit: an inf covariate (all-zero /
    # padding lane, base_mean == 0) poisons jax.grad through the masked loss
    # (inf * 0 = NaN in the chain rule) even though the lane is invalid.
    covariates = jnp.where(valid0, covariates, 0.0)
    targets = jnp.where(valid0, jnp.nan_to_num(genewise_m), 0.0)

    def keep_iterating(state):
        _, _, drift, failed, it = state
        return ~failed & (drift >= 1e-6) & (it < max_rounds)

    def trend_round(state):
        valid, coeffs, _, _, it = state
        new_coeffs, preds, glm_ok = gamma_glm_trend_fit(covariates, targets, valid)
        failed = ~glm_ok | (new_coeffs <= 1e-10).any()
        drift = jnp.sum(jnp.log(jnp.abs(new_coeffs / coeffs)) ** 2)
        ratio = genewise_m / preds
        keep = valid & (ratio >= 1e-4) & (ratio < 15.0)
        return keep, new_coeffs, drift, failed, it + 1

    init = (
        valid0,
        jnp.ones((2,), dtype),  # drift sentinel, as in the staged loop
        jnp.asarray(jnp.inf, dtype),
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
    )
    _, coeffs, _, failed, rounds = jax.lax.while_loop(
        keep_iterating, trend_round, init
    )

    parametric = coeffs[0] + coeffs[1] / base_mean
    fitted = jnp.where(failed, mean_disp, parametric)
    if return_rounds:
        return fitted, coeffs, failed, mean_disp, rounds
    return fitted, coeffs, failed, mean_disp


def _size_factors(
    counts: jnp.ndarray, gene_mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Median-of-ratios on a gene-major (G, N) tile.

    Parity: reference pydeseq2/preprocessing.py:31-102. The per-gene log-mean
    is a reduction over samples; the per-sample median is a reduction over
    genes (the one true cross-gene collective in the whole pipeline).
    ``gene_mask`` excludes padding lanes from the median.
    """
    log_counts = jnp.log(counts)  # -inf where zero
    logmeans = log_counts.mean(axis=1)  # (G,)
    filtered = ~jnp.isinf(logmeans) & gene_mask
    log_ratios = jnp.where(filtered[:, None], log_counts - logmeans[:, None], jnp.inf)
    # Exact sort-free medians (ops/select.py): same order statistics as a
    # per-sample sort at a fraction of the cost when N is large.
    log_medians = masked_median_select(log_ratios, filtered.sum(), axis=0)  # (N,)
    sf = jnp.exp(log_medians)
    return sf, filtered


def _poscounts_size_factors(
    counts: jnp.ndarray, gene_mask: jnp.ndarray
) -> jnp.ndarray:
    """Poscounts size factors on a gene-major (G, N) tile (zero-rich data).

    Parity: reference pydeseq2/dds.py:656-679 — per-gene log-geometric mean
    over POSITIVE counts with a full-N divisor; each sample's median runs
    over the genes that are usable AND positive in that sample (a RAGGED
    median, resolved by the exact sort-free selector); size factors are
    rescaled to geometric mean 1.
    """
    logmeans = jnp.where(counts > 0, jnp.log(jnp.where(counts > 0, counts, 1.0)), 0.0).mean(axis=1)
    usable = jnp.isfinite(logmeans) & (logmeans > 0) & gene_mask
    in_med = usable[:, None] & (counts > 0)
    ratios = jnp.where(
        in_med,
        jnp.log(jnp.where(counts > 0, counts, 1.0)) - logmeans[:, None],
        jnp.inf,
    )
    med = masked_median_select(ratios, in_med.sum(axis=0), axis=0)
    sf = jnp.exp(med)
    return sf / jnp.exp(jnp.mean(jnp.log(sf)))


def _wald_impl(
    counts: jnp.ndarray,
    design_matrix: jnp.ndarray,
    contrast: jnp.ndarray,
    lfc_null: jnp.ndarray,
    gene_mask: jnp.ndarray | None = None,
    size_factors: jnp.ndarray | None = None,
    min_mu: float = 0.5,
    min_disp: float = 1e-8,
    max_disp: float = 10.0,
    beta_tol: float = 1e-8,
    trend_type: str = "parametric",
    trend_rounds: int = 8,
    alt_hypothesis: str | None = None,
    mu_init: str = "linear",
    sf_fit_type: str = "ratio",
):
    """One-program DESeq2 Wald pipeline on a gene-major counts tile.

    ``mu_init`` selects the dispersion-stage mean initialization: "linear"
    (OLS, the reference's choice when design groups are 1:1 with columns)
    or "irls" (one IRLS fit with MoM dispersions, the reference's choice
    otherwise, e.g. continuous covariates - pydeseq2/dds.py:743-765). The
    caller decides host-side since it is a static property of the design.

    Parameters
    ----------
    counts : (G, N) float array
        Raw counts, gene-major. All-zero genes become masked NaN lanes.
    design_matrix : (N, P) replicated design.
    contrast : (P,) contrast vector.
    lfc_null : scalar (natural log).
    gene_mask : (G,) bool, optional
        False for padding lanes (added to make G shard-even). Masked lanes
        are excluded from EVERY global reduction (size-factor median, trend
        fit, prior variance) and return NaN statistics; without this,
        padding would bias the cross-gene statistics.

    Returns
    -------
    dict of per-gene results: size_factors (N,), genewise_dispersions,
    fitted_dispersions, MAP_dispersions, dispersions, lfc (G, P), base_mean,
    wald statistics / se / p-values, hat diagonals and mu for Cook's
    distances.
    """
    G, N = counts.shape
    P = design_matrix.shape[1]
    dtype = counts.dtype
    X = design_matrix

    if gene_mask is None:
        gene_mask = jnp.ones((G,), dtype=bool)

    # --- normalization ----------------------------------------------------
    # ``size_factors`` overrides the in-program estimator (inject iterative /
    # control-gene factors); ``sf_fit_type="poscounts"`` selects the
    # zero-rich estimator (reference normalization modes,
    # pydeseq2/dds.py:584-711).
    if size_factors is not None:
        sf = jnp.asarray(size_factors, dtype)
    elif sf_fit_type == "poscounts":
        sf = _poscounts_size_factors(counts, gene_mask)
    else:
        sf, _ = _size_factors(counts, gene_mask)
    normed = counts / sf[None, :]
    base_mean = normed.mean(axis=1)
    # Folding gene_mask in here propagates the exclusion through every
    # downstream global reduction (trend, prior MAD), which all condition on
    # non_zero / NaN lanes.
    non_zero = ~(counts == 0).all(axis=1) & gene_mask

    # --- MoM dispersions (reference pydeseq2/dds.py:1140-1162) ------------
    rde = fit_rough_dispersions_batch(normed, X)
    mde = fit_moments_dispersions_batch(normed, sf)
    mom = jnp.clip(jnp.minimum(rde, mde), min_disp, max_disp)

    # --- mu init + genewise dispersion MLE --------------------------------
    # The genewise fit also emits its coarse-grid objective values: the MAP
    # fit below shares the same base objective (same counts/mu/design; the
    # prior is an additive per-lane quadratic), so its coarse scan reuses the
    # cache instead of re-evaluating the NB likelihood at all grid points.
    if mu_init == "irls":
        beta_mom, _, mu_overflow = _irls_with_rescue(
            counts, sf, X, mom, irls_beta_init(counts, sf, X),
            min_mu=min_mu, beta_tol=beta_tol,
        )
        # UNthresholded mu, matching irls_solver's return
        # (reference pydeseq2/utils.py:427-437).
        mu_hat = sf[None, :] * jnp.exp(beta_mom @ X.T)
    else:
        mu_overflow = jnp.asarray(0, jnp.int32)
        mu_hat = fit_lin_mu_batch(counts, sf, X, min_mu)
    genewise, _, coarse_cache = alpha_mle_batch(
        counts, X, mu_hat, mom, min_disp, max_disp,
        cr_reg=True, prior_reg=False, return_coarse=True,
        )
    genewise = jnp.clip(genewise, min_disp, max_disp)
    genewise_m = jnp.where(non_zero, genewise, jnp.nan)

    # --- trend (convergence-driven, with in-program mean fallback) ---------
    fitted, trend_coeffs, trend_used_mean, _ = fit_fused_trend(
        base_mean, genewise_m, non_zero, min_disp, trend_type,
        max_rounds=max(trend_rounds, 20),
    )
    fitted_m = jnp.where(non_zero, fitted, jnp.nan)

    # --- dispersion prior (reference pydeseq2/dds.py:840-884) -------------
    disp_resid = jnp.log(genewise_m) - jnp.log(fitted_m)
    above = genewise_m >= 100.0 * min_disp
    resid_sel = jnp.where(above & non_zero, disp_resid, jnp.nan)
    center = jnp.nanmedian(resid_sel)
    mad = jnp.nanmedian(jnp.abs(resid_sel - center)) / 0.6744897501960817
    squared_logres = mad**2
    from jax.scipy.special import polygamma

    prior_disp_var = jnp.maximum(
        squared_logres - polygamma(1, jnp.asarray((N - P) / 2.0, dtype)), 0.25
    )

    # --- MAP dispersions --------------------------------------------------
    map_disp, _ = alpha_mle_batch(
        counts,
        X,
        mu_hat,
        jnp.nan_to_num(fitted_m, nan=0.5),
        min_disp,
        max_disp,
        prior_disp_var=prior_disp_var,
        cr_reg=True,
        prior_reg=True,
        coarse_cache=coarse_cache,
    )
    map_disp = jnp.clip(map_disp, min_disp, max_disp)
    # Shrinkage outliers keep genewise estimates
    outlier = jnp.log(genewise_m) > jnp.log(fitted_m) + 2.0 * jnp.sqrt(squared_logres)
    dispersions = jnp.where(outlier, genewise_m, map_disp)
    dispersions = jnp.where(non_zero, dispersions, jnp.nan)

    # --- LFC via IRLS -----------------------------------------------------
    disp_safe = jnp.nan_to_num(dispersions, nan=0.5)
    beta_init = irls_beta_init(counts, sf, X)
    beta, converged, lfc_overflow = _irls_with_rescue(
        counts, sf, X, disp_safe, beta_init, min_mu=min_mu, beta_tol=beta_tol
    )
    H, mu = hat_diagonals(counts, sf, X, disp_safe, beta, min_mu=min_mu)

    # --- Wald test --------------------------------------------------------
    ridge = 1e-6 * jnp.eye(P, dtype=dtype)
    pvals, stats, se = wald_test_batch(
        X, disp_safe, beta, mu, ridge, contrast, lfc_null, alt_hypothesis
    )

    nanm = lambda a: jnp.where(non_zero, a, jnp.nan)
    return {
        "trend_used_mean": trend_used_mean,
        "trend_coeffs": trend_coeffs,
        "squared_logres": squared_logres,
        "size_factors": sf,
        "base_mean": base_mean,
        "genewise_dispersions": genewise_m,
        "fitted_dispersions": fitted_m,
        "dispersions": dispersions,
        "prior_disp_var": prior_disp_var,
        "lfc": jnp.where(non_zero[:, None], beta, jnp.nan),
        "mu": mu,
        "hat_diagonals": H,
        "p_values": nanm(pvals),
        "statistics": nanm(stats),
        "se": nanm(se),
        "irls_converged": converged,
        # Lanes that needed the rescue cascade but fell beyond its compacted
        # K-lane budget (0 in normal operation; see _irls_with_rescue).
        "rescue_overflow": mu_overflow + lfc_overflow,
        "_normed": normed,
        "_non_zero": non_zero,
        # internal boundary markers for the prefix-DCE roofline
        # (benchmarks/roofline.py): popped before any public surface.
        "_mom": mom,
        "_mu_hat": mu_hat,
    }


@partial(
    jax.jit,
    static_argnames=(
        "min_mu",
        "min_disp",
        "max_disp",
        "beta_tol",
        "trend_type",
        "trend_rounds",
        "alt_hypothesis",
        "mu_init",
        "sf_fit_type",
    ),
)
def wald_pipeline(
    counts: jnp.ndarray,
    design_matrix: jnp.ndarray,
    contrast: jnp.ndarray,
    lfc_null: jnp.ndarray,
    gene_mask: jnp.ndarray | None = None,
    size_factors: jnp.ndarray | None = None,
    min_mu: float = 0.5,
    min_disp: float = 1e-8,
    max_disp: float = 10.0,
    beta_tol: float = 1e-8,
    trend_type: str = "parametric",
    trend_rounds: int = 8,
    alt_hypothesis: str | None = None,
    mu_init: str = "linear",
    sf_fit_type: str = "ratio",
):
    """See :func:`_wald_impl` (this is its jitted public wrapper)."""
    out = _wald_impl(
        counts,
        design_matrix,
        contrast,
        lfc_null,
        gene_mask,
        size_factors,
        min_mu=min_mu,
        min_disp=min_disp,
        max_disp=max_disp,
        beta_tol=beta_tol,
        trend_type=trend_type,
        trend_rounds=trend_rounds,
        alt_hypothesis=alt_hypothesis,
        mu_init=mu_init,
        sf_fit_type=sf_fit_type,
    )
    out.pop("_normed")
    out.pop("_non_zero")
    out.pop("_mom")
    out.pop("_mu_hat")
    return out


@partial(
    jax.jit,
    static_argnames=(
        "cohort_ids",
        "use_for_max",
        "alpha",
        "cooks_filter",
        "independent_filter",
        "min_mu",
        "min_disp",
        "max_disp",
        "beta_tol",
        "trend_type",
        "trend_rounds",
        "alt_hypothesis",
        "mu_init",
        "sf_fit_type",
    ),
)
def summary_pipeline(
    counts: jnp.ndarray,
    design_matrix: jnp.ndarray,
    contrast: jnp.ndarray,
    lfc_null: jnp.ndarray,
    cooks_cutoff: jnp.ndarray,
    gene_mask: jnp.ndarray | None = None,
    size_factors: jnp.ndarray | None = None,
    *,
    cohort_ids: tuple[int, ...] | None = None,
    use_for_max: tuple[bool, ...] | None = None,
    alpha: float = 0.05,
    cooks_filter: bool = True,
    independent_filter: bool = True,
    min_mu: float = 0.5,
    min_disp: float = 1e-8,
    max_disp: float = 10.0,
    beta_tol: float = 1e-8,
    trend_type: str = "parametric",
    trend_rounds: int = 8,
    alt_hypothesis: str | None = None,
    mu_init: str = "linear",
    sf_fit_type: str = "ratio",
):
    """Counts -> padj as ONE jit program: the full DESeq2 analysis.

    Extends :func:`wald_pipeline` with the statistics layer — Cook's
    distances (reference pydeseq2/dds.py:986-1040), Cook's outlier p-value
    masking (dds.py:1066-1110) and BH adjustment with or without independent
    filtering (ds.py:486-542) — so the entire `DeseqDataSet.deseq2()` +
    `DeseqStats.summary()` workflow (with ``refit_cooks=False`` semantics;
    outlier *refitting* is inherently data-dependent and lives in the staged
    driver) runs without a single host roundtrip. All cross-gene reductions
    (quantile cutoffs, 50 batched BH passes, lowess pick) become XLA
    collectives when the gene axis is sharded over a mesh.

    Parameters beyond :func:`wald_pipeline`'s
    --------------------------------------------
    cooks_cutoff : scalar
        F(0.99, p, n-p) ppf, computed host-side (scipy) — a design-only
        constant (reference pydeseq2/dds.py:1080).
    cohort_ids : tuple of int, or None
        Per-sample cohort id over samples whose design-row combination has
        >= 3 replicates, restricted to those samples (see
        :func:`summary_host_inputs`). None means no cohort has >= 3
        replicates -> global trimmed variance (reference
        pydeseq2/utils.py:938-952). Static: cohort membership is part of the
        experiment design, not data.
    use_for_max : tuple of bool
        (N,) mask of samples in >= 3-replicate cohorts (reference
        pydeseq2/dds.py:1081). Static for the same reason.
    alpha, cooks_filter, independent_filter :
        `DeseqStats` knobs (reference pydeseq2/ds.py:131-146).

    Returns the :func:`wald_pipeline` dict plus ``cooks`` (G, N),
    ``cooks_outlier`` (G,), masked ``p_values`` and ``padj``.
    """
    import numpy as np

    from pydeseq2_tpu.ops import stats as stats_ops

    G, N = counts.shape
    P = design_matrix.shape[1]
    dtype = counts.dtype
    if gene_mask is None:
        gene_mask = jnp.ones((G,), dtype=bool)
    if use_for_max is None:
        use_for_max = tuple([True] * N)

    out = _wald_impl(
        counts,
        design_matrix,
        contrast,
        lfc_null,
        gene_mask,
        size_factors,
        min_mu=min_mu,
        min_disp=min_disp,
        max_disp=max_disp,
        beta_tol=beta_tol,
        trend_type=trend_type,
        trend_rounds=trend_rounds,
        alt_hypothesis=alt_hypothesis,
        mu_init=mu_init,
        sf_fit_type=sf_fit_type,
    )
    normed = out.pop("_normed")
    non_zero = out.pop("_non_zero")
    out.pop("_mom")
    out.pop("_mu_hat")
    mu = out["mu"]
    H = out["hat_diagonals"]
    base_mean = out["base_mean"]

    # --- Cook's distances (reference pydeseq2/dds.py:986-1040) -------------
    # Robust MoM dispersion: cohort-wise trimmed variance over samples in
    # >= 3-replicate cohorts, else global trimmed variance
    # (reference pydeseq2/utils.py:914-960).
    if cohort_ids is not None:
        idx = np.where(np.asarray(use_for_max))[0]
        v = stats_ops.trimmed_cell_variance(
            normed[:, idx].T, np.asarray(cohort_ids)
        )
    else:
        v = stats_ops.trimmed_variance(normed.T, axis=0)
    m = normed.mean(axis=1)
    disp_c = jnp.maximum((v - m) / m**2, 0.04)
    V = mu + disp_c[:, None] * mu**2
    squared_pearson = (counts - mu) ** 2 / (V * P)
    cooks = squared_pearson * H / (1.0 - H) ** 2  # (G, N)

    # --- Cook's outlier gene mask (reference pydeseq2/dds.py:1066-1110) ----
    ufm = jnp.asarray(np.asarray(use_for_max), dtype=bool)
    flagged = ((jnp.where(ufm[None, :], cooks, -jnp.inf)) > cooks_cutoff).any(axis=1)
    # Un-flag genes where >= 3 samples exceed the max-cooks sample's count
    # (reference pydeseq2/dds.py:1097-1101).
    pos = jnp.argmax(cooks, axis=1)
    max_count = jnp.take_along_axis(counts, pos[:, None], axis=1)
    flagged = flagged & ((counts > max_count).sum(axis=1) < 3)
    outlier = flagged & non_zero

    p = out["p_values"]
    if cooks_filter:
        p = jnp.where(outlier, jnp.nan, p)
        out["p_values"] = p

    padj = device_padj(p, base_mean, gene_mask, alpha, independent_filter)

    out["cooks"] = jnp.where(non_zero[:, None], cooks, jnp.nan)
    out["cooks_outlier"] = outlier
    out["padj"] = jnp.where(gene_mask, padj, jnp.nan)
    return out


def device_padj(
    p: jnp.ndarray,
    base_mean: jnp.ndarray,
    gene_mask: jnp.ndarray,
    alpha: float,
    independent_filter: bool,
) -> jnp.ndarray:
    """Adjusted p-values as a device program (BH or independent filtering).

    The independent-filtering variant evaluates all 50 base-mean cutoffs as
    one batched masked-BH program plus a device lowess pick (reference
    pydeseq2/ds.py:486-542 loops 50 scipy BH calls on the host).
    """
    dtype = base_mean.dtype
    G = p.shape[0]
    valid = ~jnp.isnan(p) & gene_mask
    p_filled = jnp.nan_to_num(p, nan=1.0)
    if not independent_filter:
        return stats_ops.bh_adjust_masked(p_filled, valid)

    base_m = jnp.where(gene_mask, base_mean, jnp.nan)
    lower_q = ((base_m == 0) & gene_mask).sum() / jnp.maximum(gene_mask.sum(), 1)
    lower_q = lower_q.astype(dtype)
    upper_q = jnp.where(
        lower_q < 0.95, jnp.asarray(0.95, dtype), jnp.asarray(1.0, dtype)
    )
    theta = lower_q + (upper_q - lower_q) * jnp.linspace(0.0, 1.0, 50, dtype=dtype)
    cutoffs = jnp.nanquantile(base_m, theta)
    masks = (base_mean[None, :] >= cutoffs[:, None]) & valid[None, :]
    # 1-D p + (50, G) masks -> the shared-argsort BH path (one sort total).
    adj = stats_ops.bh_adjust_masked(p_filled, masks)  # (50, G), NaN outside
    num_rej = (adj < alpha).sum(axis=1)
    lo = stats_ops.lowess_device(theta, num_rej.astype(dtype), frac=1.0 / 5.0)
    resid = jnp.where(num_rej > 0, num_rej.astype(dtype) - lo, jnp.nan)
    thresh = lo.max() - jnp.sqrt(jnp.nanmean(resid**2))
    above = num_rej > thresh
    j = jnp.where(above.any(), jnp.argmax(above), 0)
    j = jnp.where(num_rej.max() <= 10, 0, j)
    return jnp.take(adj, j, axis=0)


def summary_host_inputs(design_matrix, min_replicates: int = 7) -> dict:
    """Host-side static inputs for :func:`summary_pipeline`.

    Computes, from the design matrix (pandas DataFrame or ndarray), the
    design-only constants the fused summary program needs: the F(0.99, p,
    n-p) Cook's cutoff (reference pydeseq2/dds.py:1080), the >= 3-replicate
    sample mask (reference pydeseq2/utils.py:888-911), the cohort ids of
    those samples in first-seen order (reference pydeseq2/utils.py:925-936),
    the >= ``min_replicates``-replicate ``replaceable`` mask that gates
    Cook's outlier replacement (reference pydeseq2/dds.py:1310-1320),
    and the dispersion-stage ``mu_init`` mode: "linear" when design rows
    group 1:1 onto columns (pure categorical designs), "irls" otherwise —
    e.g. continuous covariates (reference pydeseq2/dds.py:743-765; using
    "linear" there skews the genewise dispersions and everything downstream).
    """
    import numpy as np
    import pandas as pd
    from scipy.stats import f  # host scalar ppf only

    from pydeseq2_tpu.utils import n_or_more_replicates

    df = (
        design_matrix
        if isinstance(design_matrix, pd.DataFrame)
        else pd.DataFrame(np.asarray(design_matrix))
    )
    n, p = df.shape
    three_or_more = n_or_more_replicates(df, 3).to_numpy()
    if three_or_more.any():
        filtered = df.loc[three_or_more, :]
        cohort_ids = tuple(
            int(x) for x in filtered.groupby(filtered.columns.tolist()).ngroup()
        )
    else:
        cohort_ids = None
    return {
        "cooks_cutoff": float(f.ppf(0.99, p, n - p)),
        "use_for_max": tuple(bool(b) for b in three_or_more),
        "cohort_ids": cohort_ids,
        "replaceable": tuple(
            bool(b) for b in n_or_more_replicates(df, min_replicates).to_numpy()
        ),
        "mu_init": "linear" if len(df.value_counts()) == p else "irls",
    }


@partial(
    jax.jit,
    static_argnames=(
        "min_mu",
        "min_disp",
        "max_disp",
        "trend_type",
        "trend_rounds",
    ),
)
def vst_pipeline(
    counts: jnp.ndarray,
    gene_mask: jnp.ndarray | None = None,
    min_mu: float = 0.5,
    min_disp: float = 1e-8,
    max_disp: float = 10.0,
    trend_type: str = "parametric",
    trend_rounds: int = 8,
):
    """One-program blind variance-stabilizing transform on a (G, N) tile.

    The fused analog of ``DeseqDataSet.vst()`` with ``use_design=False``
    (reference pydeseq2/dds.py:349-514): size factors, intercept-design
    genewise dispersion MLE, parametric (or mean) trend, closed-form
    transform — all inside one jit program, suitable for feeding VST features
    straight into a downstream JAX model without leaving the device.

    Returns a dict with ``vst_counts`` (G, N), ``size_factors`` (N,),
    ``genewise_dispersions`` (G,), and trend parameters (``trend_coeffs``
    for parametric, ``mean_disp`` for mean).
    """
    G, N = counts.shape
    dtype = counts.dtype
    if gene_mask is None:
        gene_mask = jnp.ones((G,), dtype=bool)

    X = jnp.ones((N, 1), dtype=dtype)  # blind: intercept-only design

    sf, _ = _size_factors(counts, gene_mask)
    normed = counts / sf[None, :]
    base_mean = normed.mean(axis=1)
    non_zero = ~(counts == 0).all(axis=1) & gene_mask

    rde = fit_rough_dispersions_batch(normed, X)
    mde = fit_moments_dispersions_batch(normed, sf)
    mom = jnp.clip(jnp.minimum(rde, mde), min_disp, max_disp)

    mu_hat = fit_lin_mu_batch(counts, sf, X, min_mu)
    genewise, _ = alpha_mle_batch(
        counts, X, mu_hat, mom, min_disp, max_disp, cr_reg=True, prior_reg=False,
    )
    genewise = jnp.clip(genewise, min_disp, max_disp)
    genewise_m = jnp.where(non_zero, genewise, jnp.nan)

    out = {
        "size_factors": sf,
        "base_mean": base_mean,
        "genewise_dispersions": genewise_m,
    }

    fitted, coeffs, used_mean, mean_disp = fit_fused_trend(
        base_mean, genewise_m, non_zero, min_disp, trend_type,
        max_rounds=max(trend_rounds, 20),
    )
    if trend_type == "parametric":
        a0, a1 = coeffs[0], coeffs[1]
        # Closed form, reference pydeseq2/dds.py:493-501; arcsinh form
        # (dds.py:502-510) when the trend fell back to mean in-program.
        parametric_vst = jnp.log2(
            (
                1.0
                + a1
                + 2.0 * a0 * normed
                + 2.0 * jnp.sqrt(a0 * normed * (1.0 + a1 + a0 * normed))
            )
            / (4.0 * a0)
        )
        mean_vst = (
            2.0 * jnp.arcsinh(jnp.sqrt(mean_disp * normed))
            - jnp.log(mean_disp)
            - jnp.log(4.0)
        ) / jnp.log(2.0)
        vst = jnp.where(used_mean, mean_vst, parametric_vst)
        out["trend_coeffs"] = coeffs
        out["trend_used_mean"] = used_mean
    else:
        # arcsinh form, reference pydeseq2/dds.py:502-510.
        vst = (
            2.0 * jnp.arcsinh(jnp.sqrt(mean_disp * normed))
            - jnp.log(mean_disp)
            - jnp.log(4.0)
        ) / jnp.log(2.0)
        out["mean_disp"] = mean_disp

    out["vst_counts"] = jnp.where(gene_mask[:, None], vst, jnp.nan)
    return out
