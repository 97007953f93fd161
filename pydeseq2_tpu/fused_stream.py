"""Gene-streamed fused pipeline: north-star scale on a single chip.

The monolithic :mod:`pydeseq2_tpu.fused` program materialises ~10 (G, N)
temporaries (normed counts, mu, hat diagonals, Cook's distances, IRLS
internals, ...), so at the BASELINE north-star configs (1k and 10k samples x
60k genes, 0.24-2.4 GB *per* (G, N) f32 array) it exceeds a single chip's
HBM. This module runs the same analysis with bounded memory:

- The raw counts tile stays device-resident once (the largest config,
  10k x 60k f32, is 2.4 GB — it fits; nothing else full-size is ever live).
- The two heavy per-gene stages (genewise dispersion MLE; MAP dispersions +
  IRLS + Wald + Cook's flags) stream (gene_block, N) tiles through
  ``lax.scan`` inside ONE jit program, so peak temporary memory is
  O(gene_block x N) regardless of G.
- The cross-gene reductions run between the streamed passes on O(G) or one
  full-matrix fused reduction: the size-factor medians (sort-free radix
  selection, ops/select.py), the
  gamma-GLM trend with its exclusion loop (:func:`fused.fit_fused_trend`,
  including the in-program mean fallback), the prior-variance MAD, and the
  batched BH / independent-filtering sweep (:func:`fused.device_padj`).
- Per-gene outputs only — no (G, N) result is returned (the staged
  :class:`DeseqDataSet` keeps full Cook's layers when you need them).

Numerically this is the same program as :func:`fused.summary_pipeline` —
each gene block sees identical inputs (size factors, trend, prior are exact
global reductions, not block approximations), so results match the
monolithic pipeline to roundoff; ``tests/test_fused_stream.py`` pins this.

Reference semantics covered: pydeseq2/dds.py:516-562 (deseq2 driver with
refit_cooks=False) + pydeseq2/ds.py:223-301 (summary), like
:func:`fused.summary_pipeline`.
"""

from __future__ import annotations

import math
import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pydeseq2_tpu.fused import (
    _irls_with_rescue,
    device_padj,
    fit_fused_trend,
    summary_host_inputs,
)
from pydeseq2_tpu.ops import stats as stats_ops
from pydeseq2_tpu.ops.dispersion import alpha_mle_batch
from pydeseq2_tpu.ops.irls import hat_diagonals, irls_beta_init
from pydeseq2_tpu.ops.select import masked_median_select
from pydeseq2_tpu.ops.linreg import (
    fit_moments_dispersions_batch,
    fit_rough_dispersions_batch,
    ols_pinv,
)
from pydeseq2_tpu.ops.wald import wald_test_batch

_MAD_SCALE = 0.6744897501960817  # Phi^{-1}(0.75)


def _streamed_size_factors(
    counts: jnp.ndarray,
    gene_mask: jnp.ndarray,
    logmeans: jnp.ndarray,
    sample_block: int | None = None,
) -> jnp.ndarray:
    """Median-of-ratios size factors, sample-blocked, sort-free.

    The per-sample median runs over the *same* filtered gene set for every
    sample, so the two middle order statistics sit at fixed ranks: push
    excluded genes to +inf and resolve ranks (m-1)//2 and m//2 with the
    exact radix-bisection selector (ops/select.py) instead of a per-column
    sort. With ``sample_block=None`` the whole (G, N) ratio
    matrix is formed and sorted at once — fine up to ~1k samples x 60k genes
    — but at the 10k-sample atlas scale the ratio matrix + sort scratch is
    several extra full-size (G, N) buffers (~10 GB) and crashes a 16 GB
    chip; ``sample_block`` streams column blocks through one lax.map'd sort
    so peak extra memory is O(G x sample_block). ``sample_block`` need not
    divide N: the final block's slice start is clamped to N - sample_block,
    so it overlaps the previous block and recomputes a few columns (the
    overlapping writes carry identical values — each column's median only
    depends on that column).
    """
    filtered = ~jnp.isinf(logmeans) & gene_mask
    m = filtered.sum()

    def med_of_cols(cols):
        ratios = jnp.where(
            filtered[:, None], jnp.log(cols) - logmeans[:, None], jnp.inf
        )
        # Exact sort-free median: the radix bisection returns the same two
        # middle order statistics a per-column sort would (ops/select.py) at
        # ~1/8 the cost when columns are many (the 55 ms -> ~6 ms stage at
        # 1000 x 30k).
        return masked_median_select(ratios, m, axis=0)

    G, N = counts.shape
    if sample_block is None or sample_block >= N:
        return jnp.exp(med_of_cols(counts))
    nb = -(-N // sample_block)
    starts = jnp.minimum(jnp.arange(nb) * sample_block, N - sample_block)

    def block_med(carry, s):
        # Slice column blocks in-loop (a moveaxis/reshape would materialize
        # a transposed full-size copy of counts — the buffer this path
        # avoids).
        cols = jax.lax.dynamic_slice(counts, (0, s), (G, sample_block))
        return jax.lax.dynamic_update_slice(carry, med_of_cols(cols), (s,)), None

    med, _ = jax.lax.scan(block_med, jnp.zeros((N,), counts.dtype), starts)
    return jnp.exp(med)


def _streamed_poscounts_size_factors(
    counts: jnp.ndarray,
    usable: jnp.ndarray,
    logmeans: jnp.ndarray,
    sample_block: int | None = None,
) -> jnp.ndarray:
    """Poscounts size factors, sample-blocked (zero-rich normalization).

    Unlike the ratio estimator, the per-sample median here is RAGGED: each
    sample's median runs over the genes that are usable AND positive in
    that sample (reference pydeseq2/dds.py:668-676). Excluded entries are
    pushed to +inf and the two middle order statistics at the per-sample
    valid-count midpoints are resolved by the exact sort-free selector
    (ops/select.py). Size
    factors are rescaled to geometric mean 1. Same blocking scheme as
    :func:`_streamed_size_factors` (clamped final block).
    """
    G, N = counts.shape

    def med_of_cols(cols):
        in_med = usable[:, None] & (cols > 0)
        ratios = jnp.where(
            in_med,
            jnp.log(jnp.where(cols > 0, cols, 1.0)) - logmeans[:, None],
            jnp.inf,
        )
        # Ragged per-column ranks resolve in the same sort-free bisection
        # (ops/select.py): exact order statistics, no (G, block) sort.
        return masked_median_select(ratios, in_med.sum(axis=0), axis=0)

    if sample_block is None or sample_block >= N:
        med = med_of_cols(counts)
    else:
        nb = -(-N // sample_block)
        starts = jnp.minimum(jnp.arange(nb) * sample_block, N - sample_block)

        def block_med(carry, s):
            cols = jax.lax.dynamic_slice(counts, (0, s), (G, sample_block))
            return (
                jax.lax.dynamic_update_slice(carry, med_of_cols(cols), (s,)),
                None,
            )

        med, _ = jax.lax.scan(block_med, jnp.zeros((N,), counts.dtype), starts)
    sf = jnp.exp(med)
    return sf / jnp.exp(jnp.mean(jnp.log(sf)))


@partial(
    jax.jit,
    static_argnames=(
        "gene_block",
        "sample_block",
        "cohort_ids",
        "use_for_max",
        "replaceable",
        "alpha",
        "cooks_filter",
        "independent_filter",
        "min_mu",
        "min_disp",
        "max_disp",
        "beta_tol",
        "trend_type",
        "alt_hypothesis",
        "mu_init",
        "stats_layer",
        "refit_mode",
        "sf_fit_type",
    ),
)
def summary_pipeline_streamed(
    counts: jnp.ndarray,
    design_matrix: jnp.ndarray,
    contrast: jnp.ndarray,
    lfc_null: jnp.ndarray,
    cooks_cutoff: jnp.ndarray,
    gene_mask: jnp.ndarray | None = None,
    size_factors: jnp.ndarray | None = None,
    *,
    gene_block: int = 8192,
    sample_block: int | None = None,
    cohort_ids: tuple[int, ...] | None = None,
    use_for_max: tuple[bool, ...] | None = None,
    replaceable: tuple[bool, ...] | None = None,
    alpha: float = 0.05,
    cooks_filter: bool = True,
    independent_filter: bool = True,
    min_mu: float = 0.5,
    min_disp: float = 1e-8,
    max_disp: float = 10.0,
    beta_tol: float = 1e-8,
    trend_type: str = "parametric",
    alt_hypothesis: str | None = None,
    mu_init: str = "linear",
    stats_layer: bool = True,
    refit_mode: bool = False,
    sf_fit_type: str = "ratio",
):
    """Counts -> padj with O(gene_block x N) peak temporaries.

    Same arguments and semantics as :func:`fused.summary_pipeline`, plus
    ``gene_block`` — G must be a multiple of it (pad with
    ``gene_mask=False`` lanes; :func:`run_summary_streamed` does this).
    ``stats_layer=False`` skips Cook's flagging and padj (the
    :func:`fused.wald_pipeline` surface). ``size_factors`` (N,) overrides
    the in-program median-of-ratios computation — inject poscounts or
    iterative size factors from the staged layer to run zero-rich data
    through the streamed path (reference normalization modes:
    pydeseq2/dds.py:584-711).

    ``refit_mode=True`` (requires ``replaceable``, the static (N,) mask of
    samples whose design-row cohort has >= min_replicates members —
    reference pydeseq2/dds.py:1310-1320) prepares the Cook's-replacement
    pass instead of finishing the analysis: per-gene ``replaced`` flags
    (any sample's Cook's distance above the cutoff, reference
    dds.py:1323-1326), the packed per-cell exceed bits the refit program
    unpacks to impute counts, and ``cooks_outlier_refit`` (the outlier flag
    a gene keeps AFTER refitting, i.e. computed on ``replace_cooks`` whose
    replaceable-sample entries are zeroed — reference dds.py:1455-1458 +
    1066-1110). p-value masking and padj are deferred to the host wrapper,
    which merges the refit results first (:func:`run_summary_streamed`).
    """
    G, N = counts.shape
    P = design_matrix.shape[1]
    dtype = counts.dtype
    X = design_matrix
    if gene_mask is None:
        gene_mask = jnp.ones((G,), dtype=bool)
    if use_for_max is None:
        use_for_max = tuple([True] * N)
    assert G % gene_block == 0, "pad G to a multiple of gene_block"
    n_blocks = G // gene_block

    cblocks = counts.reshape(n_blocks, gene_block, N)
    mblocks = gene_mask.reshape(n_blocks, gene_block)

    # --- cheap full sweep: per-gene log-means + non-zero masks --------------
    def log_stats_block(args):
        c, m = args
        if sf_fit_type == "poscounts":
            # log-geometric mean over POSITIVE counts, full-N divisor
            # (reference pydeseq2/dds.py:659-665).
            logmean = jnp.where(c > 0, jnp.log(jnp.where(c > 0, c, 1.0)), 0.0).mean(
                axis=1
            )
        else:
            logmean = jnp.log(c).mean(axis=1)  # -inf when the gene has a zero
        non_zero = (c > 0).any(axis=1) & m
        return logmean, non_zero

    logmeans, non_zero = jax.lax.map(log_stats_block, (cblocks, mblocks))
    logmeans = logmeans.reshape(G)
    non_zero = non_zero.reshape(G)

    if size_factors is not None:
        sf = jnp.asarray(size_factors, dtype)
    elif sf_fit_type == "poscounts":
        usable = jnp.isfinite(logmeans) & (logmeans > 0) & gene_mask
        sf = _streamed_poscounts_size_factors(counts, usable, logmeans, sample_block)
    else:
        sf = _streamed_size_factors(counts, gene_mask, logmeans, sample_block)

    # The dispersion-stage mu init is fully described by a per-gene (P,)
    # coefficient vector in both modes, so pass 1 emits the coefficients
    # (G x P floats - tiny) and pass 2 rebuilds mu from them instead of
    # re-running the init solve (an OLS for "linear", a full IRLS fit with
    # rescue for "irls" - at atlas scale the latter doubles the IRLS work).
    X_pinv_T = ols_pinv(X).T  # (P, N) -> transposed once, hoisted

    def mu_init_block(c):
        """-> (mu_hat, mom, beta_coef, overflow) for one (block, N) tile."""
        normed = c / sf[None, :]
        mom = jnp.clip(
            jnp.minimum(
                fit_rough_dispersions_batch(normed, X),
                fit_moments_dispersions_batch(normed, sf),
            ),
            min_disp,
            max_disp,
        )
        if mu_init == "irls":
            beta_coef, _, overflow = _irls_with_rescue(
                c, sf, X, mom, irls_beta_init(c, sf, X),
                min_mu=min_mu, beta_tol=beta_tol,
            )
        else:
            overflow = jnp.asarray(0, jnp.int32)
            beta_coef = normed @ X_pinv_T
        return mu_from_coef(beta_coef), mom, beta_coef, overflow

    def mu_from_coef(beta_coef):
        xb = beta_coef @ X.T
        if mu_init == "irls":
            # UNthresholded mu, matching irls_solver's return
            # (reference pydeseq2/utils.py:427-437).
            return sf[None, :] * jnp.exp(xb)
        return jnp.maximum(sf[None, :] * xb, min_mu)

    # --- streamed pass 1: genewise dispersion MLE ---------------------------
    # Emits per-gene scalars plus the coarse-grid objective cache (K per
    # gene) that lets the MAP fit in pass 2 skip its coarse scan.
    def genewise_block(c):
        base_mean = (c / sf[None, :]).mean(axis=1)
        mu_hat, mom, beta_coef, overflow = mu_init_block(c)
        gw, _, coarse = alpha_mle_batch(
            c, X, mu_hat, mom, min_disp, max_disp,
            cr_reg=True, prior_reg=False, return_coarse=True,
        )
        return base_mean, jnp.clip(gw, min_disp, max_disp), coarse, beta_coef, overflow

    base_mean, genewise, coarse, mu_coef, mu_overflow = jax.lax.map(
        genewise_block, cblocks
    )
    base_mean = base_mean.reshape(G)
    genewise_m = jnp.where(non_zero, genewise.reshape(G), jnp.nan)

    # --- global reductions: trend + prior (O(G) work) -----------------------
    fitted, trend_coeffs, trend_used_mean, mean_disp = fit_fused_trend(
        base_mean, genewise_m, non_zero, min_disp, trend_type
    )
    fitted_m = jnp.where(non_zero, fitted, jnp.nan)

    disp_resid = jnp.log(genewise_m) - jnp.log(fitted_m)
    resid_sel = jnp.where(
        (genewise_m >= 100.0 * min_disp) & non_zero, disp_resid, jnp.nan
    )
    center = jnp.nanmedian(resid_sel)
    squared_logres = (jnp.nanmedian(jnp.abs(resid_sel - center)) / _MAD_SCALE) ** 2
    from jax.scipy.special import polygamma

    prior_disp_var = jnp.maximum(
        squared_logres - polygamma(1, jnp.asarray((N - P) / 2.0, dtype)), 0.25
    )

    # --- streamed pass 2: MAP dispersions -> IRLS -> Wald -> Cook's flags ---
    if cohort_ids is not None:
        cohort_sample_idx = np.where(np.asarray(use_for_max))[0]
        cohort_arr = np.asarray(cohort_ids)
    ufm = jnp.asarray(np.asarray(use_for_max), dtype=bool)
    if refit_mode:
        assert replaceable is not None, "refit_mode needs the replaceable mask"
        repl = jnp.asarray(np.asarray(replaceable), dtype=bool)
        n_words = -(-N // 32)
        bit_weights = jnp.asarray([1 << k for k in range(32)], jnp.uint32)

    def analyse_block(args):
        c, m, gw_m, fit_m, cache, beta_coef = args
        nz = (c > 0).any(axis=1) & m
        mu_hat = mu_from_coef(beta_coef)
        map_disp, _ = alpha_mle_batch(
            c, X, mu_hat, jnp.nan_to_num(fit_m, nan=0.5), min_disp, max_disp,
            prior_disp_var=prior_disp_var, cr_reg=True, prior_reg=True,
            coarse_cache=cache,
        )
        map_disp = jnp.clip(map_disp, min_disp, max_disp)
        shrink_outlier = jnp.log(gw_m) > jnp.log(fit_m) + 2.0 * jnp.sqrt(
            squared_logres
        )
        dispersions = jnp.where(shrink_outlier, gw_m, map_disp)
        dispersions = jnp.where(nz, dispersions, jnp.nan)
        disp_safe = jnp.nan_to_num(dispersions, nan=0.5)

        beta, converged, lfc_overflow = _irls_with_rescue(
            c, sf, X, disp_safe, irls_beta_init(c, sf, X),
            min_mu=min_mu, beta_tol=beta_tol,
        )
        H, mu = hat_diagonals(c, sf, X, disp_safe, beta, min_mu=min_mu)
        ridge = 1e-6 * jnp.eye(P, dtype=dtype)
        pv, st, se = wald_test_batch(
            X, disp_safe, beta, mu, ridge, contrast, lfc_null, alt_hypothesis
        )

        res = {
            "dispersions": dispersions,
            "MAP_dispersions": jnp.where(nz, map_disp, jnp.nan),
            "lfc": jnp.where(nz[:, None], beta, jnp.nan),
            "p_values": jnp.where(nz, pv, jnp.nan),
            "statistics": jnp.where(nz, st, jnp.nan),
            "se": jnp.where(nz, se, jnp.nan),
            "irls_converged": converged,
            "_lfc_overflow": lfc_overflow,
        }
        if stats_layer:
            # Cook's distances live only inside the block: the flags and the
            # max-count veto (reference pydeseq2/dds.py:1066-1110) are
            # per-gene reductions.
            normed = c / sf[None, :]
            if cohort_ids is not None:
                v = stats_ops.trimmed_cell_variance(
                    normed[:, cohort_sample_idx].T, cohort_arr
                )
            else:
                v = stats_ops.trimmed_variance(normed.T, axis=0)
            mrow = normed.mean(axis=1)
            disp_c = jnp.maximum((v - mrow) / mrow**2, 0.04)
            V = mu + disp_c[:, None] * mu**2
            cooks = (c - mu) ** 2 / (V * P) * H / (1.0 - H) ** 2
            flagged = (
                jnp.where(ufm[None, :], cooks, -jnp.inf) > cooks_cutoff
            ).any(axis=1)
            pos = jnp.argmax(cooks, axis=1)
            max_count = jnp.take_along_axis(c, pos[:, None], axis=1)
            veto = (c > max_count).sum(axis=1) < 3
            res["cooks_outlier"] = flagged & veto & nz
            if refit_mode:
                # Per-cell exceed bits, packed 32/word: the refit program
                # unpacks them to impute counts (reference
                # pydeseq2/dds.py:1323-1357) — storing the raw bool (G, N)
                # layer would be the full-size buffer streaming avoids.
                exceeds = cooks > cooks_cutoff
                bits = jnp.pad(exceeds, ((0, 0), (0, n_words * 32 - N)))
                res["exceeds_packed"] = jnp.sum(
                    bits.reshape(-1, n_words, 32) * bit_weights[None, None, :],
                    axis=-1,
                    dtype=jnp.uint32,
                )
                res["replaced"] = exceeds.any(axis=1) & nz
                # The flag a refitted gene keeps: its replaceable-sample
                # Cook's entries are zeroed (replace_cooks), so only
                # non-replaceable well-replicated samples can still exceed
                # the cutoff (reference dds.py:1455-1458 + 1066-1110). The
                # count veto stays computed on the pre-replacement
                # distances and original counts (reference dds.py:1097).
                flagged_nonrepl = (
                    jnp.where((ufm & ~repl)[None, :], cooks, -jnp.inf)
                    > cooks_cutoff
                ).any(axis=1)
                res["cooks_outlier_refit"] = flagged_nonrepl & veto & nz
        return res

    blocks = jax.lax.map(
        analyse_block,
        (
            cblocks,
            mblocks,
            genewise_m.reshape(n_blocks, gene_block),
            fitted_m.reshape(n_blocks, gene_block),
            coarse,
            mu_coef,
        ),
    )
    lfc_overflow_total = blocks.pop("_lfc_overflow").sum()
    flat = {k: v.reshape((G,) + v.shape[2:]) for k, v in blocks.items()}

    out = {
        "rescue_overflow": mu_overflow.sum() + lfc_overflow_total,
        "size_factors": sf,
        "base_mean": base_mean,
        "genewise_dispersions": genewise_m,
        "fitted_dispersions": fitted_m,
        "trend_coeffs": trend_coeffs,
        "trend_used_mean": trend_used_mean,
        "mean_disp": mean_disp,
        "squared_logres": squared_logres,
        "prior_disp_var": prior_disp_var,
        **flat,
    }

    if stats_layer and not refit_mode:
        # With refit_mode the host wrapper merges the refit results first,
        # then applies outlier masking + padj on the merged arrays.
        p = out["p_values"]
        if cooks_filter:
            p = jnp.where(out["cooks_outlier"], jnp.nan, p)
            out["p_values"] = p
        out["padj"] = jnp.where(
            gene_mask,
            device_padj(p, base_mean, gene_mask, alpha, independent_filter),
            jnp.nan,
        )
    return out


@partial(
    jax.jit,
    static_argnames=(
        "refit_block",
        "replaceable",
        "alt_hypothesis",
        "min_mu",
        "min_disp",
        "max_disp",
        "beta_tol",
        "mu_init",
    ),
)
def refit_pipeline_streamed(
    counts_tile: jnp.ndarray,
    exceeds_packed: jnp.ndarray,
    tile_mask: jnp.ndarray,
    size_factors: jnp.ndarray,
    design_matrix: jnp.ndarray,
    contrast: jnp.ndarray,
    lfc_null: jnp.ndarray,
    trend_coeffs: jnp.ndarray,
    trend_used_mean: jnp.ndarray,
    mean_disp: jnp.ndarray,
    prior_disp_var: jnp.ndarray,
    squared_logres: jnp.ndarray,
    *,
    refit_block: int = 4096,
    replaceable: tuple[bool, ...],
    alt_hypothesis: str | None = None,
    min_mu: float = 0.5,
    min_disp: float = 1e-8,
    max_disp: float = 10.0,
    beta_tol: float = 1e-8,
    mu_init: str = "linear",
):
    """Impute Cook's outlier counts and refit the flagged genes, streamed.

    The compacted (K, N) tile holds exactly the genes whose ``replaced``
    flag fired in the main pass (host-gathered, padded to a multiple of
    ``refit_block`` with ``tile_mask=False`` lanes). Per tile block:

    1. unpack the per-cell exceed bits and impute flagged cells in
       replaceable samples with trimmed-mean(0.2) baselines rescaled per
       sample, truncated to integers (reference pydeseq2/dds.py:1331-1357);
    2. genes that became all-zero are reported, not refitted (reference
       dds.py:1373-1390);
    3. re-run genewise dispersion MLE (MoM init + mu init), evaluate the
       PARENT trend curve at the new normed means, MAP-shrink with the
       parent prior, IRLS the LFCs, and Wald-test them — the
       sub-DeseqDataSet pipeline of reference dds.py:1392-1441 with the
       inherited trend/prior, fused into one jit program.

    Global reductions are all *inputs* here (trend, prior, size factors),
    so the refit is embarrassingly gene-parallel and shards/streams like
    the main passes.
    """
    K, N = counts_tile.shape
    P = design_matrix.shape[1]
    dtype = counts_tile.dtype
    X = design_matrix
    sf = size_factors
    repl = jnp.asarray(np.asarray(replaceable), dtype=bool)
    assert K % refit_block == 0, "pad the refit tile to a refit_block multiple"
    n_blocks = K // refit_block
    n_words = exceeds_packed.shape[1]
    bit_shifts = jnp.arange(32, dtype=jnp.uint32)

    X_pinv_T = ols_pinv(X).T

    def refit_block_fn(args):
        c, packed, m = args
        bits = (packed[:, :, None] >> bit_shifts[None, None, :]) & 1
        exceeds = bits.reshape(-1, n_words * 32)[:, :N].astype(bool)
        swap = repl[None, :] & exceeds

        normed = c / sf[None, :]
        trim02 = stats_ops.trimmed_mean(normed, trim=0.2, axis=1)
        # .astype(int) truncation of the reference; counts are >= 0 so
        # floor == trunc (reference pydeseq2/dds.py:1344-1350).
        imputed = jnp.where(swap, jnp.floor(trim02[:, None] * sf[None, :]), c)

        new_all_zero = (imputed == 0).all(axis=1) & m
        live = m & ~new_all_zero

        normed2 = imputed / sf[None, :]
        base_mean2 = normed2.mean(axis=1)
        mom = jnp.clip(
            jnp.minimum(
                fit_rough_dispersions_batch(normed2, X),
                fit_moments_dispersions_batch(normed2, sf),
            ),
            min_disp,
            max_disp,
        )
        if mu_init == "irls":
            beta_mom, _, of0 = _irls_with_rescue(
                imputed, sf, X, mom, irls_beta_init(imputed, sf, X),
                min_mu=min_mu, beta_tol=beta_tol,
            )
            mu_hat = sf[None, :] * jnp.exp(beta_mom @ X.T)
        else:
            of0 = jnp.asarray(0, jnp.int32)
            mu_hat = jnp.maximum(sf[None, :] * (normed2 @ X_pinv_T @ X.T), min_mu)

        genewise2, _, coarse = alpha_mle_batch(
            imputed, X, mu_hat, mom, min_disp, max_disp,
            cr_reg=True, prior_reg=False, return_coarse=True,
        )
        genewise2 = jnp.clip(genewise2, min_disp, max_disp)

        # Parent trend curve evaluated at the NEW normed means (reference
        # dds.py:1421-1433: the curve is inherited, not refitted).
        parametric = trend_coeffs[0] + trend_coeffs[1] / base_mean2
        fitted2 = jnp.where(trend_used_mean, mean_disp, parametric)

        map2, _ = alpha_mle_batch(
            imputed, X, mu_hat, jnp.nan_to_num(fitted2, nan=0.5),
            min_disp, max_disp,
            prior_disp_var=prior_disp_var, cr_reg=True, prior_reg=True,
            coarse_cache=coarse,
        )
        map2 = jnp.clip(map2, min_disp, max_disp)
        shrink_outlier = jnp.log(genewise2) > jnp.log(fitted2) + 2.0 * jnp.sqrt(
            squared_logres
        )
        dispersions2 = jnp.where(shrink_outlier, genewise2, map2)
        disp_safe = jnp.nan_to_num(dispersions2, nan=0.5)

        beta2, converged2, of1 = _irls_with_rescue(
            imputed, sf, X, disp_safe, irls_beta_init(imputed, sf, X),
            min_mu=min_mu, beta_tol=beta_tol,
        )
        _, mu2 = hat_diagonals(imputed, sf, X, disp_safe, beta2, min_mu=min_mu)
        ridge = 1e-6 * jnp.eye(P, dtype=dtype)
        pv2, st2, se2 = wald_test_batch(
            X, disp_safe, beta2, mu2, ridge, contrast, lfc_null, alt_hypothesis
        )

        nanl = lambda a: jnp.where(live, a, jnp.nan)
        return {
            "new_all_zero": new_all_zero,
            "base_mean": jnp.where(m, base_mean2, jnp.nan),
            "genewise_dispersions": nanl(genewise2),
            "fitted_dispersions": nanl(fitted2),
            "MAP_dispersions": nanl(map2),
            "dispersions": nanl(dispersions2),
            "lfc": jnp.where(live[:, None], beta2, jnp.nan),
            "p_values": nanl(pv2),
            "statistics": nanl(st2),
            "se": nanl(se2),
            "irls_converged": converged2,
            "_overflow": of0 + of1,
        }

    blocks = jax.lax.map(
        refit_block_fn,
        (
            counts_tile.reshape(n_blocks, refit_block, N),
            exceeds_packed.reshape(n_blocks, refit_block, n_words),
            tile_mask.reshape(n_blocks, refit_block),
        ),
    )
    overflow = blocks.pop("_overflow").sum()
    out = {k: v.reshape((K,) + v.shape[2:]) for k, v in blocks.items()}
    out["rescue_overflow"] = overflow
    return out


@partial(jax.jit, static_argnames=("alpha", "independent_filter"))
def _padj_program(p, base_mean, gene_mask, alpha, independent_filter):
    """padj on merged post-refit arrays (same math as the in-program tail)."""
    return jnp.where(
        gene_mask,
        device_padj(p, base_mean, gene_mask, alpha, independent_filter),
        jnp.nan,
    )


def _apply_streamed_refit(
    res, out, counts_dev, design, contrast, lfc_null, host, knobs,
    gene_mask, dtype, G,
):
    """Gather flagged genes, run the refit program, merge, mask, adjust.

    Mirrors the staged refit()/_refit_without_outliers() + DeseqStats
    ordering (reference pydeseq2/dds.py:1042-1064 then ds.py:223-301):
    refit results overwrite the flagged genes, new-all-zero genes get
    neutral statistics (lfc/se/stat 0, p 1 — reference ds.py:356-360),
    Cook's masking uses the replace_cooks-based flag for refitted genes,
    and padj runs on the merged arrays.
    """
    replaced = np.array(res["replaced"])
    n_rep = int(replaced.sum())
    refitted = np.zeros(G, dtype=bool)
    new_all_zero_full = np.zeros(G, dtype=bool)

    if n_rep > 0:
        # Mutated columns become writable copies.
        for col in (
            "base_mean", "genewise_dispersions", "fitted_dispersions",
            "MAP_dispersions", "dispersions", "lfc", "p_values",
            "statistics", "se", "irls_converged",
        ):
            res[col] = np.array(res[col])

        idx = np.where(replaced)[0]
        # Same ~4 GB temporary budget per block as the main pass; padding
        # K to a block multiple bounds recompiles to one per K bucket.
        N = design.shape[0]
        refit_block = int(min(4096, max(256, 4_000_000_000 // (80 * N))))
        refit_block = ((refit_block + 7) // 8) * 8
        K = math.ceil(n_rep / refit_block) * refit_block
        idx_pad = np.pad(idx, (0, K - n_rep))
        tile_mask = np.arange(K) < n_rep
        gather = jnp.asarray(idx_pad)

        r = refit_pipeline_streamed(
            jnp.take(counts_dev, gather, axis=0),
            jnp.take(out["exceeds_packed"], gather, axis=0),
            jnp.asarray(tile_mask),
            jnp.asarray(np.asarray(res["size_factors"], dtype=dtype)),
            jnp.asarray(design),
            jnp.asarray(np.asarray(contrast, dtype=dtype)),
            jnp.asarray(lfc_null, dtype=dtype),
            out["trend_coeffs"],
            out["trend_used_mean"],
            out["mean_disp"],
            out["prior_disp_var"],
            out["squared_logres"],
            refit_block=refit_block,
            replaceable=host["replaceable"],
            alt_hypothesis=knobs.get("alt_hypothesis"),
            min_mu=knobs.get("min_mu", 0.5),
            min_disp=knobs.get("min_disp", 1e-8),
            max_disp=knobs.get("max_disp", 10.0),
            beta_tol=knobs.get("beta_tol", 1e-8),
            mu_init=knobs.get("mu_init", "linear"),
        )
        # One fetch for the refit outputs too (see the wrapper's device_get).
        r_host = jax.device_get(dict(r))
        rnp = {k: v[:n_rep] if np.ndim(v) >= 1 else v for k, v in r_host.items()}

        naz = rnp["new_all_zero"]
        live = ~naz
        refitted[idx[live]] = True
        new_all_zero_full[idx[naz]] = True

        for col in (
            "base_mean", "genewise_dispersions", "fitted_dispersions",
            "MAP_dispersions", "dispersions", "p_values", "statistics", "se",
        ):
            res[col][idx[live]] = rnp[col][live]
        res["lfc"][idx[live]] = rnp["lfc"][live]
        res["irls_converged"][idx[live]] = rnp["irls_converged"][live]

        # Genes that became all-zero after replacement: zeroed means/LFC
        # (reference dds.py:1381-1384) and neutral Wald statistics
        # (reference ds.py:356-360).
        res["base_mean"][idx[naz]] = 0.0
        res["lfc"][idx[naz]] = 0.0
        res["se"][idx[naz]] = 0.0
        res["statistics"][idx[naz]] = 0.0
        res["p_values"][idx[naz]] = 1.0
        res["rescue_overflow"] = res["rescue_overflow"] + rnp["rescue_overflow"]

    res["refitted"] = refitted
    res["new_all_zeroes"] = new_all_zero_full

    # Refitted genes carry the replace_cooks-based flag (reference
    # dds.py:1066-1110 with layers["replace_cooks"]); everything else keeps
    # the pre-replacement flag.
    outlier = np.where(refitted, res["cooks_outlier_refit"], res["cooks_outlier"])
    res["cooks_outlier"] = outlier
    del res["cooks_outlier_refit"]

    p = np.array(res["p_values"])
    if knobs.get("cooks_filter", True):
        p[outlier] = np.nan
        res["p_values"] = p
    res["padj"] = np.asarray(
        _padj_program(
            jnp.asarray(p),
            jnp.asarray(np.asarray(res["base_mean"], dtype=dtype)),
            jnp.asarray(np.ones(G, dtype=bool)),
            knobs.get("alpha", 0.05),
            knobs.get("independent_filter", True),
        )
    )
    return res


def run_summary_streamed(
    counts,
    design_matrix,
    contrast,
    lfc_null: float = 0.0,
    gene_block: int | None = None,
    dtype=np.float32,
    refit_cooks: bool = False,
    min_replicates: int = 7,
    n_genes: int | None = None,
    **knobs,
) -> dict:
    """Host convenience wrapper: pads genes, fills host inputs, unpads.

    Parameters
    ----------
    counts : (G, N) array-like, gene-major raw counts.
    design_matrix : (N, P) ndarray or DataFrame (cohorts are derived from it).
    contrast : (P,) vector.
    lfc_null : natural-log null LFC.
    gene_block : genes per streamed tile. None (default) = auto: the largest
        block whose ~20 live (block, N) temporaries fit a ~4 GB budget —
        which is the WHOLE gene axis for N <= ~1k samples (streaming in more
        blocks than memory requires only adds sequential small-kernel
        latency; measured 9x slower at 4 blocks of 100-sample tiles).
    refit_cooks : replace Cook's outlier counts and refit the affected genes
        (the reference's DEFAULT pipeline, pydeseq2/dds.py:221,1042-1064):
        the main pass runs in ``refit_mode``, the flagged genes are gathered
        into a compacted tile for :func:`refit_pipeline_streamed`, and
        outlier masking + padj are applied to the merged results. Adds
        ``replaced`` / ``refitted`` / ``new_all_zeroes`` outputs.
    min_replicates : minimum cohort size for a sample to be replaceable
        (reference default 7).
    knobs : forwarded to :func:`summary_pipeline_streamed`.
    """
    # Device-resident counts stay on device: at atlas scale the (G, N) tile
    # is gigabytes, and a remote-dispatch backend would pay a full
    # host->device re-upload per call if the wrapper forced numpy.
    on_device = isinstance(counts, jax.Array)
    if on_device:
        counts = counts.astype(dtype)
    else:
        counts = np.asarray(counts, dtype=dtype)
    G, N = counts.shape
    # ``n_genes``: number of LEADING valid gene lanes when the caller
    # pre-padded the gene axis (e.g. to a device-mesh multiple — device_put
    # needs shard-even shapes). Pad lanes beyond it are masked out of every
    # global reduction (incl. the independent-filtering quantiles) instead
    # of being treated as real all-zero genes, and outputs are sliced to it.
    G_phys = G  # physical leading dim (may exceed the valid count)
    if n_genes is not None:
        if not 0 < n_genes <= G:
            raise ValueError(f"n_genes={n_genes} outside (0, {G}]")
        G = n_genes
    # Median-of-ratios needs at least one all-positive gene; on zero-inflated
    # data the reference switches to iterative (MLE) size factors
    # (pydeseq2/dds.py:682-690). The streamed path runs the device-native
    # one-program equivalent (ops/sizefactors.py::iterative_size_factors,
    # golden-validated against r_iterative_size_factors.csv) and injects the
    # result; ``sf_fit_type="iterative"`` requests it explicitly.
    sf_req = knobs.get("sf_fit_type", "ratio")
    if knobs.get("size_factors") is None and sf_req in ("ratio", "iterative"):
        ratio_undefined = sf_req == "ratio" and not bool(
            np.asarray((counts > 0).all(axis=1).any())
        )
        if sf_req == "iterative" or ratio_undefined:
            if ratio_undefined:
                warnings.warn(
                    "Every gene contains at least one zero, cannot compute "
                    "log geometric means. Switching to iterative mode.",
                    UserWarning,
                    stacklevel=2,
                )
            from pydeseq2_tpu.ops.sizefactors import iterative_size_factors

            valid = jnp.arange(G_phys) < G
            # Same HBM live-temporary budget as the pipeline's own gene
            # blocking: past ~1 GB of counts, tile the solver's (G, N)
            # stages instead of materializing them whole-G.
            sf_block = None
            if G_phys * N * np.dtype(dtype).itemsize > 1_000_000_000:
                sf_block = int(
                    max(1024, min(G_phys, 4_000_000_000 // (80 * N)))
                )
            sf_it, _ = iterative_size_factors(
                jnp.asarray(counts),
                valid,
                min_disp=knobs.get("min_disp", 1e-8),
                max_disp=knobs.get("max_disp", float(max(10, N))),
                min_mu=knobs.get("min_mu", 0.5),
                gene_block=sf_block,
            )
            knobs["size_factors"] = sf_it
            knobs["sf_fit_type"] = "ratio"  # unused once factors are injected
    if gene_block is None:
        budget_bytes = 4_000_000_000
        raw = int(max(1024, min(G, budget_bytes // (80 * N))))
        # Even split: ceil(G/raw) blocks of near-equal size, so padding never
        # exceeds one block's rounding (a naive cap of 50k on 60k genes would
        # pad 40k dead lanes).
        n_blocks = -(-G // raw)
        gene_block = -(-G // n_blocks)
        gene_block = ((gene_block + 7) // 8) * 8  # tile-friendly
    host = summary_host_inputs(design_matrix, min_replicates)
    design = np.asarray(
        design_matrix.values if hasattr(design_matrix, "values") else design_matrix,
        dtype=dtype,
    )

    padded_G = math.ceil(G_phys / gene_block) * gene_block
    if padded_G != G_phys:
        pad = jnp.pad if on_device else np.pad
        counts = pad(counts, ((0, padded_G - G_phys), (0, 0)))
    gene_mask = np.arange(padded_G) < G

    knobs.setdefault("mu_init", host["mu_init"])
    if "sample_block" not in knobs:
        # Sample-block the size-factor medians once the full ratio matrix
        # would cost more than ~1 GB of extra device memory. No divisibility
        # requirement: the kernel clamps the last block's slice start, so
        # any block size works (prime N included).
        if G * N * np.dtype(dtype).itemsize > 1_000_000_000:
            knobs["sample_block"] = min(N, 1024)

    # Refitting is active only when some cohort can absorb a replacement
    # (reference pydeseq2/dds.py:1315-1320: no replaceable sample -> no-op).
    refit_active = refit_cooks and any(host["replaceable"])
    if refit_active:
        if not knobs.get("stats_layer", True):
            raise ValueError("refit_cooks needs the stats layer (Cook's flags)")
        knobs["refit_mode"] = True
        knobs["replaceable"] = host["replaceable"]

    counts_dev = jnp.asarray(counts)
    out = summary_pipeline_streamed(
        counts_dev,
        jnp.asarray(design),
        jnp.asarray(np.asarray(contrast, dtype=dtype)),
        jnp.asarray(lfc_null, dtype=dtype),
        jnp.asarray(host["cooks_cutoff"], dtype=dtype),
        jnp.asarray(gene_mask),
        gene_block=gene_block,
        cohort_ids=host["cohort_ids"],
        use_for_max=host["use_for_max"],
        **knobs,
    )
    # exceeds_packed is the one large output (G, ceil(N/32)) and is only
    # consumed device-side by the refit gather — never read it back to host.
    # ONE device_get for the whole tree: per-array np.asarray would pay a
    # full ~50 ms tunnel round-trip EACH on the remote backend (~17 arrays
    # = ~0.85 s of pure latency); a single fetch overlaps the transfers.
    host_out = jax.device_get(
        {k: v for k, v in out.items() if k != "exceeds_packed"}
    )
    res = {
        k: v[:G] if np.ndim(v) >= 1 and v.shape[0] == padded_G else v
        for k, v in host_out.items()
    }
    if refit_active:
        res = _apply_streamed_refit(
            res, out, counts_dev, design, contrast, lfc_null, host, knobs,
            gene_mask, dtype, G,
        )
    elif refit_cooks:
        res["replaced"] = np.zeros(G, dtype=bool)
        res["refitted"] = np.zeros(G, dtype=bool)
        res["new_all_zeroes"] = np.zeros(G, dtype=bool)
    res.pop("exceeds_packed", None)
    res["gene_block"] = gene_block
    if int(res.get("rescue_overflow", 0)) > 0:
        warnings.warn(
            f"{int(res['rescue_overflow'])} IRLS lanes still unconverged "
            "after the full 250-trip budget exceeded the compacted rescue "
            "tile: they skipped the Newton/grid rescue tiers and kept their "
            "final IRLS iterate (converged=False). This only happens when "
            ">~1.5% of genes fail to converge in IRLS; the staged "
            "DeseqDataSet path rescues without a cap.",
            UserWarning,
            stacklevel=2,
        )
    return res


# --------------------------------------------------------------- apeGLM shrink
@partial(
    jax.jit,
    static_argnames=(
        "gene_block",
        "shrink_index",
        "prior_no_shrink_scale",
    ),
)
def lfc_shrink_pipeline_streamed(
    counts: jnp.ndarray,
    size: jnp.ndarray,
    offset: jnp.ndarray,
    design_matrix: jnp.ndarray,
    prior_scale: jnp.ndarray,
    gene_mask: jnp.ndarray,
    *,
    gene_block: int = 8192,
    shrink_index: int = 1,
    prior_no_shrink_scale: float = 15.0,
):
    """apeGLM MAP shrinkage streamed over gene blocks (bounded memory).

    The shrink stage is embarrassingly blockable: its only global input is
    the prior scale (fitted host-side from the pass-1 MLE LFCs/SEs, see
    :func:`pydeseq2_tpu.models.stats._apeglm_prior_variance`). Each block
    runs the batched Newton MAP fit of :func:`ops.shrink.nbinom_glm_batch`;
    for P == 2 designs, blocks where Newton reports failure re-solve those
    lanes on a compacted tile with the vectorized 2-D grid — the reference's
    optimizer-fallback cascade (pydeseq2/utils.py:1126-1140,
    grid_search.py:224-320) behind a ``lax.cond`` so it costs nothing when
    every lane converges.

    Parameters
    ----------
    counts : (G, N) gene-major raw counts (G a multiple of ``gene_block``).
    size : (G,) NB size = 1/dispersion per gene.
    offset : (N,) log size factors.
    prior_scale : scalar, min(sqrt(prior_var), 1) — traced so refitting the
        prior does not recompile.

    Returns per-gene ``lfc`` (G, P) MAP coefficients (natural log),
    ``se`` (G,) posterior SD of the shrunk coefficient, ``converged`` (G,).
    Reference semantics: pydeseq2/ds.py:363-447.
    """
    from pydeseq2_tpu.ops import shrink as shrink_ops
    from pydeseq2_tpu.ops.smalllinalg import sym_inv

    G, N = counts.shape
    P = design_matrix.shape[1]
    X = design_matrix
    dtype = counts.dtype
    assert G % gene_block == 0, "pad G to a multiple of gene_block"
    n_blocks = G // gene_block
    pns = jnp.asarray(prior_no_shrink_scale, dtype)
    ps = jnp.asarray(prior_scale, dtype)

    def shrink_block(args):
        c, s, m = args
        beta, ih, conv = shrink_ops.nbinom_glm_batch(
            X, c, s, offset, prior_no_shrink_scale, prior_scale,
            shrink_index=shrink_index,
        )

        if P == 2:
            B = c.shape[0]
            K = min(B, max(256, B // 64))
            order = jnp.argsort(conv)  # failed lanes first (stable)
            idx = order[:K]
            sel = ~conv[idx] & m[idx]

            def grid_rescue(ops):
                beta, ih = ops
                cnst = jnp.maximum(
                    shrink_ops.nbinom_fn_batch(
                        jnp.zeros((K, P), dtype), X, c[idx], s[idx], offset,
                        pns, ps, shrink_index,
                    ),
                    1.0,
                )
                b_grid = shrink_ops.grid_fit_shrink_beta_batch(
                    c[idx], offset, X, s[idx], prior_no_shrink_scale,
                    prior_scale, cnst, shrink_index=shrink_index,
                )
                new_b = jnp.where(sel[:, None], b_grid, beta[idx])
                ih_g = sym_inv(
                    shrink_ops._hess(
                        new_b, X, c[idx], s[idx], offset, pns, ps, shrink_index
                    )
                )
                return (
                    beta.at[idx].set(new_b),
                    ih.at[idx].set(
                        jnp.where(sel[:, None, None], ih_g, ih[idx])
                    ),
                )

            beta, ih = jax.lax.cond(
                (~conv & m).any(), grid_rescue, lambda ops: ops, (beta, ih)
            )

        se = jnp.sqrt(jnp.abs(ih[:, shrink_index, shrink_index]))
        return {
            "lfc": jnp.where(m[:, None], beta, jnp.nan),
            "se": jnp.where(m, se, jnp.nan),
            "converged": conv,
        }

    blocks = jax.lax.map(
        shrink_block,
        (
            counts.reshape(n_blocks, gene_block, N),
            size.reshape(n_blocks, gene_block),
            gene_mask.reshape(n_blocks, gene_block),
        ),
    )
    return {k: v.reshape((G,) + v.shape[2:]) for k, v in blocks.items()}


def run_lfc_shrink_streamed(
    counts,
    design_matrix,
    coeff_idx: int,
    dispersions,
    size_factors,
    mle_lfc=None,
    mle_se=None,
    adapt: bool = True,
    gene_block: int | None = None,
    dtype=np.float32,
    prior_no_shrink_scale: float = 15.0,
    n_genes: int | None = None,
) -> dict:
    """Host wrapper: apeGLM-shrink one coefficient at any scale.

    Feed it the outputs of :func:`run_summary_streamed` (``dispersions``,
    ``size_factors``, and — when ``adapt`` — the MLE ``lfc`` column and
    ``se`` that the adaptive prior variance is fitted from, reference
    pydeseq2/ds.py:384-397). Genes with NaN dispersions (all-zero lanes)
    return NaN.
    """
    on_device = isinstance(counts, jax.Array)
    if on_device:
        counts = counts.astype(dtype)
    else:
        counts = np.asarray(counts, dtype=dtype)
    G, N = counts.shape
    # ``n_genes``: number of LEADING valid gene lanes when the caller
    # pre-padded the gene axis (e.g. to a device-mesh multiple — device_put
    # needs shard-even shapes); auxiliary per-gene arrays (dispersions,
    # size) stay at the VALID length. Pad lanes are masked out of every
    # reduction instead of being treated as real genes; outputs slice to it.
    G_phys = G  # physical leading dim (may exceed the valid count)
    if n_genes is not None:
        if not 0 < n_genes <= G:
            raise ValueError(f"n_genes={n_genes} outside (0, {G}]")
        G = n_genes
    design = np.asarray(
        design_matrix.values if hasattr(design_matrix, "values") else design_matrix,
        dtype=dtype,
    )
    prior_scale = 1.0
    if adapt:
        if mle_lfc is None or mle_se is None:
            raise ValueError("adapt=True needs mle_lfc and mle_se")
        from pydeseq2_tpu.models.stats import _apeglm_prior_variance

        prior_var = _apeglm_prior_variance(
            np.asarray(mle_lfc, float), np.asarray(mle_se, float)
        )
        prior_scale = min(float(np.sqrt(prior_var)), 1.0)

    if gene_block is None:
        raw = int(max(1024, min(G, 4_000_000_000 // (80 * N))))
        n_blocks = -(-G // raw)
        gene_block = ((-(-G // n_blocks) + 7) // 8) * 8

    padded_G = math.ceil(G_phys / gene_block) * gene_block
    if padded_G != G_phys:
        pad = jnp.pad if on_device else np.pad
        counts = pad(counts, ((0, padded_G - G_phys), (0, 0)))
    gene_mask = np.arange(padded_G) < G

    disp = np.asarray(dispersions, dtype=dtype)
    ok = np.isfinite(disp) & (disp > 0)
    size = np.ones(padded_G, dtype=dtype)
    size[: G][ok] = 1.0 / disp[ok]
    gene_mask = gene_mask & np.pad(ok, (0, padded_G - G))

    out = lfc_shrink_pipeline_streamed(
        jnp.asarray(counts),
        jnp.asarray(size),
        jnp.asarray(np.log(np.asarray(size_factors, dtype=dtype))),
        jnp.asarray(design),
        jnp.asarray(prior_scale, dtype=dtype),
        jnp.asarray(gene_mask),
        gene_block=gene_block,
        shrink_index=int(coeff_idx),
        prior_no_shrink_scale=prior_no_shrink_scale,
    )
    res = {k: v[:G] for k, v in jax.device_get(dict(out)).items()}
    res["prior_scale"] = prior_scale
    res["gene_block"] = gene_block
    return res


# ------------------------------------------------------------------ blind VST
@partial(
    jax.jit,
    static_argnames=(
        "gene_block",
        "sample_block",
        "min_mu",
        "min_disp",
        "max_disp",
        "trend_type",
    ),
)
def vst_pipeline_streamed(
    counts: jnp.ndarray,
    gene_mask: jnp.ndarray | None = None,
    *,
    gene_block: int = 8192,
    sample_block: int | None = None,
    min_mu: float = 0.5,
    min_disp: float = 1e-8,
    max_disp: float = 10.0,
    trend_type: str = "parametric",
):
    """Blind variance-stabilizing transform streamed over gene blocks.

    The streamed analog of :func:`fused.vst_pipeline` (reference
    pydeseq2/dds.py:349-514 with ``use_design=False``): pass 1 fits
    intercept-design genewise dispersions per block, the trend is the usual
    O(G) global reduction, pass 2 applies the closed-form (parametric) or
    arcsinh (mean) transform per block. Peak temporaries are
    O(gene_block x N) plus the single (G, N) output tile.
    """
    G, N = counts.shape
    dtype = counts.dtype
    if gene_mask is None:
        gene_mask = jnp.ones((G,), dtype=bool)
    assert G % gene_block == 0, "pad G to a multiple of gene_block"
    n_blocks = G // gene_block
    X = jnp.ones((N, 1), dtype=dtype)

    cblocks = counts.reshape(n_blocks, gene_block, N)
    mblocks = gene_mask.reshape(n_blocks, gene_block)

    def log_stats_block(args):
        c, m = args
        return jnp.log(c).mean(axis=1), (c > 0).any(axis=1) & m

    logmeans, non_zero = jax.lax.map(log_stats_block, (cblocks, mblocks))
    logmeans = logmeans.reshape(G)
    non_zero = non_zero.reshape(G)
    sf = _streamed_size_factors(counts, gene_mask, logmeans, sample_block)

    def genewise_block(c):
        normed = c / sf[None, :]
        base_mean = normed.mean(axis=1)
        mom = jnp.clip(
            jnp.minimum(
                fit_rough_dispersions_batch(normed, X),
                fit_moments_dispersions_batch(normed, sf),
            ),
            min_disp,
            max_disp,
        )
        mu_hat = jnp.maximum(sf[None, :] * base_mean[:, None], min_mu)
        gw, _ = alpha_mle_batch(
            c, X, mu_hat, mom, min_disp, max_disp, cr_reg=True, prior_reg=False,
        )
        return base_mean, jnp.clip(gw, min_disp, max_disp)

    base_mean, genewise = jax.lax.map(genewise_block, cblocks)
    base_mean = base_mean.reshape(G)
    genewise_m = jnp.where(non_zero, genewise.reshape(G), jnp.nan)

    fitted, coeffs, used_mean, mean_disp = fit_fused_trend(
        base_mean, genewise_m, non_zero, min_disp, trend_type
    )

    def transform_block(c):
        normed = c / sf[None, :]
        mean_vst = (
            2.0 * jnp.arcsinh(jnp.sqrt(mean_disp * normed))
            - jnp.log(mean_disp)
            - jnp.log(4.0)
        ) / jnp.log(2.0)
        if trend_type == "parametric":
            a0, a1 = coeffs[0], coeffs[1]
            parametric_vst = jnp.log2(
                (
                    1.0
                    + a1
                    + 2.0 * a0 * normed
                    + 2.0 * jnp.sqrt(a0 * normed * (1.0 + a1 + a0 * normed))
                )
                / (4.0 * a0)
            )
            return jnp.where(used_mean, mean_vst, parametric_vst)
        return mean_vst

    vst = jax.lax.map(transform_block, cblocks).reshape(G, N)

    out = {
        "vst_counts": jnp.where(gene_mask[:, None], vst, jnp.nan),
        "size_factors": sf,
        "base_mean": base_mean,
        "genewise_dispersions": genewise_m,
        "mean_disp": mean_disp,
    }
    if trend_type == "parametric":
        out["trend_coeffs"] = coeffs
        out["trend_used_mean"] = used_mean
    return out


def run_vst_streamed(
    counts,
    gene_block: int | None = None,
    dtype=np.float32,
    n_genes: int | None = None,
    **knobs,
) -> dict:
    """Host wrapper for :func:`vst_pipeline_streamed` (pads/unpads genes)."""
    on_device = isinstance(counts, jax.Array)
    if on_device:
        counts = counts.astype(dtype)
    else:
        counts = np.asarray(counts, dtype=dtype)
    G, N = counts.shape
    # ``n_genes``: number of LEADING valid gene lanes when the caller
    # pre-padded the gene axis (e.g. to a device-mesh multiple — device_put
    # needs shard-even shapes). Pad lanes beyond it are masked out of every
    # global reduction (incl. the independent-filtering quantiles) instead
    # of being treated as real all-zero genes, and outputs are sliced to it.
    G_phys = G  # physical leading dim (may exceed the valid count)
    if n_genes is not None:
        if not 0 < n_genes <= G:
            raise ValueError(f"n_genes={n_genes} outside (0, {G}]")
        G = n_genes
    if gene_block is None:
        raw = int(max(1024, min(G, 4_000_000_000 // (80 * N))))
        n_blocks = -(-G // raw)
        gene_block = ((-(-G // n_blocks) + 7) // 8) * 8
    padded_G = math.ceil(G_phys / gene_block) * gene_block
    if padded_G != G_phys:
        pad = jnp.pad if on_device else np.pad
        counts = pad(counts, ((0, padded_G - G_phys), (0, 0)))
    gene_mask = np.arange(padded_G) < G
    if "sample_block" not in knobs:
        if G * N * np.dtype(dtype).itemsize > 1_000_000_000:
            knobs["sample_block"] = min(N, 1024)
    out = vst_pipeline_streamed(
        jnp.asarray(counts),
        jnp.asarray(gene_mask),
        gene_block=gene_block,
        **knobs,
    )
    res = {
        k: v[:G] if np.ndim(v) >= 1 and v.shape[0] == padded_G else v
        for k, v in jax.device_get(dict(out)).items()
    }
    res["gene_block"] = gene_block
    return res
