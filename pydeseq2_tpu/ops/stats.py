"""Robust statistics kernels: trimmed moments, MAD, BH adjustment, lowess.

Behavioral parity targets (reference, owkin/PyDESeq2):
- trimmed_mean / trimmed_variance / trimmed_cell_variance: pydeseq2/utils.py:567-679
- mean_absolute_deviation: pydeseq2/utils.py:1210-1227
- BH adjustment: scipy.stats.false_discovery_control(method="bh") as used in
  pydeseq2/ds.py:513,540
- lowess: pydeseq2/utils.py:1379-1443 (tricube robust local linear regression)

Everything that touches the (samples x genes) matrix is a batched jnp kernel so
it runs on-device and shards over the gene axis. The tiny fixed-size pieces
(lowess over 50 filtering cutoffs) run wherever jnp places them - they are
O(50^2) and irrelevant for performance.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

# Phi^{-1}(0.75), used by the scaled MAD estimator. Hard constant so no
# scipy.stats dependency on the device path.
_NORM_PPF_075 = 0.6744897501960817


def trimmed_mean(x: jnp.ndarray, trim: float = 0.1, axis: int = 0) -> jnp.ndarray:
    """Mean after trimming ``floor(n * trim)`` entries at each end (sorted).

    Parity: reference pydeseq2/utils.py:567-599 (sort-based trim, *not*
    scipy.stats.trim_mean's interpolation). Long trim axes use the exact
    sort-free selection kernel (ops/select.py::trimmed_mean_select — same
    kept multiset, only the fp summation order differs): at atlas sample
    counts the per-column bitonic sorts dominated the Cook's stage
    (~178 exchange stages at n=10k vs ~33 count passes).

    Inputs must be FINITE: on the select path (n >= 1024) a NaN entry is
    silently dropped from the interior sum (comparisons are false) instead
    of propagating NaN like the sort path would — every caller feeds
    normalized counts / squared residuals, which are finite by
    construction.
    """
    x = jnp.asarray(x)
    n = x.shape[axis]
    if n >= 1024 and x.dtype in (jnp.float32, jnp.float64):
        from pydeseq2_tpu.ops.select import trimmed_mean_select

        return trimmed_mean_select(x, trim, axis=axis)
    ntrim = math.floor(n * trim)
    s = jnp.sort(x, axis=axis)
    sl = [slice(None)] * s.ndim
    sl[axis] = slice(ntrim, n - ntrim)
    return s[tuple(sl)].mean(axis)


def scipy_style_trim_mean(x: jnp.ndarray, proportiontocut: float, axis: int = 0):
    """scipy.stats.trim_mean semantics (used by the reference for the mean trend).

    scipy trims ``int(n * proportiontocut)`` values at each end of the sorted
    array; for the proportions used here (0.001) this matches floor().
    Parity: scipy.stats.trim_mean as called at reference pydeseq2/dds.py:505,1288.
    """
    return trimmed_mean(x, trim=proportiontocut, axis=axis)


def trimmed_mean_masked(
    values: jnp.ndarray, sel: jnp.ndarray, cut: float
) -> jnp.ndarray:
    """Trimmed mean over a dynamic lane selection (in-program variant).

    Unlike :func:`trimmed_mean`, the number of selected lanes is a traced
    value (masked batch execution can't slice statically): deselected lanes
    sort to +inf and a rank-range mask replaces the slice. Used by the fused
    pipeline's mean-trend fallback. Parity: scipy.stats.trim_mean as used by
    reference pydeseq2/dds.py:1292.
    """
    G = values.shape[0]
    sorted_vals = jnp.sort(jnp.where(sel, values, jnp.inf))
    n_sel = sel.sum()
    ntrim = jnp.floor(n_sel * cut).astype(jnp.int32)
    idx = jnp.arange(G)
    in_range = (idx >= ntrim) & (idx < n_sel - ntrim)
    safe = jnp.where(jnp.isinf(sorted_vals), 0.0, sorted_vals)
    return jnp.where(in_range, safe, 0.0).sum() / jnp.maximum(in_range.sum(), 1)


def trimmed_variance(x: jnp.ndarray, trim: float = 0.125, axis: int = 0) -> jnp.ndarray:
    """Trimmed variance with the 1.51 trimming-bias scale factor.

    Parity: reference pydeseq2/utils.py:653-679.
    """
    rm = trimmed_mean(x, trim=trim, axis=axis)
    sqerror = (x - jnp.expand_dims(rm, axis)) ** 2
    return 1.51 * trimmed_mean(sqerror, trim=trim, axis=axis)


# (trim ratio, scale) lookup by cohort-size bin; bins are n < 3.5, n < 23.5,
# n >= 23.5. Parity: reference pydeseq2/utils.py:622-645.
_COHORT_TRIM_RATIOS = (1.0 / 3.0, 1.0 / 4.0, 1.0 / 8.0)
_COHORT_SCALES = (2.04, 1.86, 1.51)


def _cohort_bin(n: int) -> int:
    return 2 if n >= 23.5 else 1 if n >= 3.5 else 0


def trimmed_cell_variance(counts: jnp.ndarray, cells: np.ndarray) -> jnp.ndarray:
    """Max-over-cohorts trimmed variance of counts, grouped by ``cells``.

    Parameters
    ----------
    counts : (N, G) array
        Sample-major counts (device array).
    cells : (N,) numpy int array
        Host-side cohort id per sample. Cohort membership is part of the
        experiment design, i.e. static -> per-cohort gathers are host-static
        index lists and everything stays jit-compatible.

    Parity: reference pydeseq2/utils.py:602-650.
    """
    cells = np.asarray(cells)
    levels = list(dict.fromkeys(cells.tolist()))  # preserve first-seen order
    var_ests = []
    for lvl in levels:
        idx = np.where(cells == lvl)[0]
        b = _cohort_bin(len(idx))
        trim, scale = _COHORT_TRIM_RATIOS[b], _COHORT_SCALES[b]
        sub = counts[idx, :]
        cell_means = trimmed_mean(sub, trim=trim, axis=0)
        sqerror = (sub - cell_means[None, :]) ** 2
        var_ests.append(scale * trimmed_mean(sqerror, trim=trim, axis=0))
    return jnp.stack(var_ests, axis=0).max(axis=0)


def mean_absolute_deviation(x: jnp.ndarray) -> jnp.ndarray:
    """Scaled median-absolute-deviation estimator.

    Parity: reference pydeseq2/utils.py:1210-1227.
    """
    center = jnp.median(x)
    return jnp.median(jnp.abs(x - center)) / _NORM_PPF_075


def bh_adjust_masked(p_values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Benjamini-Hochberg adjustment of ``p_values`` restricted to ``mask``.

    Batched over leading axes: the adjustment is performed independently per
    leading mask index on the masked subset, with NaN outside the mask. This
    vectorizes the reference's 50 independent-filtering BH passes
    (pydeseq2/ds.py:509-513) into one device program.

    When ``p_values`` has FEWER dims than ``mask`` (one shared p-vector,
    many masks — exactly the independent-filtering sweep), the rows share a
    single argsort of p: each row's masked subset keeps its relative order
    under the global sort, so the per-row subset rank is just a cumsum of
    the sorted mask. That turns M sorts of G into 1 sort + M cumsum/cummin
    passes — on TPU the 50-row sweep was sort-dominated (50 bitonic sorts
    of 60k). Tied p-values are safe: BH assigns every element of a tie run
    the same adjusted value regardless of how the sort permutes the run.
    The shared-sort path requires a 1-D p vector; a broadcastable p with
    1 < p.ndim < mask.ndim falls through to the per-row path (jnp.take
    fancy indexing would silently mis-shape it otherwise). NaN entries
    inside the mask are treated as unmasked (every caller pre-masks NaNs;
    a NaN reaching the right-to-left cummin sweep would poison the whole
    row).

    Parity: scipy.stats.false_discovery_control(ps, method="bh").
    """
    p = jnp.asarray(p_values, dtype=jnp.result_type(float))
    mask = jnp.asarray(mask, dtype=bool)
    mask = mask & ~jnp.isnan(p)
    n_valid = mask.sum(axis=-1, keepdims=True)

    if p.ndim == 1:
        # Shared-order path: one sort for every mask row.
        order = jnp.argsort(p, axis=-1)
        p_sorted = jnp.take(p, order, axis=-1)
        mask_sorted = mask[..., order]
        ranks = jnp.cumsum(mask_sorted, axis=-1, dtype=p.dtype)
        scaled = jnp.where(
            mask_sorted,
            p_sorted * n_valid / jnp.maximum(ranks, 1.0),
            jnp.inf,
        )
        rev_cummin = jnp.flip(jax_lax_cummin(jnp.flip(scaled, -1)), -1)
        adj_sorted = jnp.clip(rev_cummin, max=1.0)
        inv = jnp.argsort(order, axis=-1)
        adj = adj_sorted[..., inv]
        return jnp.where(mask, adj, jnp.nan)

    big = jnp.inf
    pm = jnp.where(mask, p, big)
    order = jnp.argsort(pm, axis=-1)
    p_sorted = jnp.take_along_axis(pm, order, axis=-1)
    g = p.shape[-1]
    ranks = jnp.arange(1, g + 1, dtype=p.dtype)
    scaled = p_sorted * n_valid / ranks
    # Running minimum from the right (monotonicity enforcement).
    rev_cummin = jnp.flip(
        jax_lax_cummin(jnp.flip(scaled, axis=-1)),
        axis=-1,
    )
    adj_sorted = jnp.clip(rev_cummin, max=1.0)
    # Scatter back to the original order.
    inv = jnp.argsort(order, axis=-1)
    adj = jnp.take_along_axis(adj_sorted, inv, axis=-1)
    return jnp.where(mask, adj, jnp.nan)


def jax_lax_cummin(x: jnp.ndarray) -> jnp.ndarray:
    """Cumulative minimum along the last axis."""
    import jax.lax

    return jax.lax.cummin(x, axis=x.ndim - 1)


def lowess_device(
    features: jnp.ndarray, targets: jnp.ndarray, frac: float = 2.0 / 3.0, it: int = 3
) -> jnp.ndarray:
    """Device (jit-compatible) lowess over a small fixed-size grid.

    Same arithmetic as :func:`lowess` (tricube weights, closed-form 2x2
    weighted least squares per point, 3 robustifying iterations), expressed as
    batched jnp ops so the fused summary pipeline can run independent
    filtering without a host roundtrip. Input size is static (the 50
    independent-filtering cutoffs), so the r-th-neighbour bandwidth index is
    compile-time constant.

    Parity: reference pydeseq2/utils.py:1379-1443.
    """
    import jax

    f = jnp.asarray(features)
    y = jnp.asarray(targets, dtype=f.dtype)
    n = f.shape[0]
    r = int(math.ceil(frac * n))
    dists = jnp.abs(f[:, None] - f[None, :])
    h = jnp.maximum(jnp.sort(dists, axis=1)[:, r], 1e-12)
    w = jnp.clip(dists / h[None, :], 0.0, 1.0)
    w = (1.0 - w**3) ** 3  # (n, n); column i = weights for local fit at i

    def one_round(delta, _):
        weights = delta[:, None] * w
        sw = weights.sum(0)
        swf = (weights * f[:, None]).sum(0)
        swff = (weights * f[:, None] ** 2).sum(0)
        b0 = (weights * y[:, None]).sum(0)
        b1 = (weights * (y * f)[:, None]).sum(0)
        det = sw * swff - swf**2
        beta0 = (b0 * swff - b1 * swf) / det
        beta1 = (sw * b1 - swf * b0) / det
        yest = beta0 + beta1 * f
        resid = y - yest
        s = jnp.median(jnp.abs(resid))
        delta_new = jnp.where(
            s == 0,
            (jnp.abs(resid) > 0).astype(f.dtype),
            jnp.clip(resid / (6.0 * s), -1.0, 1.0),
        )
        delta_new = (1.0 - delta_new**2) ** 2
        return delta_new, yest

    _, yests = jax.lax.scan(one_round, jnp.ones(n, dtype=f.dtype), None, length=it)
    return yests[-1]


