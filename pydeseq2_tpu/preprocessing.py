"""Median-of-ratios normalization as a fit/transform pair.

Parity target (reference, owkin/PyDESeq2): pydeseq2/preprocessing.py:5-102.
API-compatible with the reference (accepts pandas DataFrames or arrays and
returns the same types); the array math runs as jnp reductions so it executes
on-device and shards over genes (log-mean) and samples (median).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pandas as pd

from pydeseq2_tpu.ops.select import masked_median_select


def deseq2_norm(counts):
    """Return normalized counts and size factors (median-of-ratios).

    Parity: reference pydeseq2/preprocessing.py:5-28.
    """
    logmeans, filtered_genes = deseq2_norm_fit(counts)
    return deseq2_norm_transform(counts, logmeans, filtered_genes)


def deseq2_norm_fit(counts):
    """Return gene-wise ``logmeans`` and the ``filtered_genes`` mask.

    Parity: reference pydeseq2/preprocessing.py:31-56. Genes with any zero
    count have -inf log-mean and are excluded from the median.
    """
    values = counts.to_numpy() if isinstance(counts, pd.DataFrame) else counts
    x = jnp.asarray(values, dtype=jnp.result_type(float))
    log_counts = jnp.log(x)
    logmeans = log_counts.mean(0)
    filtered_genes = ~jnp.isinf(logmeans)
    return np.asarray(logmeans), np.asarray(filtered_genes)


def poscounts_norm_fit(counts):
    """Gene-wise log-geometric-means over *positive* counts only.

    Positive-counts variant of :func:`deseq2_norm_fit` for zero-rich data
    (single-cell / metagenomics). Zeros contribute log(1)=0 to the mean but
    the divisor stays the full sample count, matching DESeq2's poscounts
    definition (reference pydeseq2/dds.py:659-665). Returns ``(logmeans,
    usable_genes)`` where a gene is usable when its logmean is finite and
    strictly positive.
    """
    values = counts.to_numpy() if isinstance(counts, pd.DataFrame) else counts
    x = jnp.asarray(values, dtype=jnp.result_type(float))
    log_pos = jnp.where(x > 0, jnp.log(jnp.where(x > 0, x, 1.0)), 0.0)
    logmeans = log_pos.mean(0)
    usable = jnp.isfinite(logmeans) & (logmeans > 0)
    return np.asarray(logmeans), np.asarray(usable)


def poscounts_size_factors(counts, logmeans, gene_mask):
    """Per-sample poscounts size factors as one batched device reduction.

    For each sample, the size factor is exp(median of log-ratios
    ``log x_g - logmean_g``) over the genes that are both in ``gene_mask``
    and positive in that sample — a *ragged* per-sample median. It is
    computed densely: excluded entries are pushed to +inf and the median is
    selected at the per-row valid-count midpoints by the exact sort-free
    radix bisection (ops/select.py). Size factors are then rescaled to
    geometric mean 1 (reference pydeseq2/dds.py:668-679 runs this as a
    Python loop via ``np.apply_along_axis``; here it is one batched device
    reduction at any sample count).
    """
    values = counts.to_numpy() if isinstance(counts, pd.DataFrame) else counts
    x = jnp.asarray(values, dtype=jnp.result_type(float))
    logmeans = jnp.asarray(logmeans)
    gene_mask = jnp.asarray(gene_mask, dtype=bool)

    in_median = gene_mask[None, :] & (x > 0)
    ratios = jnp.where(
        in_median,
        jnp.log(jnp.where(x > 0, x, 1.0)) - logmeans[None, :],
        jnp.inf,
    )
    med = masked_median_select(ratios, in_median.sum(axis=1), axis=1)
    sf = jnp.exp(med)
    sf = sf / jnp.exp(jnp.mean(jnp.log(sf)))
    return np.asarray(sf)


def deseq2_norm_transform(counts, logmeans, filtered_genes):
    """Normalize ``counts`` with previously fitted ``logmeans``.

    Parity: reference pydeseq2/preprocessing.py:59-102. The ``filtered_genes``
    mask may be further restricted (control genes, reference
    pydeseq2/dds.py:696-703).
    """
    is_df = isinstance(counts, pd.DataFrame)
    values = counts.to_numpy() if is_df else counts
    x = jnp.asarray(values, dtype=jnp.result_type(float))
    logmeans = jnp.asarray(logmeans)
    mask = np.asarray(filtered_genes)
    log_ratios = jnp.log(x[:, mask]) - logmeans[mask][None, :]
    log_medians = masked_median_select(
        log_ratios, log_ratios.shape[1], axis=1
    )
    size_factors = jnp.exp(log_medians)
    normed = x / size_factors[:, None]
    if is_df:
        normed_out = pd.DataFrame(
            np.asarray(normed), index=counts.index, columns=counts.columns
        )
        sf_out = pd.Series(np.asarray(size_factors), index=counts.index)
        return normed_out, sf_out
    return np.asarray(normed), np.asarray(size_factors)
