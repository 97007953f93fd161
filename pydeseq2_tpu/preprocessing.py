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
    log_medians = jnp.median(log_ratios, axis=1)
    size_factors = jnp.exp(log_medians)
    normed = x / size_factors[:, None]
    if is_df:
        normed_out = pd.DataFrame(
            np.asarray(normed), index=counts.index, columns=counts.columns
        )
        sf_out = pd.Series(np.asarray(size_factors), index=counts.index)
        return normed_out, sf_out
    return np.asarray(normed), np.asarray(size_factors)
