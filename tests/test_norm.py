"""Size-factor / normalization conformance tests vs R DESeq2 golden files.

Mirrors reference tests/test_pydeseq2.py:40-92,344-365,806-866.
"""

import numpy as np
import pandas as pd

from pydeseq2_tpu import DeseqDataSet, deseq2_norm, deseq2_norm_fit, deseq2_norm_transform

from conftest import data_path


def test_size_factors_ratio(counts_df, metadata):
    r_size_factors = pd.read_csv(
        data_path("single_factor", "r_test_size_factors.csv"), index_col=0
    )["x"].values
    dds = DeseqDataSet(counts=counts_df, metadata=metadata, design="~condition")
    dds.fit_size_factors()
    np.testing.assert_array_almost_equal(dds.obs["size_factors"], r_size_factors)


def test_size_factors_poscounts(counts_df, metadata):
    dds = DeseqDataSet(counts=counts_df, metadata=metadata, design="~condition")
    dds.fit_size_factors("poscounts")
    r_size_factors = pd.read_csv(
        data_path("single_factor", "r_test_size_factors_poscount.csv"), index_col=0
    )["sizeFactor"].values
    np.testing.assert_array_almost_equal(dds.obs["size_factors"], r_size_factors)


def test_size_factors_control_genes(counts_df, metadata):
    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        design="~condition",
        control_genes=["gene4"],
    )
    dds.fit_size_factors()
    np.testing.assert_array_almost_equal(
        dds.obs["size_factors"],
        counts_df["gene4"] / np.exp(np.log(counts_df["gene4"]).mean()),
    )
    dds.fit_size_factors(fit_type="poscounts")
    np.testing.assert_array_almost_equal(
        dds.obs["size_factors"],
        counts_df["gene4"] / np.exp(np.log(counts_df["gene4"]).mean()),
    )


def test_iterative_size_factors(counts_df, metadata, tol=0.02):
    r_size_factors = pd.read_csv(
        data_path("single_factor", "r_iterative_size_factors.csv"), index_col=0
    ).squeeze()
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds._fit_iterate_size_factors()
    assert (
        abs(r_size_factors.values - dds.obs["size_factors"].values)
        / abs(r_size_factors.values)
    ).max() < tol


def test_iterative_size_factors_blocked_matches_whole_g():
    """gene_block= tiles the device solver's (G, N) stages over gene tiles;
    the result must match the whole-G program to reduction-reassociation
    rounding (the tiling only changes summation order), including with a
    padded last tile and with explicitly masked padding lanes."""
    import jax.numpy as jnp

    from pydeseq2_tpu.ops.sizefactors import iterative_size_factors

    rng = np.random.default_rng(3)
    counts = rng.poisson(15.0, (37, 9)).astype(np.float64)
    counts[np.arange(37), np.arange(37) % 9] = 0.0  # a zero in every gene
    full, it_full = iterative_size_factors(jnp.asarray(counts))
    blk, it_blk = iterative_size_factors(jnp.asarray(counts), gene_block=8)
    assert int(it_full) == int(it_blk)
    np.testing.assert_allclose(np.asarray(blk), np.asarray(full), rtol=1e-9)

    # Pre-padded gene axis + mask (the streamed wrapper's calling shape):
    # pad lanes must not perturb the optimization in either tiling.
    counts_pad = np.concatenate([counts, np.zeros((5, 9))])
    mask = np.arange(42) < 37
    blk_m, _ = iterative_size_factors(
        jnp.asarray(counts_pad), jnp.asarray(mask), gene_block=8
    )
    np.testing.assert_allclose(np.asarray(blk_m), np.asarray(full), rtol=1e-9)


def test_deseq2_norm_matches_dataset(counts_df, metadata):
    dds = DeseqDataSet(counts=counts_df, metadata=metadata)
    dds.fit_size_factors()
    s2 = deseq2_norm(counts_df)[1]
    np.testing.assert_array_almost_equal(dds.obs["size_factors"], s2, decimal=8)


def test_deseq2_norm_fit_transform_shapes(counts_df):
    train, test = counts_df[25:75], counts_df[0:25]
    logmeans, filtered_genes = deseq2_norm_fit(train)
    assert logmeans.shape == (10,)
    assert filtered_genes.shape == (10,)
    normed, sf = deseq2_norm_transform(test, logmeans, filtered_genes)
    assert isinstance(normed, pd.DataFrame)
    assert normed.shape == (25, 10)
    assert sf.shape == (25,)
