"""Behavioral/robustness tests (all-zero genes, validation, tiny cohorts...).

Mirrors reference tests/test_edge_cases.py:10-527.
"""

import numpy as np
import pandas as pd
import pytest

from pydeseq2_tpu import DeseqDataSet, DeseqStats


def test_zero_genes(counts_df, metadata):
    """All-zero genes produce NaN params and NaN stats."""
    n, m = counts_df.shape
    np.random.seed(42)
    zero_genes = counts_df.columns[np.random.choice(m, size=m // 3, replace=False)]
    counts_df[zero_genes] = 0

    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.deseq2()

    assert np.isnan(dds.var.loc[zero_genes, "dispersions"]).all()
    assert np.isnan(dds.varm["LFC"].loc[zero_genes]).all().all()

    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    results_df = ds.results_df

    assert (results_df.loc[zero_genes].baseMean == 0).all()
    assert results_df.loc[zero_genes].log2FoldChange.isna().all()
    assert results_df.loc[zero_genes].lfcSE.isna().all()
    assert results_df.loc[zero_genes].stat.isna().all()
    assert results_df.loc[zero_genes].pvalue.isna().all()
    assert results_df.loc[zero_genes].padj.isna().all()


def test_nan_counts():
    counts_df = pd.DataFrame(
        {"gene1": [0, np.nan], "gene2": [4, 12]}, index=["sample1", "sample2"]
    )
    metadata = pd.DataFrame({"condition": [0, 1]}, index=["sample1", "sample2"])
    with pytest.raises(ValueError):
        DeseqDataSet(counts=counts_df, metadata=metadata, design="~condition")


def test_numeric_counts():
    counts_df = pd.DataFrame(
        {"gene1": [0, "a"], "gene2": [4, 12]}, index=["sample1", "sample2"]
    )
    metadata = pd.DataFrame({"condition": [0, 1]}, index=["sample1", "sample2"])
    with pytest.raises(ValueError):
        DeseqDataSet(counts=counts_df, metadata=metadata, design="~condition")


def test_integer_counts():
    counts_df = pd.DataFrame(
        {"gene1": [0, 1.5], "gene2": [4, 12]}, index=["sample1", "sample2"]
    )
    metadata = pd.DataFrame({"condition": [0, 1]}, index=["sample1", "sample2"])
    with pytest.raises(ValueError):
        DeseqDataSet(counts=counts_df, metadata=metadata, design="~condition")


def test_non_negative_counts():
    counts_df = pd.DataFrame(
        {"gene1": [0, -1], "gene2": [4, 12]}, index=["sample1", "sample2"]
    )
    metadata = pd.DataFrame({"condition": [0, 1]}, index=["sample1", "sample2"])
    with pytest.raises(ValueError):
        DeseqDataSet(counts=counts_df, metadata=metadata, design="~condition")


def test_nan_factors():
    counts_df = pd.DataFrame(
        {"gene1": [0, 1], "gene2": [4, 12]}, index=["sample1", "sample2"]
    )
    metadata = pd.DataFrame({"condition": [0, np.nan]}, index=["sample1", "sample2"])
    with pytest.raises(ValueError):
        DeseqDataSet(counts=counts_df, metadata=metadata, design="~condition")


def test_one_factor():
    counts_df = pd.DataFrame(
        {"gene1": [0, 1], "gene2": [4, 12]}, index=["sample1", "sample2"]
    )
    metadata = pd.DataFrame({"condition": [0, 0]}, index=["sample1", "sample2"])
    with pytest.warns(UserWarning):
        DeseqDataSet(counts=counts_df, metadata=metadata, design="~condition")


def test_rank_deficient_design():
    counts_df = pd.DataFrame(
        {"gene1": [0, 1], "gene2": [4, 12]}, index=["sample1", "sample2"]
    )
    metadata = pd.DataFrame(
        {"condition": [0, 1], "batch": ["A", "B"]}, index=["sample1", "sample2"]
    )
    with pytest.warns(UserWarning):
        DeseqDataSet(counts=counts_df, metadata=metadata, design="~condition + batch")


def test_equal_num_vars_num_samples_design():
    counts_df = pd.DataFrame(
        {"gene1": [0, 1, 55], "gene2": [4, 12, 60]},
        index=["sample1", "sample2", "sample3"],
    )
    metadata = pd.DataFrame(
        {"condition": [0, 1, 0], "batch": ["A", "B", "B"]},
        index=["sample1", "sample2", "sample3"],
    )
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition + batch", quiet=True
    )
    dds.fit_size_factors()
    with pytest.raises(ValueError):
        dds.fit_genewise_dispersions()


def test_matching_samples():
    counts_df = pd.DataFrame(
        {"gene1": [0, 1, 55], "gene2": [4, 12, 60]},
        index=["sample1", "sample2", "sample3"],
    )
    metadata = pd.DataFrame(
        {"condition": [0, 1, 0]}, index=["sample1", "sample2", "sample3"]
    )
    with pytest.raises(ValueError):
        design_matrix = pd.DataFrame(
            {"intercept": [1.0, 1.0, 1.0], "condition": [0, 1, 0]},
            index=["sample1", "sample2", "sample5"],
        )
        DeseqDataSet(counts=counts_df, metadata=metadata, design=design_matrix)
    with pytest.raises(ValueError):
        design_matrix = pd.DataFrame(
            {"intercept": [1.0, 1.0], "condition": [0, 1]},
            index=["sample1", "sample2"],
        )
        DeseqDataSet(counts=counts_df, metadata=metadata, design=design_matrix)
    with pytest.raises(ValueError):
        design_matrix = pd.DataFrame(
            {"intercept": [1.0, 1.0, 1.0, 1.0], "condition": [0, 1, 0, 0]},
            index=["sample1", "sample2", "sample3", "sample4"],
        )
        DeseqDataSet(counts=counts_df, metadata=metadata, design=design_matrix)


def test_lfc_shrinkage_coeff(counts_df, metadata):
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.deseq2()
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    with pytest.raises(KeyError):
        ds.lfc_shrink(coeff="this_coeff_does_not_exist")


def test_indexes():
    counts_df = pd.DataFrame(
        {"gene1": [0, 1], "gene2": [4, 12]}, index=["sample1", "sample2"]
    )
    metadata = pd.DataFrame({"condition": [0, 1]}, index=["sample01", "sample02"])
    with pytest.raises(ValueError):
        DeseqDataSet(counts=counts_df, metadata=metadata, design="~condition")


def test_contrast(counts_df, metadata):
    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        refit_cooks=False,
        design="~condition + group",
        quiet=True,
    )
    dds.deseq2()

    with pytest.raises((IndexError, ValueError)):
        DeseqStats(dds, contrast=["condition", "B"])
    with pytest.raises(ValueError):
        DeseqStats(dds, contrast=["batch", "Y", "X"])
    with pytest.raises(ValueError):
        DeseqStats(dds, contrast=["condition", "B", "C"])
    with pytest.raises(ValueError):
        DeseqStats(dds, contrast=["condition", "C", "B"])
    with pytest.raises(ValueError):
        DeseqStats(dds, contrast=np.array([0, 0, 0, 1]))


def test_cooks_not_refitted(counts_df, metadata):
    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        refit_cooks=False,
        design="~condition",
        quiet=True,
    )
    dds.deseq2()
    dds.refit_cooks = True
    with pytest.raises(AttributeError):
        ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
        ds.summary()


def test_few_samples(counts_df, metadata):
    samples_to_keep = ["sample1", "sample2", "sample99", "sample100"]
    counts_df = counts_df.loc[samples_to_keep]
    metadata = metadata.loc[samples_to_keep]
    counts_df.iloc[0, 0] = 1000

    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        refit_cooks=True,
        design="~condition",
        quiet=True,
    )
    with pytest.warns(UserWarning):
        dds.deseq2()

    res = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    res.summary()
    assert dds.var["replaced"].sum() == 0


def test_few_samples_and_outlier(counts_df, metadata):
    samples_to_keep = [
        "sample1",
        "sample2",
        "sample92",
        "sample93",
        "sample94",
        "sample95",
        "sample96",
        "sample97",
        "sample98",
        "sample99",
        "sample100",
    ]
    counts_df = counts_df.loc[samples_to_keep]
    metadata = metadata.loc[samples_to_keep]
    counts_df.iloc[0, 0] = 1000
    counts_df.iloc[-1, -1] = 1000

    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        refit_cooks=True,
        design="~condition",
        quiet=True,
    )
    dds.deseq2()
    res = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    res.summary()


def test_new_all_zero_gene(counts_df, metadata):
    metadata = metadata.loc[[f"sample{i}" for i in [*range(1, 11), *range(91, 101)]]]
    counts_df = counts_df.loc[metadata.index].copy()
    counts_df["geneX"] = 0
    counts_df.loc["sample100", "geneX"] = 100

    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        design="~condition",
        refit_cooks=True,
        quiet=True,
    )
    with pytest.warns(UserWarning):
        dds.deseq2()

    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()

    assert dds.new_all_zeroes_genes.equals(pd.Index(["geneX"]))
    assert ds.results_df.loc["geneX", "baseMean"] == 0
    assert ds.results_df.loc["geneX", "log2FoldChange"] == 0
    assert ds.results_df.loc["geneX", "lfcSE"] == 0
    assert ds.results_df.loc["geneX", "stat"] == 0
    assert np.isnan(ds.results_df.loc["geneX", "pvalue"])
    assert np.isnan(ds.results_df.loc["geneX", "padj"])


def test_zero_inflated(counts_df, metadata):
    np.random.seed(42)
    idx = np.random.choice(len(counts_df), counts_df.shape[-1])
    counts_df.iloc[idx, :] = 0

    dds = DeseqDataSet(counts=counts_df, metadata=metadata, quiet=True)
    with pytest.warns(UserWarning):
        dds.deseq2()


def test_plot_MA(counts_df, metadata):
    import matplotlib

    matplotlib.use("Agg")
    dds = DeseqDataSet(counts=counts_df, metadata=metadata, quiet=True)
    dds.deseq2()
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    with pytest.raises(AttributeError):
        ds.plot_MA()
    ds.summary()
    ds.plot_MA()
