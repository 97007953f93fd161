"""Behavioral conformance tests: degenerate inputs, tiny cohorts, refit edges.

The *scenarios* deliberately mirror the reference suite
(owkin/PyDESeq2 tests/test_edge_cases.py) — they pin the behavioral contract
the TPU framework must honor (which inputs raise, which warn, and the exact
NaN/zero semantics of all-zero and refitted genes). The test bodies are this
project's own: shared fixture builders and parametrized tables below.
"""

import numpy as np
import pandas as pd
import pytest

from pydeseq2_tpu import DeseqDataSet, DeseqStats


def _tiny_counts(**genes) -> pd.DataFrame:
    """Counts DataFrame with one row per entry of the first gene column."""
    n = len(next(iter(genes.values())))
    return pd.DataFrame(genes, index=[f"sample{i + 1}" for i in range(n)])


def _tiny_metadata(**factors) -> pd.DataFrame:
    n = len(next(iter(factors.values())))
    return pd.DataFrame(factors, index=[f"sample{i + 1}" for i in range(n)])


def _fitted(counts_df, metadata, **kwargs) -> DeseqDataSet:
    kwargs.setdefault("design", "~condition")
    kwargs.setdefault("quiet", True)
    dds = DeseqDataSet(counts=counts_df, metadata=metadata, **kwargs)
    dds.deseq2()
    return dds


# ------------------------------------------------------------ NaN semantics
def test_zero_genes(counts_df, metadata):
    """Genes with all-zero counts get NaN parameters and NaN statistics."""
    rng = np.random.RandomState(42)
    n_genes = counts_df.shape[1]
    silenced = counts_df.columns[
        rng.choice(n_genes, size=n_genes // 3, replace=False)
    ]
    counts_df[silenced] = 0

    dds = _fitted(counts_df, metadata)
    assert dds.var.loc[silenced, "dispersions"].isna().all()
    assert dds.varm["LFC"].loc[silenced].isna().all().all()

    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    rows = ds.results_df.loc[silenced]
    assert (rows["baseMean"] == 0).all()
    for col in ("log2FoldChange", "lfcSE", "stat", "pvalue", "padj"):
        assert rows[col].isna().all(), f"{col} should be NaN for all-zero genes"


# ------------------------------------------------------- input validation
_BAD_COUNTS = {
    "nan": [0, np.nan],
    "non_numeric": [0, "a"],
    "fractional": [0, 1.5],
    "negative": [0, -1],
}


@pytest.mark.parametrize("kind", sorted(_BAD_COUNTS))
def test_invalid_counts_rejected(kind):
    counts = _tiny_counts(gene1=_BAD_COUNTS[kind], gene2=[4, 12])
    metadata = _tiny_metadata(condition=[0, 1])
    with pytest.raises(ValueError):
        DeseqDataSet(counts=counts, metadata=metadata, design="~condition")


def test_nan_design_factor_rejected():
    counts = _tiny_counts(gene1=[0, 1], gene2=[4, 12])
    metadata = _tiny_metadata(condition=[0, np.nan])
    with pytest.raises(ValueError):
        DeseqDataSet(counts=counts, metadata=metadata, design="~condition")


def test_single_level_factor_warns():
    counts = _tiny_counts(gene1=[0, 1], gene2=[4, 12])
    metadata = _tiny_metadata(condition=[0, 0])
    with pytest.warns(UserWarning):
        DeseqDataSet(counts=counts, metadata=metadata, design="~condition")


def test_rank_deficient_design_warns():
    counts = _tiny_counts(gene1=[0, 1], gene2=[4, 12])
    metadata = _tiny_metadata(condition=[0, 1], batch=["A", "B"])
    with pytest.warns(UserWarning):
        DeseqDataSet(counts=counts, metadata=metadata, design="~condition + batch")


def test_as_many_design_columns_as_samples():
    """n_samples == n_design_columns leaves no residual dof: dispersion
    fitting must refuse."""
    counts = _tiny_counts(gene1=[0, 1, 55], gene2=[4, 12, 60])
    metadata = _tiny_metadata(condition=[0, 1, 0], batch=["A", "B", "B"])
    dds = DeseqDataSet(
        counts=counts, metadata=metadata, design="~condition + batch", quiet=True
    )
    dds.fit_size_factors()
    with pytest.raises(ValueError):
        dds.fit_genewise_dispersions()


@pytest.mark.parametrize(
    "design_index",
    [
        ["sample1", "sample2", "sample5"],  # right length, wrong names
        ["sample1", "sample2"],  # too short
        ["sample1", "sample2", "sample3", "sample4"],  # too long
    ],
)
def test_design_matrix_index_must_match_samples(design_index):
    counts = _tiny_counts(gene1=[0, 1, 55], gene2=[4, 12, 60])
    metadata = _tiny_metadata(condition=[0, 1, 0])
    n = len(design_index)
    design = pd.DataFrame(
        {"intercept": [1.0] * n, "condition": ([0, 1, 0, 0])[:n]},
        index=design_index,
    )
    with pytest.raises(ValueError):
        DeseqDataSet(counts=counts, metadata=metadata, design=design)


def test_counts_metadata_index_mismatch_rejected():
    counts = _tiny_counts(gene1=[0, 1], gene2=[4, 12])
    metadata = pd.DataFrame({"condition": [0, 1]}, index=["sample01", "sample02"])
    with pytest.raises(ValueError):
        DeseqDataSet(counts=counts, metadata=metadata, design="~condition")


# -------------------------------------------------------- stats-layer guards
def test_unknown_shrink_coefficient_rejected(counts_df, metadata):
    dds = _fitted(counts_df, metadata)
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    with pytest.raises(KeyError):
        ds.lfc_shrink(coeff="this_coeff_does_not_exist")


@pytest.mark.parametrize(
    "contrast",
    [
        ["condition", "B"],  # missing the reference level
        ["batch", "Y", "X"],  # unknown factor
        ["condition", "B", "C"],  # unknown reference level
        ["condition", "C", "B"],  # unknown tested level
        np.array([0, 0, 0, 1]),  # wrong vector length
    ],
)
def test_invalid_contrasts_rejected(counts_df, metadata, contrast):
    dds = _fitted(
        counts_df, metadata, refit_cooks=False, design="~condition + group"
    )
    with pytest.raises((IndexError, ValueError)):
        DeseqStats(dds, contrast=contrast)


def test_stats_requires_refit_when_enabled(counts_df, metadata):
    """Flipping refit_cooks on after the fit must be caught by DeseqStats."""
    dds = _fitted(counts_df, metadata, refit_cooks=False)
    dds.refit_cooks = True
    with pytest.raises(AttributeError):
        DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True).summary()


# ---------------------------------------------------- tiny-cohort behavior
def test_few_samples(counts_df, metadata):
    """Cohorts below min_replicates: pipeline runs, nothing is replaced."""
    keep = ["sample1", "sample2", "sample99", "sample100"]
    counts_df = counts_df.loc[keep]
    counts_df.iloc[0, 0] = 1000  # an outlier that must NOT be replaced
    metadata = metadata.loc[keep]

    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        refit_cooks=True,
        design="~condition",
        quiet=True,
    )
    with pytest.warns(UserWarning):
        dds.deseq2()
    DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True).summary()
    assert dds.var["replaced"].sum() == 0


def test_few_samples_and_outlier(counts_df, metadata):
    """One under- and one well-replicated cohort with planted outliers."""
    keep = ["sample1", "sample2"] + [f"sample{i}" for i in range(92, 101)]
    counts_df = counts_df.loc[keep]
    counts_df.iloc[0, 0] = 1000
    counts_df.iloc[-1, -1] = 1000
    metadata = metadata.loc[keep]

    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        refit_cooks=True,
        design="~condition",
        quiet=True,
    )
    dds.deseq2()
    DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True).summary()


def test_new_all_zero_gene(counts_df, metadata):
    """A gene whose only nonzero count is replaced becomes all-zero: LFC, SE
    and stat are zeroed; p-value and padj are NaN."""
    keep = [f"sample{i}" for i in [*range(1, 11), *range(91, 101)]]
    metadata = metadata.loc[keep]
    counts_df = counts_df.loc[keep].copy()
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

    assert list(dds.new_all_zeroes_genes) == ["geneX"]
    row = ds.results_df.loc["geneX"]
    for col in ("baseMean", "log2FoldChange", "lfcSE", "stat"):
        assert row[col] == 0, f"{col} should be zeroed for new-all-zero genes"
    assert np.isnan(row["pvalue"]) and np.isnan(row["padj"])


def test_zero_inflated(counts_df, metadata):
    """Zero-rich data cannot use median-of-ratios: expect the iterative-mode
    switch warning."""
    rng = np.random.RandomState(42)
    rows = rng.choice(len(counts_df), counts_df.shape[-1])
    counts_df.iloc[rows, :] = 0

    dds = DeseqDataSet(counts=counts_df, metadata=metadata, quiet=True)
    with pytest.warns(UserWarning):
        dds.deseq2()


def test_plot_MA(counts_df, metadata):
    import matplotlib

    matplotlib.use("Agg")
    dds = _fitted(counts_df, metadata)
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    with pytest.raises(AttributeError):
        ds.plot_MA()  # before summary() there is nothing to plot
    ds.summary()
    ds.plot_MA()


# ------------------------------------------------------- deprecated kwargs
# Reference behavior: pydeseq2/dds.py:258-286 — the legacy constructor
# kwargs are still accepted with a DeprecationWarning; design_factors also
# rebuilds the design formula.
def test_deprecated_design_factors_builds_formula(counts_df, metadata):
    from pydeseq2_tpu import DeseqDataSet

    with pytest.warns(DeprecationWarning, match="design_factors is deprecated"):
        dds = DeseqDataSet(
            counts=counts_df,
            metadata=metadata,
            design_factors=["group", "condition"],
            quiet=True,
        )
    assert dds.design == "~group + condition"
    ref = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~group + condition",
        quiet=True,
    )
    pd.testing.assert_frame_equal(
        dds.obsm["design_matrix"], ref.obsm["design_matrix"]
    )

    # A bare string is wrapped in a single-factor formula.
    with pytest.warns(DeprecationWarning, match="design_factors is deprecated"):
        dds1 = DeseqDataSet(
            counts=counts_df, metadata=metadata, design_factors="condition",
            quiet=True,
        )
    assert dds1.design == "~condition"


def test_deprecated_ref_level_warns_no_effect(counts_df, metadata):
    from pydeseq2_tpu import DeseqDataSet

    with pytest.warns(DeprecationWarning, match="ref_level is deprecated"):
        dds = DeseqDataSet(
            counts=counts_df,
            metadata=metadata,
            design="~condition",
            ref_level=["condition", "B"],
            quiet=True,
        )
    ref = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    pd.testing.assert_frame_equal(
        dds.obsm["design_matrix"], ref.obsm["design_matrix"]
    )


def test_deprecated_continuous_factors_warns(counts_df, metadata):
    from pydeseq2_tpu import DeseqDataSet

    with pytest.warns(
        DeprecationWarning, match="continuous_factors is deprecated"
    ):
        dds = DeseqDataSet(
            counts=counts_df,
            metadata=metadata,
            design="~condition",
            continuous_factors=["condition"],
            quiet=True,
        )
    assert "design_matrix" in dds.obsm
