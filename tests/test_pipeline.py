"""End-to-end DEA pipeline conformance vs frozen R DESeq2 v1.34.0 outputs.

Mirrors reference tests/test_pydeseq2.py:94-253,434-563,625-758 - the core
golden-file strategy (see SURVEY.md section 4): full pipeline on fixture
data, relative-error tolerance 0.02 (0.04 for multifactor/outlier cases),
identical NaN masks.
"""

import numpy as np
import pandas as pd
import pytest

from pydeseq2_tpu import DeseqDataSet, DeseqStats
from pydeseq2_tpu.formula import DesignMatrix

from conftest import assert_res_almost_equal, data_path


def test_deseq_independent_filtering_parametric_fit(counts_df, metadata, tol=0.02):
    r_res = pd.read_csv(data_path("single_factor", "r_test_res.csv"), index_col=0)
    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        design="~condition",
        fit_type="parametric",
        quiet=True,
    )
    dds.deseq2()
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    assert_res_almost_equal(ds.results_df, r_res, tol)


def test_deseq_independent_filtering_mean_fit(counts_df, metadata, tol=0.02):
    r_res = pd.read_csv(
        data_path("single_factor", "r_test_res_mean_curve.csv"), index_col=0
    )
    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        design="~condition",
        fit_type="mean",
        quiet=True,
    )
    dds.deseq2()
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    assert_res_almost_equal(ds.results_df, r_res, tol)


def test_deseq_without_independent_filtering(counts_df, metadata, tol=0.02):
    r_res = pd.read_csv(
        data_path("single_factor", "r_test_res_no_independent_filtering.csv"),
        index_col=0,
    )
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.deseq2()
    ds = DeseqStats(
        dds, contrast=["condition", "B", "A"], independent_filter=False, quiet=True
    )
    ds.summary()
    assert_res_almost_equal(ds.results_df, r_res, tol)


@pytest.mark.parametrize("alt_hypothesis", ["lessAbs", "greaterAbs", "less", "greater"])
def test_alt_hypothesis(alt_hypothesis, counts_df, metadata, tol=0.02):
    r_res = pd.read_csv(
        data_path("single_factor", f"r_test_res_{alt_hypothesis}.csv"), index_col=0
    )
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.deseq2()
    ds = DeseqStats(
        dds,
        contrast=["condition", "B", "A"],
        lfc_null=-0.5 if alt_hypothesis == "less" else 0.5,
        alt_hypothesis=alt_hypothesis,
        quiet=True,
    )
    ds.summary()

    assert (ds.results_df.pvalue.isna() == r_res.pvalue.isna()).all()
    assert (ds.results_df.padj.isna() == r_res.padj.isna()).all()
    assert (
        abs(r_res.log2FoldChange - ds.results_df.log2FoldChange)
        / abs(r_res.log2FoldChange)
    ).max() < tol
    if alt_hypothesis == "lessAbs":
        ds.results_df.stat = ds.results_df.stat.abs()
    assert (abs(r_res.stat - ds.results_df.stat) / abs(r_res.stat)).max() < tol
    assert (
        abs(
            r_res.pvalue[r_res.stat != 0]
            - ds.results_df.pvalue[ds.results_df.stat != 0]
        )
        / r_res.pvalue[r_res.stat != 0]
    ).max() < tol


def test_deseq_no_refit_cooks(counts_df, metadata, tol=0.02):
    r_res = pd.read_csv(data_path("single_factor", "r_test_res.csv"), index_col=0)
    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        design="~condition",
        refit_cooks=False,
        quiet=True,
    )
    dds.deseq2()
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    assert_res_almost_equal(ds.results_df, r_res, tol)


@pytest.mark.parametrize("with_outliers", [True, False])
def test_multifactor_deseq(counts_df, metadata, with_outliers, tol=0.04):
    name = "r_test_res_outliers.csv" if with_outliers else "r_test_res.csv"
    r_res = pd.read_csv(data_path("multi_factor", name), index_col=0)

    if with_outliers:
        counts_df.loc["sample1", "gene1"] = 2000
        counts_df.loc["sample11", "gene7"] = 1000
        metadata.loc["sample1", "condition"] = "C"

    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~group + condition", quiet=True
    )
    dds.deseq2()
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    assert_res_almost_equal(ds.results_df, r_res, tol)


@pytest.mark.parametrize("with_outliers", [True, False])
def test_continuous_deseq(with_outliers, tol=0.04):
    counts_df = pd.read_csv(data_path("continuous", "test_counts.csv"), index_col=0).T
    metadata = pd.read_csv(data_path("continuous", "test_metadata.csv"), index_col=0)
    name = "r_test_res_outliers.csv" if with_outliers else "r_test_res.csv"
    r_res = pd.read_csv(data_path("continuous", name), index_col=0)

    if with_outliers:
        counts_df.loc["sample1", "gene1"] = 2000
        counts_df.loc["sample11", "gene7"] = 1000
        metadata.loc["sample1", "condition"] = "C"

    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        design="~group + condition + measurement",
        quiet=True,
    )
    dds.deseq2()

    contrast_vector = np.zeros(dds.obsm["design_matrix"].shape[1])
    contrast_vector[-1] = 1
    ds = DeseqStats(dds, contrast=contrast_vector, quiet=True)
    ds.summary()
    assert_res_almost_equal(ds.results_df, r_res, tol)


@pytest.mark.parametrize("low_memory", [True, False])
def test_wide_deseq(low_memory, tol=0.02):
    counts_df = pd.read_csv(data_path("wide", "test_counts.csv"), index_col=0).T
    metadata = pd.read_csv(data_path("wide", "test_metadata.csv"), index_col=0)
    r_res = pd.read_csv(data_path("wide", "r_test_res.csv"), index_col=0)

    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        design="~group + condition",
        low_memory=low_memory,
        quiet=True,
    )
    dds.deseq2()
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    assert_res_almost_equal(ds.results_df, r_res, tol)


def test_contrast_antisymmetry(counts_df, metadata):
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~group + condition", quiet=True
    )
    dds.deseq2()
    res_B_vs_A = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    res_A_vs_B = DeseqStats(dds, contrast=["condition", "A", "B"], quiet=True)
    res_B_vs_A.summary()
    res_A_vs_B.summary()

    for col in res_B_vs_A.results_df.columns:
        np.testing.assert_array_almost_equal(
            res_B_vs_A.results_df[col].abs().values,
            res_A_vs_B.results_df[col].abs().values,
            decimal=8,
        )
    np.testing.assert_array_almost_equal(
        res_B_vs_A.results_df.log2FoldChange.values,
        -res_A_vs_B.results_df.log2FoldChange.values,
        decimal=8,
    )
    np.testing.assert_array_almost_equal(
        res_B_vs_A.results_df.stat.values,
        -res_A_vs_B.results_df.stat.values,
        decimal=8,
    )


def test_anndata_init(counts_df, metadata, tol=0.02):
    # Real anndata when installed (CI installs .[anndata]); otherwise the
    # in-repo duck-typed double, so the adata= adapter path always executes.
    try:
        import anndata as ad
    except ImportError:
        import fake_anndata as ad
    np.random.seed(42)
    adata = ad.AnnData(X=counts_df.astype(int), obs=metadata)
    adata.obsm["dummy_metadata"] = np.random.choice(2, adata.n_obs)
    adata.var["dummy_param"] = np.random.randn(adata.n_vars)
    adata.var["dispersions"] = np.random.randn(adata.n_vars) ** 2

    r_res = pd.read_csv(data_path("single_factor", "r_test_res.csv"), index_col=0)
    dds = DeseqDataSet(adata=adata, design="~condition", quiet=True)
    dds.deseq2()
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    assert_res_almost_equal(ds.results_df, r_res, tol)


def test_design_matrix_init(counts_df, metadata, tol=0.02):
    r_res = pd.read_csv(data_path("single_factor", "r_test_res.csv"), index_col=0)
    design_matrix = DesignMatrix(metadata, "~condition").matrix.copy()
    design_matrix.rename(columns={"condition[T.B]": "condition_B"}, inplace=True)

    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design=design_matrix, quiet=True
    )
    dds.deseq2()
    ds = DeseqStats(dds, contrast=np.array([0, 1]), quiet=True)
    ds.summary()
    assert_res_almost_equal(ds.results_df, r_res, tol)


def test_convergence_flags_parity(counts_df, metadata):
    """Optimizer-convergence diagnostics match reference semantics.

    The reference stores per-gene scipy L-BFGS-B ``res.success`` as
    ``_genewise_converged``/``_MAP_converged`` and the IRLS flag as
    ``_LFC_converged``, NaN on all-zero genes (reference
    pydeseq2/dds.py:796-797,922-923,983-984). On the synthetic fixture every
    non-zero gene converges in the reference; a vacuous always-True criterion
    would also pass here, so additionally pin that the criterion is REAL:
    a solver capped at zero polish iterations on a handful of lanes must not
    report spurious non-convergence on the fixture's well-behaved genes
    (grid+Newton criterion = projected Newton decrement, not isfinite).
    """
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.deseq2()

    zero = ~dds.var["non_zero"].values
    for col in ("_genewise_converged", "_MAP_converged", "_LFC_converged"):
        flags = dds.var[col].values
        assert np.isnan(flags[zero]).all(), col
        assert (flags[~zero] == 1.0).all(), col

    # The criterion itself: a point far from the optimum (grid+polish
    # disabled, started at max_disp) must NOT be reported converged.
    import jax.numpy as jnp

    from pydeseq2_tpu.ops.dispersion import alpha_mle_batch

    nz = dds.var["non_zero"].values
    counts_nz = jnp.asarray(dds.X[:, nz].T, jnp.float64)
    design = jnp.asarray(dds.obsm["design_matrix"].values, jnp.float64)
    mu = jnp.asarray(dds.layers["_mu_hat"][:, nz].T, jnp.float64)
    alpha_hat = jnp.asarray(dds.var.loc[nz, "_MoM_dispersions"].values)
    _, conv = alpha_mle_batch(
        counts_nz,
        design,
        mu,
        alpha_hat,
        min_disp=dds.min_disp,
        max_disp=dds.max_disp,
        grid_length=2,
        fine_length=2,
        newton_iters=0,
    )
    assert not bool(np.asarray(conv).all())


def test_prior_lfc_var_ridge(counts_df, metadata):
    """DeseqStats(prior_LFC_var=...) swaps the Wald ridge from 1e-6*I to
    diag(1/prior_var^2) (reference pydeseq2/ds.py:327-331): a large prior
    variance reproduces the default (tiny ridge) closely, a small one
    shrinks the statistics toward the null.
    """
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition",
        refit_cooks=False, quiet=True,
    )
    dds.deseq2()

    ds_default = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds_default.summary()

    # diag(1/v^2) with huge v ~ the default 1e-6 ridge
    ds_wide = DeseqStats(
        dds, contrast=["condition", "B", "A"], quiet=True,
        prior_LFC_var=np.array([1e3, 1e3]),
    )
    ds_wide.summary()
    np.testing.assert_allclose(
        ds_wide.results_df["stat"].values,
        ds_default.results_df["stat"].values,
        rtol=1e-4, equal_nan=True,
    )

    # a tight prior = a LARGE ridge diag(1/v^2): H = (M + ridge)^-1
    # shrinks, so the sandwich SE sqrt(c' H M H c) shrinks and |stat|
    # grows (reference utils.py:718-811 semantics).
    ds_tight = DeseqStats(
        dds, contrast=["condition", "B", "A"], quiet=True,
        prior_LFC_var=np.array([0.5, 0.5]),
    )
    ds_tight.summary()
    d = ds_default.results_df["stat"].abs().dropna()
    t = ds_tight.results_df["stat"].abs().dropna()
    assert (t >= d - 1e-12).all()
    assert (t > d + 1e-6).any()
