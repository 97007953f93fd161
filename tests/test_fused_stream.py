"""Gene-streamed fused pipeline vs the monolithic fused program.

`fused_stream.summary_pipeline_streamed` re-expresses the one-program
analysis as bounded-memory gene-block passes; since every global reduction
(size factors, trend, prior, BH sweep) is exact, its outputs must match the
monolithic `fused.summary_pipeline` to roundoff — and therefore the staged
driver (R-golden-tested) at the usual tolerance. gene_block=4 on the
10-gene fixture forces 3 blocks incl. a padded one, exercising the
block/pad machinery.
"""

import jax.numpy as jnp
import numpy as np

from pydeseq2_tpu import DeseqDataSet, DeseqStats
from pydeseq2_tpu.fused import summary_host_inputs, summary_pipeline
from pydeseq2_tpu.fused_stream import run_summary_streamed


def _staged(counts_df, metadata, design, contrast):
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design=design,
        refit_cooks=False, quiet=True,
    )
    dds.deseq2()
    ds = DeseqStats(dds, contrast=contrast, quiet=True)
    ds.summary()
    return dds, ds


def _monolithic(counts_df, dds, contrast_vec, **kwargs):
    host = summary_host_inputs(dds.obsm["design_matrix"])
    return summary_pipeline(
        jnp.asarray(counts_df.values.T.astype(float)),
        jnp.asarray(dds.obsm["design_matrix"].values),
        jnp.asarray(np.asarray(contrast_vec, float)),
        jnp.asarray(0.0),
        jnp.asarray(host["cooks_cutoff"]),
        cohort_ids=host["cohort_ids"],
        use_for_max=host["use_for_max"],
        max_disp=float(max(10, counts_df.shape[0])),
        **kwargs,
    )


def test_streamed_matches_monolithic(counts_df, metadata):
    dds, _ = _staged(counts_df, metadata, "~condition", ["condition", "B", "A"])
    mono = _monolithic(counts_df, dds, [0.0, 1.0])
    stream = run_summary_streamed(
        counts_df.values.T,
        dds.obsm["design_matrix"],
        [0.0, 1.0],
        gene_block=4,
        dtype=np.float64,
        max_disp=float(max(10, counts_df.shape[0])),
    )
    for key in (
        "size_factors",
        "genewise_dispersions",
        "dispersions",
        "lfc",
        "p_values",
        "statistics",
        "se",
        "padj",
    ):
        np.testing.assert_allclose(
            stream[key], np.asarray(mono[key]), rtol=1e-6, equal_nan=True,
            err_msg=key,
        )
    np.testing.assert_array_equal(
        stream["cooks_outlier"], np.asarray(mono["cooks_outlier"])
    )


def test_streamed_matches_staged_summary(counts_df, metadata):
    dds, ds = _staged(counts_df, metadata, "~condition", ["condition", "B", "A"])
    stream = run_summary_streamed(
        counts_df.values.T,
        dds.obsm["design_matrix"],
        [0.0, 1.0],
        gene_block=4,
        dtype=np.float64,
        max_disp=float(max(10, counts_df.shape[0])),
    )
    np.testing.assert_allclose(
        stream["p_values"], ds.p_values.values, rtol=5e-3, equal_nan=True
    )
    np.testing.assert_allclose(
        stream["padj"], ds.padj.values, rtol=5e-3, equal_nan=True
    )


def test_streamed_multifactor_irls_init(counts_df, metadata):
    counts = counts_df.copy()
    counts.iloc[0, 0] = int(counts.values.max() * 10 + 100)

    dds, _ = _staged(
        counts, metadata, "~group + condition", ["condition", "B", "A"]
    )
    contrast = np.asarray(
        dds.contrast(column="condition", baseline="A", group_to_compare="B"),
        float,
    )
    mono = _monolithic(counts, dds, contrast, mu_init="irls")
    stream = run_summary_streamed(
        counts.values.T,
        dds.obsm["design_matrix"],
        contrast,
        gene_block=4,
        dtype=np.float64,
        mu_init="irls",
        max_disp=float(max(10, counts.shape[0])),
    )
    np.testing.assert_allclose(
        stream["padj"], np.asarray(mono["padj"]), rtol=1e-6, equal_nan=True
    )
    np.testing.assert_array_equal(
        stream["cooks_outlier"], np.asarray(mono["cooks_outlier"])
    )


def test_streamed_wald_only_surface(counts_df, metadata):
    dds, _ = _staged(counts_df, metadata, "~condition", ["condition", "B", "A"])
    out = run_summary_streamed(
        counts_df.values.T,
        dds.obsm["design_matrix"],
        [0.0, 1.0],
        gene_block=4,
        dtype=np.float64,
        stats_layer=False,
        max_disp=float(max(10, counts_df.shape[0])),
    )
    assert "padj" not in out and "cooks_outlier" not in out
    assert np.isfinite(out["p_values"]).all()


def test_streamed_sample_blocked_size_factors(counts_df, metadata):
    """Sample-blocked median-of-ratios equals the monolithic sort.

    At atlas scale (10k samples x 60k genes) the full (G, N) ratio matrix +
    sort scratch exceeds a 16 GB chip; sample_block streams column blocks
    through one mapped sort with identical ranks, so the size factors — and
    everything downstream — must be bit-comparable.
    """
    dds, _ = _staged(counts_df, metadata, "~condition", ["condition", "B", "A"])
    base = run_summary_streamed(
        counts_df.values.T,
        dds.obsm["design_matrix"],
        [0.0, 1.0],
        gene_block=4,
        dtype=np.float64,
        max_disp=float(max(10, counts_df.shape[0])),
    )
    blocked = run_summary_streamed(
        counts_df.values.T,
        dds.obsm["design_matrix"],
        [0.0, 1.0],
        gene_block=4,
        sample_block=20,  # 100 samples -> 5 column blocks
        dtype=np.float64,
        max_disp=float(max(10, counts_df.shape[0])),
    )
    np.testing.assert_allclose(
        blocked["size_factors"], base["size_factors"], rtol=0, atol=0
    )
    np.testing.assert_allclose(
        blocked["padj"], base["padj"], rtol=1e-12, equal_nan=True
    )


def test_streamed_zero_inflated_switches_to_iterative():
    """Zero-inflated data (a zero in every gene) falls back to the device
    iterative size-factor solver with the reference's warning, and the
    analysis completes (reference ratio -> iterative switch,
    pydeseq2/dds.py:682-690; device solver
    ops/sizefactors.py::iterative_size_factors)."""
    import pytest

    rng = np.random.default_rng(0)
    counts = rng.poisson(20.0, (24, 12)).astype(float)
    # One zero per gene, scattered across samples (no all-zero sample —
    # a sample with no positive counts has no definable size factor in the
    # reference either).
    counts[np.arange(24), np.arange(24) % 12] = 0.0
    X = np.column_stack([np.ones(12), rng.integers(0, 2, 12)]).astype(float)
    with pytest.warns(UserWarning, match="Switching to iterative mode"):
        out = run_summary_streamed(
            counts, X, [0.0, 1.0], gene_block=8, dtype=np.float64
        )
    assert np.isfinite(out["size_factors"]).all()
    assert np.isfinite(out["p_values"]).sum() > 0


def test_streamed_poscounts_matches_staged(counts_df, metadata):
    """In-stream poscounts size factors == the staged device sort kernel.

    The whole downstream analysis must then match a staged-injected run
    (reference poscounts estimator: pydeseq2/dds.py:656-679).
    """
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.fit_size_factors(fit_type="poscounts")
    sf_staged = dds.obs["size_factors"].values

    out = run_summary_streamed(
        counts_df.values.T,
        dds.obsm["design_matrix"],
        [0.0, 1.0],
        gene_block=4,
        dtype=np.float64,
        sf_fit_type="poscounts",
        max_disp=float(max(10, counts_df.shape[0])),
    )
    np.testing.assert_allclose(out["size_factors"], sf_staged, rtol=1e-12)

    injected = run_summary_streamed(
        counts_df.values.T,
        dds.obsm["design_matrix"],
        [0.0, 1.0],
        gene_block=4,
        dtype=np.float64,
        size_factors=sf_staged,
        max_disp=float(max(10, counts_df.shape[0])),
    )
    np.testing.assert_allclose(
        out["padj"], injected["padj"], rtol=1e-10, equal_nan=True
    )


def test_iterative_size_factors_device_matches_golden(counts_df, metadata):
    """The batched per-sample Newton solver reproduces the R golden.

    Same <2% bar as the Powell path (reference dds.py:1460-1548); this is
    the optimizer the iterative mode uses beyond ~500 samples, where an
    N-dimensional Powell search is intractable.
    """
    import pandas as pd

    from conftest import data_path

    r_sf = pd.read_csv(
        data_path("single_factor", "r_iterative_size_factors.csv"), index_col=0
    ).squeeze()
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds._fit_iterate_size_factors(method="device")
    rel = (
        np.abs(r_sf.values - dds.obs["size_factors"].values) / np.abs(r_sf.values)
    ).max()
    assert rel < 0.02, rel


def test_streamed_injected_size_factors(counts_df, metadata):
    """size_factors= overrides the in-program median-of-ratios computation.

    Injecting the staged layer's poscounts size factors must reproduce a
    staged poscounts analysis through the streamed path (the route for
    zero-rich data at scale).
    """
    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        design="~condition",
        size_factors_fit_type="poscounts",
        refit_cooks=False,
        quiet=True,
    )
    dds.deseq2()
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()

    out = run_summary_streamed(
        counts_df.values.T,
        dds.obsm["design_matrix"],
        [0.0, 1.0],
        gene_block=4,
        dtype=np.float64,
        size_factors=dds.obs["size_factors"].values,
        max_disp=float(max(10, counts_df.shape[0])),
    )
    np.testing.assert_allclose(
        out["size_factors"], dds.obs["size_factors"].values, rtol=1e-12
    )
    np.testing.assert_allclose(
        out["p_values"], ds.p_values.values, rtol=5e-3, equal_nan=True
    )


# ---------------------------------------------------------------- refit_cooks
def _staged_refit(counts_df, metadata, design, contrast):
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design=design,
        refit_cooks=True, quiet=True,
    )
    dds.deseq2()
    ds = DeseqStats(dds, contrast=contrast, quiet=True)
    ds.summary()
    return dds, ds


def _assert_refit_matches_staged(stream, dds, ds, contrast_vec):
    ln2 = np.log(2.0)
    np.testing.assert_array_equal(stream["replaced"], dds.var["replaced"].values)
    np.testing.assert_array_equal(stream["refitted"], dds.var["refitted"].values)
    np.testing.assert_allclose(
        stream["lfc"] @ np.asarray(contrast_vec, float) / ln2,
        ds.results_df["log2FoldChange"].values, rtol=1e-5, equal_nan=True,
    )
    for key, col in (
        ("p_values", "pvalue"), ("statistics", "stat"), ("padj", "padj"),
        ("base_mean", "baseMean"),
    ):
        np.testing.assert_allclose(
            stream[key], ds.results_df[col].values, rtol=1e-5, equal_nan=True,
            err_msg=key,
        )
    np.testing.assert_allclose(
        stream["se"] / ln2, ds.results_df["lfcSE"].values, rtol=1e-5,
        equal_nan=True,
    )


def test_streamed_refit_matches_staged(counts_df, metadata):
    """refit_cooks=True through the streamed path == the staged refit.

    Injected outliers force actual replacement + refitting (reference
    default pipeline semantics, pydeseq2/dds.py:1042-1064,1301-1458).
    """
    counts = counts_df.copy()
    counts.iloc[0, 0] = 1_000_000
    counts.iloc[5, 3] = 500_000
    dds, ds = _staged_refit(counts, metadata, "~condition", ["condition", "B", "A"])
    assert dds.var["refitted"].sum() > 0  # the scenario must actually refit

    stream = run_summary_streamed(
        counts.values.T,
        dds.obsm["design_matrix"],
        [0.0, 1.0],
        gene_block=4,
        dtype=np.float64,
        refit_cooks=True,
        max_disp=float(max(10, counts.shape[0])),
    )
    _assert_refit_matches_staged(stream, dds, ds, [0.0, 1.0])


def test_streamed_refit_new_all_zero(counts_df, metadata):
    """A gene whose replacement zeroes every count gets neutral statistics.

    Reference semantics: dds.py:1373-1384 (dropped from the refit, means
    and LFC zeroed) + ds.py:356-360 (se/stat 0, pvalue 1 before masking).
    """
    counts = counts_df.copy()
    counts.iloc[:, 2] = 0
    counts.iloc[7, 2] = 1_000_000
    dds, ds = _staged_refit(counts, metadata, "~condition", ["condition", "B", "A"])
    assert len(dds.new_all_zeroes_genes) == 1

    stream = run_summary_streamed(
        counts.values.T,
        dds.obsm["design_matrix"],
        [0.0, 1.0],
        gene_block=4,
        dtype=np.float64,
        refit_cooks=True,
        max_disp=float(max(10, counts.shape[0])),
    )
    assert int(stream["new_all_zeroes"].sum()) == 1
    _assert_refit_matches_staged(stream, dds, ds, [0.0, 1.0])


def test_streamed_refit_multifactor_golden(counts_df, metadata):
    """Multifactor outlier R golden (tol 0.04) through the streamed refit.

    The R-checked scenario of reference tests/test_pydeseq2.py:434-509 —
    this pins the streamed cohort-dependent Cook's flagging and the full
    replacement/refit flow against R DESeq2 v1.34.0, not just against the
    staged implementation.
    """
    import pandas as pd

    from conftest import data_path

    r_res = pd.read_csv(
        data_path("multi_factor", "r_test_res_outliers.csv"), index_col=0
    )
    counts_df.loc["sample1", "gene1"] = 2000
    counts_df.loc["sample11", "gene7"] = 1000
    metadata.loc["sample1", "condition"] = "C"

    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~group + condition",
        quiet=True,
    )
    cvec = np.asarray(
        dds.contrast(column="condition", baseline="A", group_to_compare="B"),
        float,
    )
    stream = run_summary_streamed(
        counts_df.values.T.astype(float),
        dds.obsm["design_matrix"],
        cvec,
        gene_block=4,
        dtype=np.float64,
        refit_cooks=True,
        max_disp=float(max(10, counts_df.shape[0])),
    )
    assert int(stream["refitted"].sum()) > 0
    l2fc = stream["lfc"] @ cvec / np.log(2.0)
    for col, got in (
        ("log2FoldChange", l2fc),
        ("pvalue", stream["p_values"]),
        ("padj", stream["padj"]),
    ):
        r = r_res[col].values
        assert np.array_equal(np.isnan(r), np.isnan(got)), col
        assert np.nanmax(np.abs(r - got) / np.abs(r)) < 0.04, col


def test_streamed_refit_no_replaceable_cohort(counts_df, metadata):
    """No cohort >= min_replicates -> refit is a no-op with empty flags.

    Reference dds.py:1315-1320: when no sample is replaceable the pipeline
    behaves like refit_cooks=False apart from the bookkeeping columns.
    """
    dds, ds = _staged(counts_df, metadata, "~condition", ["condition", "B", "A"])
    stream = run_summary_streamed(
        counts_df.values.T,
        dds.obsm["design_matrix"],
        [0.0, 1.0],
        gene_block=4,
        dtype=np.float64,
        refit_cooks=True,
        min_replicates=1_000,  # nothing qualifies
        max_disp=float(max(10, counts_df.shape[0])),
    )
    assert not stream["replaced"].any()
    assert not stream["refitted"].any()
    np.testing.assert_allclose(
        stream["padj"], ds.padj.values, rtol=5e-3, equal_nan=True
    )


# ------------------------------------------------------- streamed shrink + VST
def test_streamed_vst_matches_fused(counts_df):
    """Blocked blind VST == the monolithic fused program to roundoff."""
    import jax.numpy as jnp

    from pydeseq2_tpu.fused import vst_pipeline
    from pydeseq2_tpu.fused_stream import run_vst_streamed

    cT = counts_df.values.T.astype(float)
    mono = vst_pipeline(jnp.asarray(cT), max_disp=float(max(10, counts_df.shape[0])))
    stream = run_vst_streamed(
        cT, gene_block=4, dtype=np.float64,
        max_disp=float(max(10, counts_df.shape[0])),
    )
    np.testing.assert_allclose(
        stream["vst_counts"], np.asarray(mono["vst_counts"]), rtol=1e-6,
        equal_nan=True,
    )
    np.testing.assert_allclose(
        stream["size_factors"], np.asarray(mono["size_factors"]), rtol=1e-12
    )


def test_streamed_lfc_shrink_matches_staged(counts_df, metadata):
    """Blocked apeGLM shrinkage == DeseqStats.lfc_shrink (same prior fit)."""
    from pydeseq2_tpu.fused_stream import run_lfc_shrink_streamed

    dds, ds = _staged(counts_df, metadata, "~condition", ["condition", "B", "A"])
    coeff = "condition[T.B]"
    ci = int(ds.LFC.columns.get_loc(coeff))
    mle_lfc = ds.LFC.values[:, ci].copy()
    mle_se = ds.SE.values.copy()
    ds.lfc_shrink(coeff)

    out = run_lfc_shrink_streamed(
        counts_df.values.T.astype(float),
        dds.obsm["design_matrix"],
        ci,
        dds.var["dispersions"].values,
        dds.obs["size_factors"].values,
        mle_lfc=mle_lfc,
        mle_se=mle_se,
        gene_block=4,
        dtype=np.float64,
    )
    np.testing.assert_allclose(
        out["lfc"][:, ci], ds.LFC[coeff].values, rtol=1e-4, equal_nan=True
    )
    np.testing.assert_allclose(
        out["se"], ds.SE.values, rtol=1e-4, equal_nan=True
    )


def test_streamed_continuous_golden():
    """Continuous-covariate R golden (tol 0.04) through the streamed path.

    Mirrors the reference continuous scenario (tests/test_pydeseq2.py:
    560-622) with refit_cooks=True — the design resolves mu_init='irls', so
    this pins the streamed per-block IRLS mu initialization and the
    refit-mode bookkeeping on a non-categorical design against R DESeq2.
    """
    import pandas as pd

    from conftest import data_path

    counts_df = pd.read_csv(
        data_path("continuous", "test_counts.csv"), index_col=0
    ).T
    metadata = pd.read_csv(
        data_path("continuous", "test_metadata.csv"), index_col=0
    )
    r_res = pd.read_csv(data_path("continuous", "r_test_res.csv"), index_col=0)

    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        design="~group + condition + measurement",
        quiet=True,
    )
    cvec = np.zeros(dds.obsm["design_matrix"].shape[1])
    cvec[-1] = 1.0
    stream = run_summary_streamed(
        counts_df.values.T.astype(float),
        dds.obsm["design_matrix"],
        cvec,
        gene_block=4,
        dtype=np.float64,
        refit_cooks=True,
        max_disp=float(max(10, counts_df.shape[0])),
    )
    l2fc = stream["lfc"] @ cvec / np.log(2.0)
    for col, got in (
        ("log2FoldChange", l2fc),
        ("pvalue", stream["p_values"]),
        ("padj", stream["padj"]),
    ):
        r = r_res[col].values
        assert np.array_equal(np.isnan(r), np.isnan(got)), col
        assert np.nanmax(np.abs(r - got) / np.abs(r)) < 0.04, col


def test_streamed_n_genes_padded_matches_unpadded(counts_df, metadata):
    """Pre-padded counts + n_genes == the unpadded run, for all three
    streamed wrappers.

    The pad lanes must stay out of every global reduction (size-factor
    medians, trend, prior MAD, independent-filtering quantiles) — treating
    them as real all-zero genes would shift the base-mean quantile cutoffs
    for REAL genes.
    """
    import pytest

    from pydeseq2_tpu.fused_stream import (
        run_lfc_shrink_streamed,
        run_summary_streamed,
        run_vst_streamed,
    )

    dds, ds = _staged(counts_df, metadata, "~condition", ["condition", "B", "A"])
    counts_gm = counts_df.values.T.astype(float)
    G = counts_gm.shape[0]
    padded = np.pad(counts_gm, ((0, 6), (0, 0)))  # 6 dead all-zero lanes

    kw = dict(gene_block=4, dtype=np.float64, max_disp=float(max(10, counts_df.shape[0])))
    base = run_summary_streamed(counts_gm, dds.obsm["design_matrix"], [0.0, 1.0], **kw)
    pad_run = run_summary_streamed(
        padded, dds.obsm["design_matrix"], [0.0, 1.0], n_genes=G, **kw
    )
    for key in ("p_values", "padj", "dispersions", "base_mean", "size_factors"):
        np.testing.assert_array_equal(
            np.asarray(pad_run[key]), np.asarray(base[key]), err_msg=key
        )
    assert pad_run["p_values"].shape[0] == G

    # Without n_genes the pad lanes WOULD be real all-zero genes — the padj
    # column must then differ in length (sanity that the knob is load-bearing).
    naive = run_summary_streamed(padded, dds.obsm["design_matrix"], [0.0, 1.0], **kw)
    assert naive["p_values"].shape[0] == G + 6

    ci = 1
    sh_base = run_lfc_shrink_streamed(
        counts_gm, dds.obsm["design_matrix"], ci,
        dds.var["dispersions"].values, dds.obs["size_factors"].values,
        adapt=False, gene_block=4, dtype=np.float64,
    )
    sh_pad = run_lfc_shrink_streamed(
        padded, dds.obsm["design_matrix"], ci,
        dds.var["dispersions"].values, dds.obs["size_factors"].values,
        adapt=False, gene_block=4, dtype=np.float64, n_genes=G,
    )
    np.testing.assert_array_equal(
        np.asarray(sh_pad["lfc"]), np.asarray(sh_base["lfc"])
    )

    vst_base = run_vst_streamed(counts_gm, gene_block=4, dtype=np.float64)
    vst_pad = run_vst_streamed(padded, gene_block=4, dtype=np.float64, n_genes=G)
    np.testing.assert_array_equal(
        np.asarray(vst_pad["vst_counts"]), np.asarray(vst_base["vst_counts"])
    )

    with pytest.raises(ValueError, match="n_genes"):
        run_summary_streamed(
            padded, dds.obsm["design_matrix"], [0.0, 1.0], n_genes=G + 99, **kw
        )
