"""Fused counts->padj program vs the stage-by-stage driver.

`fused.summary_pipeline` runs the entire DeseqDataSet.deseq2() +
DeseqStats.summary() workflow (refit_cooks=False semantics) as one jit
program; these tests pin it to the staged model layer — which is itself
golden-tested against R DESeq2 v1.34.0 — on the synthetic dataset, for both
filtering modes and for a multifactor design with Cook's outliers.
"""

import jax.numpy as jnp
import numpy as np

from pydeseq2_tpu import DeseqDataSet, DeseqStats
from pydeseq2_tpu.fused import summary_host_inputs, summary_pipeline


def _staged(counts_df, metadata, design, contrast, **stats_kwargs):
    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        design=design,
        refit_cooks=False,
        quiet=True,
    )
    dds.deseq2()
    ds = DeseqStats(dds, contrast=contrast, quiet=True, **stats_kwargs)
    ds.summary()
    return dds, ds


def _fused(counts_df, dds, contrast_vec, **kwargs):
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


def test_summary_pipeline_single_factor(counts_df, metadata):
    dds, ds = _staged(
        counts_df, metadata, "~condition", ["condition", "B", "A"],
        cooks_filter=True, independent_filter=True,
    )
    out = _fused(counts_df, dds, [0.0, 1.0])

    np.testing.assert_array_equal(
        np.isnan(np.asarray(out["p_values"])), ds.p_values.isna().values
    )
    np.testing.assert_allclose(
        np.asarray(out["p_values"]),
        ds.p_values.values,
        rtol=5e-3,
        equal_nan=True,
    )
    np.testing.assert_array_equal(
        np.isnan(np.asarray(out["padj"])), ds.padj.isna().values
    )
    np.testing.assert_allclose(
        np.asarray(out["padj"]), ds.padj.values, rtol=5e-3, equal_nan=True
    )
    # Cook's distances match the staged layer (reference dds.py:986-1040).
    staged_cooks = dds.layers["cooks"].T  # staged is sample-major
    np.testing.assert_allclose(
        np.asarray(out["cooks"]), staged_cooks, rtol=1e-4, equal_nan=True
    )


def test_summary_pipeline_plain_bh(counts_df, metadata):
    dds, ds = _staged(
        counts_df, metadata, "~condition", ["condition", "B", "A"],
        cooks_filter=True, independent_filter=False,
    )
    out = _fused(counts_df, dds, [0.0, 1.0], independent_filter=False)
    np.testing.assert_allclose(
        np.asarray(out["padj"]), ds.padj.values, rtol=5e-3, equal_nan=True
    )


def test_summary_pipeline_multifactor_outliers(counts_df, metadata):
    # Inject synthetic outliers so the Cook's masking path actually fires
    # (mirrors reference tests/test_pydeseq2.py:434-509's setup).
    counts = counts_df.copy()
    counts.iloc[0, 0] = int(counts.values.max() * 10 + 100)
    counts.iloc[5, 3] = int(counts.values.max() * 8 + 50)

    dds, ds = _staged(
        counts, metadata, "~group + condition", ["condition", "B", "A"],
        cooks_filter=True, independent_filter=True,
    )
    contrast = np.asarray(
        dds.contrast(column="condition", baseline="A", group_to_compare="B"),
        float,
    )
    out = _fused(counts, dds, contrast, mu_init="irls")

    staged_outlier = dds.cooks_outlier().values
    assert staged_outlier.any(), "fixture should produce at least one outlier"
    np.testing.assert_array_equal(np.asarray(out["cooks_outlier"]), staged_outlier)
    np.testing.assert_allclose(
        np.asarray(out["padj"]), ds.padj.values, rtol=5e-3, equal_nan=True
    )


def test_fused_trend_mean_fallback_matches_staged():
    """When the parametric trend degenerates, the fused program must switch
    to the mean trend IN-PROGRAM exactly where the staged driver does
    (reference pydeseq2/dds.py:1243-1252).

    Fixture: dispersion *increasing* with mean — the gamma-GLM slope a1 is
    pushed to its 1e-12 bound, which the staged loop treats as
    non-convergence.
    """
    import pandas as pd
    import pytest

    rng = np.random.RandomState(0)
    n, g = 60, 120
    means = np.geomspace(5, 2000, g)
    alphas = 0.01 + means / 4000.0
    cond = np.array(["A", "B"] * (n // 2))
    counts = np.zeros((n, g), int)
    for j in range(g):
        mu = means[j] * (1.0 + 0.3 * (cond == "B"))
        r = 1.0 / alphas[j]
        counts[:, j] = rng.negative_binomial(r, r / (r + mu))
    counts_df = pd.DataFrame(
        counts,
        index=[f"s{i}" for i in range(n)],
        columns=[f"g{j}" for j in range(g)],
    )
    metadata = pd.DataFrame({"condition": cond}, index=counts_df.index)

    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition",
        refit_cooks=False, quiet=True,
    )
    with pytest.warns(UserWarning, match="mean-based dispersion trend"):
        dds.deseq2()
    assert dds.uns["disp_function_type"] == "mean"

    out = _fused(counts_df, dds, [0.0, 1.0])
    assert bool(out["trend_used_mean"]), "fused trend must also fall back"
    np.testing.assert_allclose(
        np.asarray(out["fitted_dispersions"]),
        dds.var["fitted_dispersions"].values,
        rtol=5e-3,
        equal_nan=True,
    )
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    np.testing.assert_allclose(
        np.asarray(out["padj"]), ds.padj.values, rtol=5e-3, equal_nan=True
    )


def test_summary_pipeline_gene_mask_padding(counts_df, metadata):
    """Padding lanes (shard-even sizes) must not perturb any global statistic."""
    dds, _ = _staged(
        counts_df, metadata, "~condition", ["condition", "B", "A"],
        cooks_filter=True, independent_filter=True,
    )
    host = summary_host_inputs(dds.obsm["design_matrix"])
    counts = counts_df.values.T.astype(float)
    G = counts.shape[0]
    pad = 6
    counts_p = np.pad(counts, ((0, pad), (0, 0)), constant_values=7.0)
    mask = np.arange(G + pad) < G

    kw = dict(
        cohort_ids=host["cohort_ids"],
        use_for_max=host["use_for_max"],
        max_disp=float(max(10, counts_df.shape[0])),
    )
    base = summary_pipeline(
        jnp.asarray(counts),
        jnp.asarray(dds.obsm["design_matrix"].values),
        jnp.asarray(np.array([0.0, 1.0])),
        jnp.asarray(0.0),
        jnp.asarray(host["cooks_cutoff"]),
        **kw,
    )
    padded = summary_pipeline(
        jnp.asarray(counts_p),
        jnp.asarray(dds.obsm["design_matrix"].values),
        jnp.asarray(np.array([0.0, 1.0])),
        jnp.asarray(0.0),
        jnp.asarray(host["cooks_cutoff"]),
        jnp.asarray(mask),
        **kw,
    )
    # Not bit-identical: global reductions (trend Fisher scoring, prior MAD)
    # sum over different padded lengths, so XLA's reduction trees differ.
    # A genuine padding leak (pad lanes entering a statistic) shows up at
    # O(1e-2); reduction reordering stays at O(1e-8) in f64.
    np.testing.assert_allclose(
        np.asarray(padded["padj"])[:G],
        np.asarray(base["padj"]),
        rtol=1e-6,
        equal_nan=True,
    )
    assert np.isnan(np.asarray(padded["padj"])[G:]).all()


def test_summary_pipeline_continuous_covariate():
    """Continuous designs must select the IRLS mu-init, like the staged layer.

    Design rows with a continuous covariate cannot group 1:1 onto columns, so
    the reference initializes the dispersion-stage mu with one IRLS round
    instead of the linear regression (pydeseq2/dds.py:743-765). Regression
    guard: running the fused pipeline with the linear init here skews the
    genewise dispersions by ~30% and p-values by orders of magnitude.
    summary_host_inputs must report mu_init="irls" for such designs.
    """
    import pandas as pd

    from conftest import data_path

    counts_df = pd.read_csv(data_path("continuous", "test_counts.csv"), index_col=0).T
    metadata = pd.read_csv(data_path("continuous", "test_metadata.csv"), index_col=0)
    dds, _ = _staged(
        counts_df,
        metadata,
        "~group + condition + measurement",
        np.eye(4)[-1],
    )
    host = summary_host_inputs(dds.obsm["design_matrix"])
    assert host["mu_init"] == "irls"

    cvec = np.zeros(dds.obsm["design_matrix"].shape[1])
    cvec[-1] = 1
    ds = DeseqStats(dds, contrast=cvec, quiet=True)
    ds.summary()
    out = _fused(counts_df, dds, cvec, mu_init=host["mu_init"])
    np.testing.assert_allclose(
        np.asarray(out["dispersions"]),
        dds.var["dispersions"].values,
        rtol=1e-4,
        equal_nan=True,
    )
    np.testing.assert_allclose(
        np.asarray(out["p_values"]), ds.p_values.values, rtol=5e-3, equal_nan=True
    )
