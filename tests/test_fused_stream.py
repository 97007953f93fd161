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


def test_streamed_rejects_zero_inflated_counts():
    """Zero-inflated data (a zero in every gene) fails loudly, not with NaNs.

    The reference switches ratio -> iterative size factors in this regime
    (pydeseq2/dds.py:682-690); the iterative MLE is a staged-path feature,
    so the streamed wrapper must direct users there instead of streaming
    undefined medians through the analysis.
    """
    import pytest

    rng = np.random.default_rng(0)
    counts = rng.poisson(2.0, (20, 12)).astype(float)
    counts[:, 0] = 0.0  # one zero per gene
    X = np.column_stack([np.ones(12), rng.integers(0, 2, 12)]).astype(float)
    with pytest.raises(ValueError, match="iterative"):
        run_summary_streamed(counts, X, [0.0, 1.0])


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
