"""API-surface parity checks: names a reference user expects to find.

Parity: reference package exports (pydeseq2/__init__.py, pydeseq2/utils.py,
pydeseq2/default_inference.py:14-48).
"""

import numpy as np
import pandas as pd
import pytest


def test_package_exports():
    import pydeseq2_tpu as pkg

    for name in [
        "DeseqDataSet",
        "DeseqStats",
        "DeseqDataContainer",
        "Inference",
        "JaxInference",
        "DefaultInference",
        "deseq2_norm",
        "deseq2_norm_fit",
        "deseq2_norm_transform",
        "__version__",
    ]:
        assert hasattr(pkg, name), name


def test_utils_exports():
    from pydeseq2_tpu.utils import (  # noqa: F401
        dispersion_trend,
        get_num_processes,
        load_example_data,
        n_or_more_replicates,
        test_valid_counts,
        trimmed_mean_numpy,
    )

    assert get_num_processes(5) == 5
    assert get_num_processes() >= 1


def test_default_inference_runs_pipeline():
    """DefaultInference(n_cpus=...) from reference code works unchanged."""
    from pydeseq2_tpu import DefaultInference, DeseqDataSet, DeseqStats
    from pydeseq2_tpu.utils import load_example_data

    counts = load_example_data("raw_counts")
    metadata = load_example_data("metadata")
    inf = DefaultInference(n_cpus=2, batch_size=128)
    dds = DeseqDataSet(
        counts=counts,
        metadata=metadata,
        design="~condition",
        inference=inf,
        quiet=True,
    )
    dds.deseq2()
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    res = ds.results_df
    assert res["pvalue"].notna().any()
    assert np.isfinite(res["log2FoldChange"].dropna()).all()


def test_default_inference_unknown_backend_warns():
    from pydeseq2_tpu import DefaultInference

    with pytest.warns(UserWarning, match="joblib backend"):
        DefaultInference(backend="dask")


def test_load_example_data_shapes():
    from pydeseq2_tpu.utils import load_example_data

    counts = load_example_data("raw_counts")
    metadata = load_example_data("metadata")
    assert isinstance(counts, pd.DataFrame)
    assert counts.shape[0] == metadata.shape[0]
    assert set(metadata.columns) >= {"condition"}


def _staged_results(counts, metadata, design, contrast, refit_cooks):
    from pydeseq2_tpu import DeseqDataSet, DeseqStats

    dds = DeseqDataSet(
        counts=counts, metadata=metadata, design=design,
        refit_cooks=refit_cooks, quiet=True,
    )
    dds.deseq2()
    ds = DeseqStats(dds, contrast=contrast, quiet=True)
    ds.summary()
    return dds, ds


def test_run_deseq2_default_refit_matches_staged():
    """run_deseq2's DEFAULT pipeline is the reference's default: Cook's
    outlier replacement + refit (reference pydeseq2/dds.py:221,1042-1064).

    Injected outliers force actual replacement so the refit program runs.
    """
    from pydeseq2_tpu import run_deseq2
    from pydeseq2_tpu.utils import load_example_data

    counts = load_example_data("raw_counts").copy()
    metadata = load_example_data("metadata")
    counts.iloc[0, 0] = 1_000_000
    counts.iloc[5, 3] = 500_000

    dds, ds = _staged_results(
        counts, metadata, "~condition", ["condition", "B", "A"], True
    )
    assert dds.var["refitted"].sum() > 0  # the scenario must actually refit

    res, state = run_deseq2(
        counts, metadata, "~condition",
        contrast=["condition", "B", "A"],
        return_state=True,
    )
    assert state["refitted"].sum() > 0
    np.testing.assert_array_equal(
        state["refitted"], dds.var["refitted"].values
    )
    for col in ("baseMean", "log2FoldChange", "lfcSE", "stat", "pvalue", "padj"):
        np.testing.assert_allclose(
            res[col].values, ds.results_df[col].values, rtol=1e-5,
            equal_nan=True, err_msg=col,
        )


def test_run_deseq2_no_refit_matches_staged():
    """refit_cooks=False routes through the monolithic one-program path."""
    from pydeseq2_tpu import run_deseq2
    from pydeseq2_tpu.utils import load_example_data

    counts = load_example_data("raw_counts")
    metadata = load_example_data("metadata")
    _, ds = _staged_results(
        counts, metadata, "~condition", ["condition", "B", "A"], False
    )
    res = run_deseq2(
        counts, metadata, "~condition",
        contrast=["condition", "B", "A"],
        refit_cooks=False,
    )
    for col in ("baseMean", "log2FoldChange", "lfcSE", "stat", "pvalue", "padj"):
        np.testing.assert_allclose(
            res[col].values, ds.results_df[col].values, rtol=1e-5,
            equal_nan=True, err_msg=col,
        )


def test_run_deseq2_mesh_matches_unsharded():
    """run_deseq2 over the 8-device gene mesh == unsharded, on BOTH the
    streamed default-refit path and the monolithic no-refit path."""
    import jax

    from pydeseq2_tpu import run_deseq2
    from pydeseq2_tpu.parallel.mesh import make_gene_mesh
    from pydeseq2_tpu.utils import load_example_data

    counts = load_example_data("raw_counts").copy()
    metadata = load_example_data("metadata")
    counts.iloc[0, 0] = 1_000_000  # force a replacement on the refit path
    mesh = make_gene_mesh(8)
    assert jax.device_count() >= 8

    for refit in (True, False):
        base = run_deseq2(
            counts, metadata, "~condition",
            contrast=["condition", "B", "A"], refit_cooks=refit,
        )
        sharded = run_deseq2(
            counts, metadata, "~condition",
            contrast=["condition", "B", "A"], refit_cooks=refit, mesh=mesh,
        )
        for col in ("baseMean", "log2FoldChange", "lfcSE", "stat", "pvalue", "padj"):
            np.testing.assert_allclose(
                sharded[col].values, base[col].values, rtol=1e-7,
                equal_nan=True, err_msg=f"refit={refit} {col}",
            )
