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
