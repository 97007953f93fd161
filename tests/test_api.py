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


# ------------------------------------------------- normalization modes
# Parity: reference pydeseq2/dds.py:584-711 (size_factors_fit_type /
# control_genes / the ratio->iterative auto-switch at dds.py:682-690),
# exposed on the one-call path and streamed wrapper.
def test_run_deseq2_poscounts_matches_r(counts_df, metadata):
    from pydeseq2_tpu import run_deseq2
    from tests.conftest import data_path

    r_sf = pd.read_csv(
        data_path("single_factor", "r_test_size_factors_poscount.csv"),
        index_col=0,
    ).squeeze()
    for refit in (False, True):
        res, state = run_deseq2(
            counts_df,
            metadata,
            design="~condition",
            contrast=["condition", "B", "A"],
            size_factors_fit_type="poscounts",
            refit_cooks=refit,
            return_state=True,
        )
        sf = np.asarray(state["size_factors"])
        rel = (abs(r_sf.values - sf) / abs(r_sf.values)).max()
        assert rel < 0.02, (refit, rel)
        assert np.isfinite(res["pvalue"].dropna()).all()


def test_run_deseq2_iterative_matches_r(counts_df, metadata):
    from pydeseq2_tpu import run_deseq2
    from tests.conftest import data_path

    r_sf = pd.read_csv(
        data_path("single_factor", "r_iterative_size_factors.csv"), index_col=0
    ).squeeze()
    res, state = run_deseq2(
        counts_df,
        metadata,
        design="~condition",
        contrast=["condition", "B", "A"],
        size_factors_fit_type="iterative",
        refit_cooks=False,
        return_state=True,
    )
    sf = np.asarray(state["size_factors"])
    rel = (abs(r_sf.values - sf) / abs(r_sf.values)).max()
    assert rel < 0.02, rel


def test_run_deseq2_control_genes_matches_staged(counts_df, metadata):
    from pydeseq2_tpu import DeseqDataSet, run_deseq2

    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    # Control genes must be zero-free for the ratio estimator (the reference
    # silently NaNs otherwise: the filtered-genes intersection is empty).
    zero_free = counts_df.columns[(counts_df > 0).all(axis=0)][:2].tolist()
    dds.fit_size_factors(control_genes=zero_free)
    expected = dds.obs["size_factors"].values
    assert np.isfinite(expected).all()

    _, state = run_deseq2(
        counts_df,
        metadata,
        design="~condition",
        contrast=["condition", "B", "A"],
        control_genes=zero_free,
        refit_cooks=False,
        return_state=True,
    )
    np.testing.assert_allclose(np.asarray(state["size_factors"]), expected, rtol=1e-6)


def test_run_deseq2_zero_inflated_switches_to_iterative(counts_df, metadata):
    """Ratio undefined -> the reference's iterative-mode switch (with its
    warning), not a poscounts deviation (reference dds.py:682-690)."""
    from pydeseq2_tpu import run_deseq2

    rng = np.random.RandomState(42)
    rows = rng.choice(len(counts_df), counts_df.shape[-1])
    zi = counts_df.copy()
    zi.iloc[rows, :] = 0

    with pytest.warns(UserWarning, match="Switching to iterative mode"):
        res = run_deseq2(
            zi,
            metadata,
            design="~condition",
            contrast=["condition", "B", "A"],
            refit_cooks=False,
        )
    assert np.isfinite(res["pvalue"].dropna()).all()


def test_streamed_zero_inflated_switches_to_iterative(counts_df, metadata):
    """run_summary_streamed's ratio-undefined fallback is the device
    iterative solver, matching the staged result.

    Zeros are scattered (one distinct sample per gene) so every gene has a
    zero — triggering the switch — while the trimmed-likelihood optimum
    stays well-posed (an all-zero SAMPLE's optimal factor is 0, where both
    the reference's Powell and any solver stop at an arbitrary tiny value).
    """
    import jax.numpy as jnp

    from pydeseq2_tpu import DeseqDataSet
    from pydeseq2_tpu.fused_stream import run_summary_streamed

    zi = counts_df.copy()
    for j in range(zi.shape[1]):
        zi.iloc[(7 * j) % len(zi), j] = 0

    dds = DeseqDataSet(
        counts=zi, metadata=metadata, design="~condition", quiet=True
    )
    with pytest.warns(UserWarning, match="Switching to iterative mode"):
        dds.fit_size_factors()
    expected = dds.obs["size_factors"].values

    with pytest.warns(UserWarning, match="Switching to iterative mode"):
        res = run_summary_streamed(
            jnp.asarray(zi.values.T.astype(float)),
            dds.obsm["design_matrix"].values,
            np.array([0.0, 1.0]),
            dtype=np.float64,
            max_disp=float(max(10, len(zi))),
        )
    # Same trimmed-likelihood optimum (solver-path differences only: staged
    # <=500 samples uses scipy Powell, the streamed program the batched
    # Newton on the separable objective).
    rel = (abs(res["size_factors"] - expected) / abs(expected)).max()
    assert rel < 0.02, rel
    assert np.isfinite(res["p_values"][np.asarray(res["base_mean"]) > 0]).any()


def test_streamed_explicit_iterative_sf(counts_df, metadata):
    from pydeseq2_tpu import DeseqDataSet
    from pydeseq2_tpu.fused_stream import run_summary_streamed
    from tests.conftest import data_path

    r_sf = pd.read_csv(
        data_path("single_factor", "r_iterative_size_factors.csv"), index_col=0
    ).squeeze()
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    res = run_summary_streamed(
        np.asarray(counts_df.values.T, float),
        dds.obsm["design_matrix"].values,
        np.array([0.0, 1.0]),
        dtype=np.float64,
        sf_fit_type="iterative",
        max_disp=float(max(10, len(counts_df))),
    )
    rel = (abs(res["size_factors"] - r_sf.values) / abs(r_sf.values)).max()
    assert rel < 0.02, rel
