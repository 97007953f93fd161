"""VST conformance and fit/transform semantics.

Mirrors reference tests/test_pydeseq2.py:761-803,869-929.
"""

import numpy as np
import pandas as pd
import pytest

from pydeseq2_tpu import DeseqDataSet

from conftest import data_path


def test_vst(counts_df, metadata, tol=0.02):
    r_vst = pd.read_csv(data_path("single_factor", "r_vst.csv"), index_col=0).T
    r_vst_with_design = pd.read_csv(
        data_path("single_factor", "r_vst_with_design.csv"), index_col=0
    ).T

    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.vst(use_design=False)
    assert (np.abs(r_vst - dds.layers["vst_counts"]) / r_vst).max().max() < tol

    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.vst(use_design=True)
    assert (
        np.abs(r_vst_with_design - dds.layers["vst_counts"]) / r_vst_with_design
    ).max().max() < tol


def test_mean_vst(counts_df, metadata, tol=0.02):
    r_vst = pd.read_csv(data_path("single_factor", "r_mean_vst.csv"), index_col=0).T
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.vst(use_design=False, fit_type="mean")
    assert (np.abs(r_vst - dds.layers["vst_counts"]) / r_vst).max().max() < tol


@pytest.fixture
def train_dds(counts_df, metadata):
    return DeseqDataSet(
        counts=counts_df[25:75],
        metadata=metadata[25:75],
        design="~condition",
        quiet=True,
    )


def test_vst_fit(train_dds):
    train_dds.vst_fit()
    assert "vst_trend_coeffs" in train_dds.uns
    assert "normed_counts" in train_dds.layers
    assert "size_factors" in train_dds.obs


def test_vst_transform(train_dds, counts_df):
    train_dds.vst_fit()
    result = train_dds.vst_transform(counts_df[0:25].to_numpy())
    assert isinstance(result, np.ndarray)
    assert result.shape == (25, 10)


@pytest.mark.parametrize(
    ("dea_fit_type", "vst_fit_type"),
    [
        ("mean", "parametric"),
        ("parametric", "mean"),
        ("parametric", "parametric"),
        ("mean", "mean"),
    ],
)
def test_vst_blind(counts_df, metadata, dea_fit_type, vst_fit_type):
    train_dds = DeseqDataSet(
        counts=counts_df[25:75],
        metadata=metadata[25:75],
        design="~condition",
        fit_type=dea_fit_type,
        quiet=True,
    )
    train_dds.deseq2()
    if dea_fit_type == "parametric":
        assert "trend_coeffs" in train_dds.uns
    else:
        assert "mean_disp" in train_dds.uns
    assert "normed_counts" in train_dds.layers
    assert "size_factors" in train_dds.obs
    assert train_dds.fit_type == dea_fit_type

    train_dds.vst(use_design=False, fit_type=vst_fit_type)
    assert train_dds.fit_type == dea_fit_type


def test_vst_transform_no_fit(counts_df, metadata):
    train_dds = DeseqDataSet(
        counts=counts_df[25:75],
        metadata=metadata[25:75],
        design="~condition",
        fit_type="parametric",
        quiet=True,
    )
    with pytest.raises(RuntimeError):
        train_dds.vst_transform(counts_df[0:25].to_numpy())


def test_fused_vst_matches_stagewise(counts_df, metadata, tol=0.02):
    """The one-program vst_pipeline reproduces dds.vst(use_design=False)."""
    import jax.numpy as jnp

    from pydeseq2_tpu.fused import vst_pipeline

    r_vst = pd.read_csv(data_path("single_factor", "r_vst.csv"), index_col=0).T

    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.vst(use_design=False)

    out = vst_pipeline(jnp.asarray(counts_df.to_numpy().T, jnp.float64))
    fused_vst = np.asarray(out["vst_counts"]).T

    # vs the stage-by-stage driver
    assert np.allclose(fused_vst, dds.layers["vst_counts"], rtol=1e-4, atol=1e-6)
    # vs the R golden fixture
    assert (np.abs(r_vst - fused_vst) / r_vst).max().max() < tol
    assert np.allclose(
        np.asarray(out["size_factors"]), dds.obs["size_factors"].values, rtol=1e-6
    )


def test_fused_vst_mean_trend(counts_df, metadata, tol=0.02):
    import jax.numpy as jnp

    from pydeseq2_tpu.fused import vst_pipeline

    r_vst = pd.read_csv(data_path("single_factor", "r_mean_vst.csv"), index_col=0).T
    out = vst_pipeline(
        jnp.asarray(counts_df.to_numpy().T, jnp.float64), trend_type="mean"
    )
    fused_vst = np.asarray(out["vst_counts"]).T
    assert (np.abs(r_vst - fused_vst) / r_vst).max().max() < tol
