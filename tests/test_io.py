"""Persistence round-trips: save/load fitted datasets + results."""

import numpy as np

from pydeseq2_tpu import DeseqDataSet, DeseqStats
from pydeseq2_tpu.io import load_dataset, load_results, save_dataset, save_results


def test_dataset_roundtrip(tmp_path, counts_df, metadata):
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.deseq2()
    save_dataset(dds, tmp_path / "dds.pkl")
    dds2 = load_dataset(tmp_path / "dds.pkl")

    np.testing.assert_array_equal(dds2.X, dds.X)
    np.testing.assert_allclose(
        dds2.var["dispersions"].values, dds.var["dispersions"].values
    )
    np.testing.assert_allclose(dds2.varm["LFC"].values, dds.varm["LFC"].values)

    # The reloaded dataset supports downstream statistics without refitting.
    ds = DeseqStats(dds2, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    assert np.isfinite(ds.results_df.pvalue).all()


def test_stage_resume(tmp_path, counts_df, metadata):
    """A dataset saved mid-pipeline resumes from where it stopped."""
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.fit_size_factors()
    dds.fit_genewise_dispersions()
    save_dataset(dds, tmp_path / "partial.pkl")

    dds2 = load_dataset(tmp_path / "partial.pkl")
    assert "genewise_dispersions" in dds2.var
    dds2.deseq2()  # finishes the remaining stages
    assert "dispersions" in dds2.var
    assert "LFC" in dds2.varm


def test_results_roundtrip(tmp_path, counts_df, metadata):
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.deseq2()
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    for name in ("res.csv", "res.pkl"):
        save_results(ds.results_df, tmp_path / name)
        back = load_results(tmp_path / name)
        np.testing.assert_allclose(
            back["log2FoldChange"].values,
            ds.results_df["log2FoldChange"].values,
            rtol=1e-12,
        )
