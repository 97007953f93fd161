"""Persistence round-trips: save/load fitted datasets + results."""

import numpy as np
import pandas as pd

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


def test_anndata_adapter_roundtrip(counts_df, metadata, monkeypatch):
    """from_anndata/to_anndata marshalling, runnable without anndata.

    The import adapter is duck-typed, so the in-repo double exercises it
    directly; the export adapter's ``import anndata`` is satisfied with a
    recording fake module, so the slot marshalling (ndarray coercion of
    layers/obsm/varm, DataFrame passthrough) runs even in environments
    without the package. Reference surface: pydeseq2/dds.py:1112-1138.
    """
    import sys
    import types

    import fake_anndata

    from pydeseq2_tpu.container import DeseqDataContainer

    adata = fake_anndata.AnnData(
        counts_df.astype(int),
        obs=metadata,
        obsm={"extra": np.arange(counts_df.shape[0])},
        varm={"w": np.ones((counts_df.shape[1], 2))},
        layers={"half": counts_df.values / 2.0},
        uns={"tag": "roundtrip"},
    )
    c = DeseqDataContainer.from_anndata(adata)
    np.testing.assert_array_equal(c.X, counts_df.values)
    assert c.obs.equals(metadata)
    np.testing.assert_array_equal(c.layers["half"], counts_df.values / 2.0)
    np.testing.assert_array_equal(c.obsm["extra"], adata.obsm["extra"])
    np.testing.assert_array_equal(c.varm["w"], adata.varm["w"])
    assert c.uns["tag"] == "roundtrip"

    # Fit a dataset and export through to_picklable_anndata with a fake
    # anndata module that records the marshalled kwargs.
    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.deseq2()

    captured = {}

    def _anndata_ctor(**kw):
        captured.update(kw)
        return fake_anndata.AnnData(
            kw["X"], obs=kw["obs"], var=kw["var"], obsm=kw["obsm"],
            varm=kw["varm"], layers=kw["layers"], uns=kw["uns"],
        )

    fake_mod = types.ModuleType("anndata")
    fake_mod.AnnData = _anndata_ctor
    monkeypatch.setitem(sys.modules, "anndata", fake_mod)

    exported = dds.to_picklable_anndata()
    np.testing.assert_array_equal(exported.X, dds.X)
    assert "LFC" in exported.varm and "design_matrix" in exported.obsm
    for v in captured["layers"].values():
        assert isinstance(v, np.ndarray)  # device arrays coerced host-side
    assert isinstance(captured["varm"]["LFC"], pd.DataFrame)

    # And back in: the re-imported container matches the fitted dataset.
    c2 = DeseqDataContainer.from_anndata(exported)
    np.testing.assert_allclose(
        np.asarray(c2.varm["LFC"], float), np.asarray(dds.varm["LFC"], float)
    )


def test_container_getitem_anndata_style(counts_df, metadata):
    """AnnData-style 2-D slicing on the container and the fitted dataset.

    Mirrors the reference's own usage (pydeseq2/dds.py:868-874: ``self[:,
    self.non_zero_genes].var[...]``; dds.py:1330: ``self[:,
    self.var["replaced"]].copy()``) so reference scripts run unchanged.
    """
    import numpy as np

    from pydeseq2_tpu import DeseqDataSet

    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.fit_size_factors()
    dds.fit_genewise_dispersions()

    # gene-name list slice
    genes = dds.var_names[:3]
    sub = dds[:, genes]
    assert sub.n_vars == 3 and sub.n_obs == dds.n_obs
    np.testing.assert_array_equal(sub.X, dds.X[:, :3])
    np.testing.assert_array_equal(
        sub.var["genewise_dispersions"].values,
        dds.var["genewise_dispersions"].values[:3],
    )

    # boolean mask slice, then .copy() — the reference refit pattern
    mask = np.zeros(dds.n_vars, dtype=bool)
    mask[[1, 4]] = True
    sub2 = dds[:, mask].copy()
    assert list(sub2.var_names) == list(dds.var_names[[1, 4]])
    np.testing.assert_array_equal(
        sub2.layers["normed_counts"], dds.layers["normed_counts"][:, [1, 4]]
    )

    # sample slicing keeps var slots, subsets obs-aligned slots
    head = dds[:10]
    assert head.n_obs == 10 and head.n_vars == dds.n_vars
    np.testing.assert_array_equal(
        head.obsm["design_matrix"].values, dds.obsm["design_matrix"].values[:10]
    )

    # combined 2-D slice + single gene name
    both = dds[np.arange(5), dds.var_names[2]]
    assert both.n_obs == 5 and both.n_vars == 1
    np.testing.assert_array_equal(both.X[:, 0], dds.X[:5, 2])

    import pytest

    with pytest.raises(KeyError):
        dds[:, "not_a_gene"]
