"""Minimal in-repo stand-in for ``anndata.AnnData``.

The bench environment does not ship anndata, which previously left the
adapter code paths (``DeseqDataSet(adata=...)``, ``container.from_anndata``,
``to_picklable_anndata`` marshalling) with zero runtime coverage — the one
perpetual skip in the suite. This double implements exactly the attribute
surface those adapters consume (X / obs / var / obsm / varm / uns / layers /
n_obs / n_vars), so the adapter logic runs everywhere; CI additionally runs
the same tests against the real package (`pip install .[anndata]`).

Reference interop surface: pydeseq2/dds.py:33,1112-1138.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class AnnData:
    """Duck-typed AnnData: the subset of the API our adapters touch."""

    def __init__(self, X, obs=None, var=None, obsm=None, varm=None,
                 layers=None, uns=None):
        if isinstance(X, pd.DataFrame):
            obs = pd.DataFrame(index=X.index) if obs is None else obs
            var = pd.DataFrame(index=X.columns) if var is None else var
            X = X.values
        self.X = np.asarray(X)
        self.obs = pd.DataFrame(index=range(self.X.shape[0])) if obs is None else obs
        self.var = pd.DataFrame(index=range(self.X.shape[1])) if var is None else var
        self.obsm = {} if obsm is None else dict(obsm)
        self.varm = {} if varm is None else dict(varm)
        self.layers = {} if layers is None else dict(layers)
        self.uns = {} if uns is None else dict(uns)

    @property
    def n_obs(self) -> int:
        return self.X.shape[0]

    @property
    def n_vars(self) -> int:
        return self.X.shape[1]
