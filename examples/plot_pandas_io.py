"""Loading counts/metadata from CSVs and saving results.

Counterpart of the reference gallery script examples/plot_pandas_io_example.py:
CSV in -> DataFrame results out, plus pickling a fitted dataset.
"""

import pickle
from pathlib import Path

import pandas as pd

from pydeseq2_tpu import DeseqDataSet, DeseqStats

DATA = Path(__file__).resolve().parent.parent / "datasets" / "synthetic"

# Counts CSVs are usually genes x samples; transpose to samples x genes.
counts_df = pd.read_csv(DATA / "test_counts.csv", index_col=0).T
metadata = pd.read_csv(DATA / "test_metadata.csv", index_col=0)

dds = DeseqDataSet(counts=counts_df, metadata=metadata, design="~condition")
dds.deseq2()

ds = DeseqStats(dds, contrast=["condition", "B", "A"])
ds.summary()

# Results to CSV
ds.results_df.to_csv("/tmp/deseq2_results.csv")

# Pickle the fitted dataset (AnnData export requires anndata installed;
# the container itself pickles directly).
with open("/tmp/dds.pkl", "wb") as f:
    pickle.dump(
        {
            "var": dds.var,
            "obs": dds.obs,
            "uns": dds.uns,
            "LFC": dds.varm["LFC"],
        },
        f,
    )
print(pd.read_csv("/tmp/deseq2_results.csv", index_col=0).head())
