"""Minimal DEA workflow: counts + metadata -> results DataFrame.

Counterpart of the reference gallery script
examples/plot_minimal_pydeseq2_pipeline.py (canonical workflow): load data,
fit the NB GLM pipeline, run Wald tests, optionally shrink LFCs.
"""

import pandas as pd

from pydeseq2_tpu import DeseqDataSet, DeseqStats
from pydeseq2_tpu.utils import load_example_data

SAVE = False  # set to a directory path to pickle results

# ---------------------------------------------------------------- load data
counts_df = load_example_data(modality="raw_counts", dataset="synthetic")
metadata = load_example_data(modality="metadata", dataset="synthetic")

# Optionally filter out samples with missing annotations and low-count genes
samples_to_keep = ~metadata.condition.isna()
counts_df = counts_df.loc[samples_to_keep]
metadata = metadata.loc[samples_to_keep]
genes_to_keep = counts_df.columns[counts_df.sum(axis=0) >= 10]
counts_df = counts_df[genes_to_keep]

# ------------------------------------------------------------- fit the model
dds = DeseqDataSet(
    counts=counts_df,
    metadata=metadata,
    design="~condition",  # R-style formula; supports + , C(), interactions
    refit_cooks=True,
)
dds.deseq2()

# ------------------------------------------------------------ Wald test + BH
ds = DeseqStats(dds, contrast=["condition", "B", "A"])
ds.summary()
print(ds.results_df.head())

# ------------------------------------------------------------- LFC shrinkage
ds.lfc_shrink(coeff="condition[T.B]")
print(ds.results_df.head())

if SAVE:
    import pickle

    with open("results.pkl", "wb") as f:
        pickle.dump(ds.results_df, f)
