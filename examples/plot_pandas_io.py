"""
Reading from and writing to disk
================================

Real analyses start from files, not in-memory toys. This example covers the
I/O side of a ``pydeseq2_tpu`` workflow: loading counts and annotations from
CSVs, getting them into the sample x gene layout the model expects, saving
results tables, and persisting a fitted dataset so a later session (or a
collaborator) can resume from any pipeline stage without recomputing.
Counterpart of the reference gallery's pandas I/O walkthrough
(owkin/PyDESeq2 examples/plot_pandas_io_example.py).

.. contents:: Contents
    :local:
    :depth: 3
"""

# %%
import os
from pathlib import Path

import pandas as pd

from pydeseq2_tpu import DeseqDataSet, DeseqStats
from pydeseq2_tpu.io import load_dataset, load_results, save_dataset, save_results

# Point DATA_PATH at your own directory of CSVs; we use the repo's bundled
# synthetic dataset here so the example is self-contained.
DATA_PATH = Path(__file__).resolve().parent.parent / "datasets" / "synthetic"
OUTPUT_PATH = Path("./output_files/synthetic_example")
os.makedirs(OUTPUT_PATH, exist_ok=True)

# %%
# Loading count data
# ------------------
#
# Sequencing pipelines usually emit counts as genes x samples; the model
# wants samples x genes (one row per sample, matching the metadata index).
# Load, then transpose:

counts_df = pd.read_csv(DATA_PATH / "test_counts.csv", index_col=0)
print(counts_df.head())

counts_df = counts_df.T
print(counts_df.head())

# %%
# Counts must be raw non-negative integers — construction validates this and
# raises on NaNs, negative values, or non-integer (e.g. TPM/FPKM) input.

# %%
# Loading sample annotations
# --------------------------
#
# Metadata rows must be indexed by the same sample names as the counts. Any
# column referenced by the design formula must be free of NaNs for the
# samples you keep.

metadata = pd.read_csv(DATA_PATH / "test_metadata.csv", index_col=0)
print(metadata.head())

samples_to_keep = ~metadata.condition.isna()
counts_df = counts_df.loc[samples_to_keep]
metadata = metadata.loc[samples_to_keep]

genes_to_keep = counts_df.columns[counts_df.sum(axis=0) >= 10]
counts_df = counts_df[genes_to_keep]

# %%
# Fit and test
# ------------

dds = DeseqDataSet(
    counts=counts_df, metadata=metadata, design="~condition", quiet=True
)
dds.deseq2()

ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
ds.summary()
print(ds.results_df.head())

# %%
# Saving results
# --------------
#
# The results table is a plain DataFrame — ``to_csv`` works, and
# ``save_results``/``load_results`` are thin wrappers that keep the index
# intact:

save_results(ds.results_df, OUTPUT_PATH / "results.csv")
roundtrip = load_results(OUTPUT_PATH / "results.csv")
print(roundtrip.head())

# %%
# Persisting the fitted dataset
# -----------------------------
#
# ``save_dataset`` serializes the whole model state — counts, design, and
# every fitted slot (size factors, dispersions, LFCs, Cook's layers, trend
# coefficients). Because each pipeline stage lazily computes only what is
# missing, the saved object doubles as a checkpoint: load it later and call
# any downstream method directly.

save_dataset(dds, OUTPUT_PATH / "dds.pkl")
dds_restored = load_dataset(OUTPUT_PATH / "dds.pkl")

# A new contrast on the restored dataset, without refitting anything:
ds2 = DeseqStats(dds_restored, contrast=["condition", "A", "B"], quiet=True)
ds2.summary()
print(ds2.results_df.head())

# %%
# Stage-level resume works the same way: save after ``fit_size_factors()``
# (or any other stage) and the restored object continues from there —
# ``deseq2()`` will skip nothing it has and compute everything it lacks.

dds_partial = DeseqDataSet(
    counts=counts_df, metadata=metadata, design="~condition", quiet=True
)
dds_partial.fit_size_factors()
save_dataset(dds_partial, OUTPUT_PATH / "dds_partial.pkl")

dds_resumed = load_dataset(OUTPUT_PATH / "dds_partial.pkl")
dds_resumed.deseq2()  # picks up after size factors
print(dds_resumed.var["dispersions"].head())

# %%
# AnnData interop
# ---------------
#
# When the ``anndata`` package is installed, ``to_picklable_anndata()``
# exports the dataset as a plain AnnData object (X, obs, var, obsm, varm,
# uns, layers) for use with scanpy or storage as ``.h5ad``; a DeseqDataSet
# can likewise be constructed directly from an AnnData via the ``adata=``
# constructor argument. Neither direction is required for any functionality
# in this package — the native container pickles directly, as above.
