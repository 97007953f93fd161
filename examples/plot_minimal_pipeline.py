"""
Differential expression from start to finish
=============================================

This example walks through a complete differential expression analysis (DEA)
with ``pydeseq2_tpu``: loading count data, fitting the negative-binomial GLM
pipeline, testing contrasts with Wald statistics, shrinking log-fold-changes,
and plotting. It is the counterpart of the reference gallery's minimal
pipeline walkthrough (owkin/PyDESeq2 examples/plot_minimal_pydeseq2_pipeline.py)
but written for this framework's execution model: every per-gene solver runs
as a batched JAX program on the available accelerator (TPU/GPU/CPU), so the
workflow below looks like ordinary pandas-in / pandas-out Python while the
heavy math happens on-device.

.. contents:: Contents
    :local:
    :depth: 3
"""

# %%
import os
import pickle as pkl

import matplotlib

matplotlib.use("Agg")  # headless-safe; drop this line in a notebook

from pydeseq2_tpu import DeseqDataSet, DeseqStats
from pydeseq2_tpu.utils import load_example_data

SAVE = False  # flip to True to write results under OUTPUT_PATH
OUTPUT_PATH = "./output_files/synthetic_example"
if SAVE:
    os.makedirs(OUTPUT_PATH, exist_ok=True)

# %%
# What the pipeline needs
# -----------------------
#
# Two pandas DataFrames, indexed by sample:
#
# * **counts**, one row per sample and one column per gene, holding raw read
#   counts (non-negative integers — never normalize or log-transform them
#   yourself; the model owns normalization),
# * **metadata**, one row per sample, with the annotation columns that the
#   design formula will refer to (condition labels, batch, continuous
#   covariates, ...).
#
# The bundled synthetic dataset (100 samples x 10 genes, generated with
# DESeq2's ``makeExampleDESeqDataSet``) keeps this example fast; substitute
# your own DataFrames and everything below stays the same.

counts_df = load_example_data(modality="raw_counts", dataset="synthetic")
metadata = load_example_data(modality="metadata", dataset="synthetic")
print(counts_df.head())
print(metadata.head())

# %%
# Pre-filtering
# ~~~~~~~~~~~~~
#
# Drop samples whose annotation of interest is missing, and genes that carry
# almost no reads. Neither step is required — all-zero genes are masked
# internally and reported as NaN — but filtering near-empty genes keeps the
# multiple-testing burden (and the device arrays) smaller.

samples_to_keep = ~metadata.condition.isna()
counts_df = counts_df.loc[samples_to_keep]
metadata = metadata.loc[samples_to_keep]

genes_to_keep = counts_df.columns[counts_df.sum(axis=0) >= 10]
counts_df = counts_df[genes_to_keep]

# %%
# Single-factor analysis
# ----------------------
#
# The model object is :class:`pydeseq2_tpu.DeseqDataSet`. It owns the data,
# the design, and every intermediate quantity of the fit, stored in
# AnnData-style slots (``.obs`` per-sample, ``.var`` per-gene, ``.obsm`` /
# ``.varm`` / ``.layers`` for matrices, ``.uns`` for scalars) so you can
# inspect or persist any stage.
#
# ``design`` is an R-style Wilkinson formula evaluated against ``metadata``:
# ``"~condition"`` here; multi-factor designs (``"~group + condition"``),
# explicit treatment coding with reference levels (``"~C(condition,
# Treatment('B'))"``), continuous covariates, and interactions
# (``"~group:condition"``) are all supported by the built-in formula layer —
# no external dependency.
#
# Unlike the reference implementation, there is no ``n_cpus``/process-pool
# choice to make: the default inference backend compiles each stage into one
# batched XLA program over all genes at once. On a TPU the same code runs
# the same programs on the accelerator; on a multi-chip mesh the gene axis
# is sharded (see the sharding section of the step-by-step example).

dds = DeseqDataSet(
    counts=counts_df,
    metadata=metadata,
    design="~condition",
    refit_cooks=True,  # replace Cook's outliers and refit affected genes
    quiet=True,
)

# %%
# Fit everything with one call. ``deseq2()`` drives the eight stages:
# median-of-ratios size factors, gene-wise NB dispersion MLEs, the parametric
# dispersion trend, the empirical-Bayes dispersion prior, MAP dispersion
# shrinkage, IRLS log-fold-change fitting, Cook's distances, and (because
# ``refit_cooks=True``) outlier replacement + refit.

dds.deseq2()

# %%
# Every intermediate is now available. A few that are commonly inspected:

print(dds.var[["genewise_dispersions", "dispersions"]].head())  # per gene
print(dds.obs["size_factors"].head())  # per sample
print(dds.varm["LFC"].head())  # natural-log coefficients, one column per term

# %%
# The fitted dataset pickles directly (no anndata required; an
# ``to_picklable_anndata()`` export exists when you want interop):

if SAVE:
    with open(os.path.join(OUTPUT_PATH, "dds.pkl"), "wb") as f:
        pkl.dump(dds, f)

# %%
# Wald tests and the results table
# ~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~
#
# Statistical testing lives in :class:`pydeseq2_tpu.DeseqStats`. A contrast
# is a triple ``[variable, tested_level, reference_level]``: below we test
# condition B against condition A, i.e. the null hypothesis
# :math:`\\log_2\\mathrm{FC}(B/A) = 0` per gene. (A numeric contrast vector
# over design-matrix columns is also accepted — handy for continuous terms.)

ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)

# %%
# ``summary()`` runs the per-gene Wald tests (one batched device program),
# masks p-values of Cook's outliers, applies independent filtering (or plain
# Benjamini-Hochberg with ``independent_filter=False``), and assembles the
# results DataFrame:
#
# * ``baseMean`` — mean of normalized counts,
# * ``log2FoldChange`` — the tested contrast, in log2,
# * ``lfcSE`` — its standard error,
# * ``stat`` / ``pvalue`` — Wald statistic and two-sided p-value,
# * ``padj`` — BH-adjusted p-value after independent filtering.

ds.summary()
print(ds.results_df.head())

if SAVE:
    ds.results_df.to_csv(os.path.join(OUTPUT_PATH, "results.csv"))

# %%
# Directional and threshold tests are available through ``lfc_null`` and
# ``alt_hypothesis`` ("greater", "less", "greaterAbs", "lessAbs"); e.g. to
# ask for changes larger than 0.5 log2 units in magnitude:

ds_thresh = DeseqStats(
    dds,
    contrast=["condition", "B", "A"],
    lfc_null=0.5,
    alt_hypothesis="greaterAbs",
    quiet=True,
)
ds_thresh.summary()
print(ds_thresh.results_df[["log2FoldChange", "stat", "pvalue"]].head())

# %%
# LFC shrinkage (apeGLM)
# ~~~~~~~~~~~~~~~~~~~~~~
#
# Raw MLE fold-changes of weakly-expressed genes are noisy. ``lfc_shrink``
# replaces one coefficient's LFC and SE with the posterior under a
# heavy-tailed (Cauchy) apeGLM prior, which pulls uncertain estimates toward
# zero while leaving well-determined ones alone — use it for ranking and
# visualization; p-values are left untouched. The coefficient name follows
# the design-matrix column naming:

print(ds.LFC.columns.tolist())
ds.lfc_shrink(coeff="condition[T.B]")
print(ds.results_df.head())

# %%
# Plots
# ~~~~~
#
# The MA plot shows shrunk fold-changes against mean expression, colored by
# significance; the dispersion plot shows the gene-wise estimates, the
# fitted trend, and the final (MAP) values — the standard diagnostic for
# whether the dispersion model fits your data.

ds.plot_MA(s=20, save_path=os.path.join(OUTPUT_PATH, "ma.pdf") if SAVE else None)
dds.plot_dispersions(
    save_path=os.path.join(OUTPUT_PATH, "disp.pdf") if SAVE else None
)

# %%
# Multi-factor analysis
# ---------------------
#
# The same metadata has a second annotation, ``group``. Adding it to the
# formula adjusts the condition effect for group membership; everything else
# is unchanged. The design matrix gains one column per extra (non-reference)
# level.

dds_mf = DeseqDataSet(
    counts=counts_df,
    metadata=metadata,
    design="~group + condition",
    refit_cooks=True,
    quiet=True,
)
dds_mf.deseq2()
print(dds_mf.varm["LFC"].head())

# %%
# Contrasts name the variable to test; the other terms are controlled for.
# Testing condition B vs A, adjusted for group:

ds_mf = DeseqStats(dds_mf, contrast=["condition", "B", "A"], quiet=True)
ds_mf.summary()
print(ds_mf.results_df.head())

# %%
# Contrasts are antisymmetric — swapping the tested and reference levels
# flips the sign of the fold-changes and statistics but preserves p-values,
# so pick whichever direction reads naturally.

# %%
# Scaling up
# ----------
#
# This example's dataset is tiny, but nothing above is size-limited: the
# per-gene solvers are batched over the gene axis, so 60k genes cost one
# program execution, not 60k optimizer calls. For very large studies
# (thousands of samples) the one-program streamed pipeline
# (:func:`pydeseq2_tpu.fused_stream.run_summary_streamed`) runs the whole
# counts -> padj analysis with bounded device memory, and a multi-chip mesh
# shards genes across devices. See ``docs/architecture.md`` and the
# benchmark scripts under ``benchmarks/`` for measured throughput.
