"""
The pipeline, one stage at a time
=================================

``DeseqDataSet.deseq2()`` is a convenience driver: each of its stages is a
public method you can call yourself. Running them by hand is the best way to
understand what the model estimates, to inspect (or replace) intermediate
quantities, and to resume a long analysis from a saved checkpoint. This is
the counterpart of the reference gallery's step-by-step walkthrough
(owkin/PyDESeq2 examples/plot_step_by_step.py), annotated with what each
stage compiles to on the accelerator.

Every stage writes its outputs into the dataset's slots and lazily computes
missing prerequisites, so the granularity below is also the checkpoint
granularity: pickle the object at any point and the next stage picks up
where you left off.

.. contents:: Contents
    :local:
    :depth: 3
"""

# %%
import matplotlib

matplotlib.use("Agg")  # headless-safe; drop this line in a notebook

import numpy as np

from pydeseq2_tpu import DeseqDataSet, DeseqStats
from pydeseq2_tpu.utils import load_example_data

counts_df = load_example_data(modality="raw_counts", dataset="synthetic")
metadata = load_example_data(modality="metadata", dataset="synthetic")

dds = DeseqDataSet(
    counts=counts_df, metadata=metadata, design="~condition", quiet=True
)

# %%
# 1. Size factors
# ---------------
#
# Library-depth normalization by median-of-ratios: a gene-wise geometric
# mean over samples, then a per-sample median of count/geomean ratios. Both
# reductions run as one device program. ``fit_type="poscounts"`` handles
# zero-rich data (single-cell, CRISPR screens) by restricting the geometric
# mean to positive counts, and ``fit_type="iterative"`` fits size factors by
# maximum likelihood when every gene has at least one zero — the pipeline
# switches to it automatically in that case. ``control_genes`` restricts the
# median to a trusted gene set (e.g. spike-ins).

dds.fit_size_factors()
print(dds.obs["size_factors"].head())

# %%
# 2. Gene-wise dispersions
# ------------------------
#
# Each gene's NB dispersion is estimated by maximum likelihood with Cox-Reid
# bias adjustment. The reference implementation solves one bounded scipy
# optimization per gene in a process pool; here ALL genes advance together
# through a coarse-to-fine grid scan plus a few safeguarded Newton steps —
# one fixed-structure program, no per-gene control flow, which is what makes
# the gene axis shardable across devices. Initialization uses
# method-of-moments dispersions and a mean fit (linear regression for purely
# categorical designs, one IRLS round otherwise).

dds.fit_genewise_dispersions()
print(dds.var["genewise_dispersions"].head())

# %%
# 3. Dispersion trend
# -------------------
#
# Dispersion decreases with expression strength; DESeq2 captures this with
# the hyperbola :math:`\\alpha(\\mu) = a_0 + a_1/\\mu`, fitted as a gamma GLM
# and iterated with exclusion of far-off-curve genes until the coefficients
# stabilize. If the fit degenerates the model falls back to a trimmed-mean
# ("mean") trend — the same rule the reference applies — and says so with a
# warning. ``fit_type="mean"`` requests the flat trend directly.

dds.fit_dispersion_trend()
print(dds.uns["disp_function_type"])
print(dds.uns["trend_coeffs"])

# %%
# 4. Dispersion prior
# -------------------
#
# The empirical-Bayes prior width: the MAD of log residuals around the trend,
# squared, minus the expected sampling variance (a polygamma term), floored
# at 0.25. With very few residual degrees of freedom the estimate is flagged
# as unreliable (a warning, matching the reference's behavior).

dds.fit_dispersion_prior()
print(dds.uns["prior_disp_var"])

# %%
# 5. MAP dispersions
# ------------------
#
# The same batched dispersion solver, now maximizing likelihood + log-normal
# prior centered on the trend value. Genes whose gene-wise estimate sits far
# above the curve (more than two prior standard deviations) are dispersion
# outliers: they keep their gene-wise value rather than being shrunk.
# ``dispersions`` holds the final values used by everything downstream.

dds.fit_MAP_dispersions()
print(dds.var[["MAP_dispersions", "dispersions"]].head())

# %%
# 6. Log fold changes
# -------------------
#
# The NB GLM coefficients, fitted by iteratively reweighted least squares
# with all genes advancing in lock-step (converged genes freeze via a lane
# mask while stragglers iterate). Lanes that diverge or stall are re-solved
# by a projected-Newton box solver, and for two-column designs by an exact
# 2-D grid search — the in-program analog of the reference's
# L-BFGS-B-then-grid fallback cascade. Coefficients are stored in natural
# log (the results table converts to log2).

dds.fit_LFC()
print(dds.varm["LFC"].head())

# %%
# 7. Cook's distances and outlier refitting
# -----------------------------------------
#
# Cook's distance measures how much each sample pulls its gene's fit.
# ``calculate_cooks`` stores the full (samples x genes) layer; ``refit()``
# then replaces counts flagged beyond the F(0.99) cutoff — in cohorts with
# at least ``min_replicates`` (default 7) samples — by trimmed-mean imputed
# values, and re-runs the affected genes through stages 2-6 on a sub-dataset
# that reuses the parent's trend and prior.

dds.calculate_cooks()
if dds.refit_cooks:
    dds.refit()
print(f"genes refitted: {int(dds.var['refitted'].sum())}")

# %%
# 8. Wald tests
# -------------
#
# Statistical testing is a separate object so one fitted dataset can serve
# many contrasts. ``run_wald_test`` computes per-gene standard errors from
# the ridge-regularized information matrix and two-sided p-values;
# ``summary`` adds Cook's filtering and independent filtering / BH, and
# assembles the results DataFrame.

ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
ds.run_wald_test()
ds.summary()
print(ds.results_df.head())

# %%
# Variance-stabilizing transform
# ------------------------------
#
# For clustering, PCA, or visualization you usually want variance-stabilized
# counts rather than DEA statistics. ``vst()`` fits dispersions (blind to the
# design by default, to avoid leaking the comparison into the transform) and
# applies the closed-form parametric VST; ``vst_fit``/``vst_transform`` split
# the fit from the application so a transform learned on training samples
# can be applied to held-out data.

dds_vst = DeseqDataSet(
    counts=counts_df, metadata=metadata, design="~condition", quiet=True
)
dds_vst.vst(use_design=False)
print(dds_vst.layers["vst_counts"][:3, :4])

# %%
# The fused one-program pipeline
# ------------------------------
#
# The staged methods above favor inspectability. When you just want the
# results table at maximum throughput, the same analysis (without outlier
# refitting) compiles into ONE device program — every stage fused, no
# host-device round trips: :func:`pydeseq2_tpu.fused.summary_pipeline`, or
# its gene-streamed variant
# :func:`pydeseq2_tpu.fused_stream.run_summary_streamed` which bounds device
# memory at any dataset size by streaming gene blocks through the compiled
# program. Both are pinned to the staged path (and thereby to the R golden
# files) by the test suite.

from pydeseq2_tpu.fused_stream import run_summary_streamed

out = run_summary_streamed(
    counts_df.values.T.astype(float),  # gene-major (G, N)
    dds.obsm["design_matrix"],
    np.array([0.0, 1.0]),  # contrast over design columns
    gene_block=8,
    max_disp=float(max(10, counts_df.shape[0])),
)
print(out["padj"][:5])

# %%
# Sharding over a device mesh
# ---------------------------
#
# On a multi-chip TPU slice, gene-major arrays shard over a 1-D
# ``("genes",)`` mesh — the moral equivalent of the reference's process pool,
# except the few cross-gene reductions (size-factor medians, trend fit,
# prior MAD, filtering) become XLA collectives inside the same program
# instead of driver-side synchronization points. The code is unchanged; only
# the array placement differs:
#
# .. code-block:: python
#
#     from pydeseq2_tpu.parallel.mesh import make_gene_mesh, shard_gene_major
#
#     mesh = make_gene_mesh()            # all visible devices
#     counts = shard_gene_major(counts, mesh)
#     out = jax.jit(wald_pipeline)(counts, design, contrast, ...)
#
# Multi-host pods call ``pydeseq2_tpu.parallel.mesh.init_distributed()``
# first; ``tests/test_multihost.py`` runs this end to end with two
# processes.
