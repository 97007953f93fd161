"""
Atlas-scale analysis with the streamed pipelines
================================================

The staged :class:`~pydeseq2_tpu.DeseqDataSet` API mirrors the reference
workflow one stage at a time and is the right tool up to a few hundred
samples. Past that — TCGA-sized cohorts (1k samples) or pseudobulk atlases
(10k samples) against a 60k-gene annotation — the (genes, samples) working
set of a monolithic program outgrows a single accelerator's memory. The
``fused_stream`` module re-expresses the SAME analysis (reference semantics
included: Cook's outlier replacement and refit, apeGLM shrinkage, blind VST)
as bounded-memory gene-block programs: counts are resident once, each heavy
per-gene stage streams ``(gene_block, n_samples)`` tiles through ``lax.map``,
and every cross-gene reduction (size-factor medians, dispersion trend, prior
variance, BH sweep) stays exact — streaming changes the memory shape, never
the statistics.

This example runs a small cohort through the streamed entry points so the
code is runnable anywhere; every knob discussed scales to the real thing
(measured configs up to 10,000 x 60,000 on one 16 GB TPU chip live in the
repo's SCALE.json).

.. contents:: Contents
    :local:
    :depth: 2
"""

# %%
import numpy as np

from pydeseq2_tpu.fused_stream import (
    run_lfc_shrink_streamed,
    run_summary_streamed,
    run_vst_streamed,
)

# %%
# Synthetic cohort
# ----------------
#
# A gene-major count matrix — ``(n_genes, n_samples)``, the layout the
# device programs consume directly (no transpose on upload) — with a
# two-level condition. At atlas scale you would generate/load this in
# chunks; the pipelines accept numpy arrays or device-resident
# ``jax.Array`` counts (the latter skip the host round-trip entirely,
# which matters when the matrix is gigabytes and the accelerator remote).

rng = np.random.default_rng(0)
n_genes, n_samples = 2_000, 64
base = rng.lognormal(3.0, 1.5, size=n_genes)
lfc = rng.normal(0, 0.5, size=n_genes)
cond = rng.integers(0, 2, n_samples)
disp = np.clip(rng.lognormal(-2.0, 1.0, size=n_genes), 1e-3, 5.0)
mu = base[:, None] * np.exp(lfc[:, None] * cond[None, :])
counts = rng.negative_binomial(
    1.0 / disp[:, None], 1.0 / (1.0 + disp[:, None] * mu)
).astype(np.float32)

design = np.column_stack([np.ones(n_samples), cond]).astype(np.float32)
contrast = np.array([0.0, 1.0], np.float32)

# %%
# The reference-default pipeline, streamed
# ----------------------------------------
#
# ``refit_cooks=True`` is what the reference runs by default: genes with a
# Cook's-distance outlier in a well-replicated cohort get the offending
# counts replaced by trimmed-mean imputations and are refitted. In the
# streamed form, the main pass packs the per-cell exceed flags 32-per-word
# (no (genes, samples) boolean layer ever materializes), the flagged genes
# are gathered into one compacted tile, and only that tile re-runs the
# genewise -> MAP -> IRLS -> Wald cascade, reusing the global trend and
# prior. ``gene_block=None`` auto-sizes blocks so ~20 live temporaries fit
# a ~4 GB budget — which is the whole gene axis here.

res = run_summary_streamed(
    counts,
    design,
    contrast,
    refit_cooks=True,
    min_replicates=7,
    max_disp=float(max(10, n_samples)),
)
print(f"replaced {int(res['replaced'].sum())} genes, "
      f"refitted {int(res['refitted'].sum())}")
print(f"significant at padj<0.05: {int((res['padj'] < 0.05).sum())}")

# %%
# The result dict carries the same per-gene quantities the staged
# ``DeseqStats.summary()`` produces — ``lfc`` (natural log, per
# coefficient), ``p_values``, ``padj``, dispersions, size factors — plus
# the refit bookkeeping (``replaced`` / ``refitted`` / ``new_all_zeroes``)
# that the reference stores in ``.varm``.

log2fc = res["lfc"] @ contrast / np.log(2.0)
print("top |log2FC|:", np.sort(np.abs(log2fc))[-3:])

# %%
# apeGLM shrinkage at scale
# -------------------------
#
# LFC shrinkage is embarrassingly blockable: its only global input is the
# adaptive prior variance, fitted host-side from the pass-1 MLE LFCs and
# SEs. Feed the summary outputs straight in; each block runs the batched
# Newton MAP fit (with the 2-D grid fallback compacted behind a
# ``lax.cond`` for P == 2 designs).

shrunk = run_lfc_shrink_streamed(
    counts,
    design,
    coeff_idx=1,
    dispersions=res["dispersions"],
    size_factors=res["size_factors"],
    mle_lfc=res["lfc"][:, 1],
    mle_se=res["se"],
)
print(f"prior scale {shrunk['prior_scale']:.3f}; "
      f"shrunk/raw LFC ratio (median): "
      f"{np.nanmedian(np.abs(shrunk['lfc'][:, 1]) / np.abs(res['lfc'][:, 1])):.3f}")

# %%
# Blind VST for QC and downstream ML
# ----------------------------------
#
# The variance-stabilizing transform (blind to the design, as for sample
# QC / clustering) under the same scaffold: pass 1 fits intercept-design
# dispersions per block, the trend is the usual O(genes) reduction, pass 2
# applies the closed-form transform per block. The (genes, samples) output
# is the one full-size tile — leave it on device and feed it to downstream
# JAX models, or pull the columns you need.

vst = run_vst_streamed(counts, max_disp=float(max(10, n_samples)))
print("VST range:", float(np.nanmin(vst["vst_counts"])),
      float(np.nanmax(vst["vst_counts"])))

# %%
# Zero-rich data
# --------------
#
# Median-of-ratios normalization needs at least one all-positive gene.
# Single-cell-ish matrices usually have none; the streamed pipeline then
# switches to in-stream ``poscounts`` size factors automatically (with a
# warning), or you can request them explicitly — the estimator runs as a
# sample-blocked ragged median entirely on device:

res_pc = run_summary_streamed(
    counts, design, contrast, sf_fit_type="poscounts",
    max_disp=float(max(10, n_samples)),
)
print("poscounts sf range:",
      float(res_pc["size_factors"].min()), float(res_pc["size_factors"].max()))

# %%
# Scaling knobs, in one place
# ---------------------------
#
# - ``gene_block``: genes per streamed tile. Auto picks the largest block
#   whose temporaries fit ~4 GB; smaller blocks trade wall-clock for
#   memory headroom.
# - ``sample_block``: streams the size-factor median sort over sample
#   blocks once the full ratio matrix would exceed ~1 GB (auto). Any block
#   size works — no divisibility requirement on the sample count.
# - Device-resident counts: pass a ``jax.Array`` and the wrapper neither
#   copies nor re-uploads; at 10k x 60k that saves a multi-gigabyte
#   host->device transfer per call.
# - Multi-chip: the same streamed program runs under a 1-D gene mesh
#   (``pydeseq2_tpu.parallel.mesh``) — sharded across devices, block-
#   streamed within each. See ``tests/test_sharding.py`` for the
#   sharded == unsharded pin and ``__graft_entry__.dryrun_multichip`` for
#   the deployment shape.
