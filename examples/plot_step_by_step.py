"""Stage-by-stage DEA workflow, exposing every pipeline step.

Counterpart of the reference gallery script examples/plot_step_by_step.py:
runs each stage of ``deseq2()`` manually - useful for inspecting
intermediate state (all stored in AnnData-style slots) or customizing the
pipeline.
"""

from pydeseq2_tpu import DeseqDataSet, DeseqStats
from pydeseq2_tpu.utils import load_example_data

counts_df = load_example_data(modality="raw_counts", dataset="synthetic")
metadata = load_example_data(modality="metadata", dataset="synthetic")

dds = DeseqDataSet(counts=counts_df, metadata=metadata, design="~condition")

# 1. Size factors (median-of-ratios; "poscounts" and "iterative" also exist)
dds.fit_size_factors()
print(dds.obs["size_factors"].head())

# 2. Genewise dispersions (batched NB dispersion MLE on device)
dds.fit_genewise_dispersions()
print(dds.var["genewise_dispersions"].head())

# 3. Dispersion trend curve (parametric a1/mu + a0, gamma GLM)
dds.fit_dispersion_trend()
print(dds.uns["trend_coeffs"])

# 4. Dispersion prior variance (empirical Bayes hyperparameter)
dds.fit_dispersion_prior()
print(dds.uns["prior_disp_var"])

# 5. MAP dispersions (shrunk toward the trend)
dds.fit_MAP_dispersions()
print(dds.var[["MAP_dispersions", "dispersions"]].head())

# 6. LFCs (batched IRLS, natural log scale)
dds.fit_LFC()
print(dds.varm["LFC"].head())

# 7. Cooks distances + outlier refitting
dds.calculate_cooks()
if dds.refit_cooks:
    dds.refit()

# 8. Wald tests + independent filtering + BH adjustment
ds = DeseqStats(dds, contrast=["condition", "B", "A"])
ds.run_wald_test()
ds.summary()
print(ds.results_df.head())
