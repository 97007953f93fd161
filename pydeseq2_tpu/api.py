"""One-call TPU fast path: counts -> DESeq2 results DataFrame.

`run_deseq2` is the production entry point: host-side validation, design
materialization and static prep, then the ENTIRE analysis — normalization,
dispersion estimation (genewise -> trend -> prior -> MAP), IRLS LFCs, Wald
tests, Cook's outlier masking/refitting and independent filtering — as
jit-compiled XLA programs, optionally sharded over a multi-chip gene mesh.

Equivalent reference workflow (owkin/PyDESeq2): `DeseqDataSet(...).deseq2()`
followed by `DeseqStats(...).summary()` (reference pydeseq2/dds.py:516-562,
pydeseq2/ds.py:223-301). Like the reference, ``refit_cooks`` defaults to
True (reference pydeseq2/dds.py:221): Cook's-outlier counts are replaced and
the affected genes refitted via the gene-streamed program pair
(:func:`pydeseq2_tpu.fused_stream.run_summary_streamed` — main pass in
refit_mode + a compacted refit tile). With ``refit_cooks=False`` the whole
analysis is ONE monolithic XLA program
(:func:`pydeseq2_tpu.fused.summary_pipeline`).
"""

from __future__ import annotations

import numpy as np

__all__ = ["run_deseq2"]


def run_deseq2(
    counts,
    metadata=None,
    design: str = "~condition",
    contrast=None,
    *,
    alpha: float = 0.05,
    cooks_filter: bool = True,
    independent_filter: bool = True,
    lfc_null: float = 0.0,
    alt_hypothesis: str | None = None,
    fit_type: str = "parametric",
    size_factors_fit_type: str = "ratio",
    control_genes=None,
    refit_cooks: bool = True,
    min_replicates: int = 7,
    min_mu: float = 0.5,
    min_disp: float = 1e-8,
    max_disp: float | None = None,
    beta_tol: float | None = None,
    dtype=None,
    mesh=None,
    return_state: bool = False,
    quiet: bool = True,
):
    """Full DESeq2 Wald analysis in one call on TPU.

    Parameters
    ----------
    counts : pandas.DataFrame
        Raw counts, samples x genes (the reference's orientation,
        pydeseq2/dds.py:110-117).
    metadata : pandas.DataFrame
        Sample annotations (index aligned with ``counts``).
    design : str or pandas.DataFrame
        Wilkinson formula (e.g. ``"~group + condition"``) or a ready design
        matrix.
    contrast : list[str] | np.ndarray
        ``["variable", "tested_level", "ref_level"]`` (reference
        pydeseq2/ds.py:91-103) or an explicit (P,) contrast vector.
    size_factors_fit_type : {"ratio", "poscounts", "iterative"}
        Normalization mode (reference pydeseq2/dds.py:584-711). ``ratio`` is
        median-of-ratios computed in-program; when it is undefined (every
        gene has a zero) the analysis switches to the device iterative MLE
        solver with the reference's warning (dds.py:682-690). ``poscounts``
        runs the zero-rich estimator in-program; ``iterative`` runs the
        one-program trimmed-likelihood solver
        (:func:`pydeseq2_tpu.ops.sizefactors.iterative_size_factors`).
    control_genes : array-like, optional
        Restrict the ratio/poscounts estimators to these genes (names,
        positions or a boolean mask — reference pydeseq2/dds.py:640-651).
        Computed via the staged layer and injected into the device program.
    refit_cooks : bool
        Replace Cook's-outlier counts and refit the affected genes — the
        reference's DEFAULT pipeline (pydeseq2/dds.py:221,1042-1064). Runs
        the gene-streamed program pair; ``False`` runs the single monolithic
        XLA program (flag-then-mask semantics, no replacement).
    min_replicates : int
        Minimum cohort size for a sample's counts to be replaceable
        (reference pydeseq2/dds.py:219-224, default 7).
    lfc_null : float
        Null log2 fold change (converted to natural log internally, matching
        reference pydeseq2/ds.py:301).
    dtype : jnp dtype, optional
        float32 for TPU speed (default when x64 is off) or float64.
    mesh : jax.sharding.Mesh, optional
        1-D ``("genes",)`` mesh; the gene axis is padded shard-even and
        sharded, the design replicated. See
        :func:`pydeseq2_tpu.parallel.mesh.make_gene_mesh`.
    return_state : bool
        Also return the raw device output dict (dispersions, LFC matrix,
        Cook's distances, ...).

    Returns
    -------
    pandas.DataFrame with baseMean, log2FoldChange, lfcSE, stat, pvalue,
    padj (the reference's ``results_df``, pydeseq2/ds.py:268-286) — plus the
    state dict when ``return_state``.
    """
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from pydeseq2_tpu.fused import summary_host_inputs, summary_pipeline
    from pydeseq2_tpu.models.dataset import DeseqDataSet
    from pydeseq2_tpu.parallel.mesh import pad_to_multiple

    # Host-only: validation + design materialization (no device compute).
    dds = DeseqDataSet(
        counts=counts,
        metadata=metadata,
        design=design,
        refit_cooks=False,
        min_mu=min_mu,
        min_disp=min_disp,
        quiet=quiet,
    )
    design_df = dds.obsm["design_matrix"]
    n_samples, n_vars = design_df.shape

    if contrast is None:
        raise ValueError("The 'contrast' argument must be provided.")
    if isinstance(contrast, np.ndarray):
        if contrast.shape[0] != n_vars:
            raise ValueError(
                "The contrast vector must have the same length as the design "
                "matrix."
            )
        contrast_vector = np.asarray(contrast, float)
    else:
        factor, alternative, ref = contrast
        contrast_vector = np.asarray(
            dds.contrast(column=factor, baseline=ref, group_to_compare=alternative),
            float,
        )

    if lfc_null < 0 and alt_hypothesis in {"greaterAbs", "lessAbs"}:
        raise ValueError(
            f"The alternative hypothesis being {alt_hypothesis}, please "
            f"provide a positive lfc_null value (got {lfc_null})."
        )

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if beta_tol is None:
        # f32 deviance differences bottom out near 1e-7; keep the stopping
        # ratio above the noise floor (f64 uses the reference 1e-8,
        # pydeseq2/dds.py:221).
        beta_tol = 1e-8 if dtype == jnp.float64 else 1e-6
    if max_disp is None:
        max_disp = float(max(10, n_samples))

    # mu init: linear regression when design groups <-> columns are 1:1,
    # else one IRLS pass (reference pydeseq2/dds.py:743-765).
    mu_init = (
        "linear" if len(design_df.value_counts()) == n_vars else "irls"
    )

    counts_gm = np.asarray(dds.X, float).T  # gene-major (G, N)
    G = counts_gm.shape[0]

    # --- normalization routing (reference pydeseq2/dds.py:584-711) --------
    # sf_vec: externally computed (N,) factors to inject into the device
    # programs; sf_in_program: the in-program estimator otherwise.
    if size_factors_fit_type not in ("ratio", "poscounts", "iterative"):
        raise ValueError(
            f"size_factors_fit_type must be 'ratio', 'poscounts' or "
            f"'iterative', got {size_factors_fit_type!r}."
        )
    sf_vec = None
    sf_in_program = "ratio"

    def _iterative_sf():
        from pydeseq2_tpu.ops.sizefactors import iterative_size_factors

        n = counts_gm.shape[1]
        # Gene-tile the solver's (G, N) stages past ~1 GB of counts (same
        # HBM budget rule as the streamed pipeline's gene blocking).
        sf_block = None
        if G * n * np.dtype(dtype).itemsize > 1_000_000_000:
            sf_block = int(max(1024, min(G, 4_000_000_000 // (80 * n))))
        sf, _ = iterative_size_factors(
            jnp.asarray(counts_gm, dtype),
            min_disp=min_disp,
            max_disp=max_disp,
            min_mu=min_mu,
            gene_block=sf_block,
        )
        return sf

    if control_genes is not None and size_factors_fit_type != "iterative":
        # Control-gene-restricted estimators run in the staged layer (host
        # medians over the restricted gene set) and are injected.
        dds.fit_size_factors(
            fit_type=size_factors_fit_type, control_genes=control_genes
        )
        sf_vec = dds.obs["size_factors"].values
    elif size_factors_fit_type == "iterative":
        sf_vec = _iterative_sf()
    elif size_factors_fit_type == "poscounts":
        sf_in_program = "poscounts"
    elif not (counts_gm > 0).all(axis=1).any():
        # ratio undefined: every gene has a zero (reference dds.py:682-690)
        import warnings

        warnings.warn(
            "Every gene contains at least one zero, cannot compute log "
            "geometric means. Switching to iterative mode.",
            UserWarning,
            stacklevel=2,
        )
        sf_vec = _iterative_sf()

    if refit_cooks:
        # The reference's default analysis: Cook's replacement + refit needs
        # a data-dependent second program, so it runs through the streamed
        # wrapper (main pass in refit_mode + compacted refit tile + host
        # merge) rather than the single monolithic program.
        from pydeseq2_tpu.fused_stream import run_summary_streamed

        counts_in = counts_gm
        if mesh is not None:
            # device_put needs shard-even shapes: pad the gene axis to a
            # device multiple and tell the streamed wrapper the VALID count
            # (its gene_mask keeps pad lanes out of every global reduction,
            # incl. the independent-filtering quantiles).
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = int(np.prod(list(mesh.shape.values())))
            counts_pad, _ = pad_to_multiple(counts_gm, n_dev, fill=0)
            counts_in = jax.device_put(
                jnp.asarray(counts_pad, dtype),
                NamedSharding(mesh, P("genes", None)),
            )
        res = run_summary_streamed(
            counts_in,
            design_df,
            contrast_vector,
            float(np.log(2) * lfc_null),  # log2 -> natural log
            dtype=dtype,
            refit_cooks=True,
            n_genes=G,
            size_factors=None if sf_vec is None else jnp.asarray(sf_vec, dtype),
            sf_fit_type=sf_in_program,
            min_replicates=min_replicates,
            alpha=alpha,
            cooks_filter=cooks_filter,
            independent_filter=independent_filter,
            min_mu=min_mu,
            min_disp=min_disp,
            max_disp=max_disp,
            beta_tol=beta_tol,
            trend_type=fit_type,
            alt_hypothesis=alt_hypothesis,
            mu_init=mu_init,
        )
        ln2 = np.log(2)
        lfc = np.asarray(res["lfc"])[:G]
        results_df = pd.DataFrame(index=dds.var_names)
        results_df["baseMean"] = np.asarray(res["base_mean"])[:G]
        results_df["log2FoldChange"] = lfc @ contrast_vector / ln2
        results_df["lfcSE"] = np.asarray(res["se"])[:G] / ln2
        results_df["stat"] = np.asarray(res["statistics"])[:G]
        results_df["pvalue"] = np.asarray(res["p_values"])[:G]
        results_df["padj"] = np.asarray(res["padj"])[:G]
        if not quiet:
            print(results_df)
        if return_state:
            return results_df, res
        return results_df

    host = summary_host_inputs(design_df)
    gene_mask_np = None
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        counts_gm, _ = pad_to_multiple(counts_gm, n_dev, fill=1)
        gene_mask_np = np.arange(counts_gm.shape[0]) < G

    counts_d = jnp.asarray(counts_gm, dtype)
    design_d = jnp.asarray(design_df.values, dtype)
    contrast_d = jnp.asarray(contrast_vector, dtype)
    gene_mask_d = None if gene_mask_np is None else jnp.asarray(gene_mask_np)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        counts_d = jax.device_put(counts_d, NamedSharding(mesh, P("genes", None)))
        design_d = jax.device_put(design_d, NamedSharding(mesh, P()))
        contrast_d = jax.device_put(contrast_d, NamedSharding(mesh, P()))
        gene_mask_d = jax.device_put(gene_mask_d, NamedSharding(mesh, P("genes")))

    out = summary_pipeline(
        counts_d,
        design_d,
        contrast_d,
        jnp.asarray(np.log(2) * lfc_null, dtype),  # log2 -> natural log
        jnp.asarray(host["cooks_cutoff"], dtype),
        gene_mask_d,
        None if sf_vec is None else jnp.asarray(sf_vec, dtype),
        sf_fit_type=sf_in_program,
        cohort_ids=host["cohort_ids"],
        use_for_max=host["use_for_max"],
        alpha=alpha,
        cooks_filter=cooks_filter,
        independent_filter=independent_filter,
        min_mu=min_mu,
        min_disp=min_disp,
        max_disp=max_disp,
        beta_tol=beta_tol,
        trend_type=fit_type,
        alt_hypothesis=alt_hypothesis,
        mu_init=mu_init,
    )

    ln2 = np.log(2)
    lfc = np.asarray(out["lfc"])[:G]
    results_df = pd.DataFrame(index=dds.var_names)
    results_df["baseMean"] = np.asarray(out["base_mean"])[:G]
    results_df["log2FoldChange"] = lfc @ contrast_vector / ln2
    results_df["lfcSE"] = np.asarray(out["se"])[:G] / ln2
    results_df["stat"] = np.asarray(out["statistics"])[:G]
    results_df["pvalue"] = np.asarray(out["p_values"])[:G]
    results_df["padj"] = np.asarray(out["padj"])[:G]

    if not quiet:
        print(results_df)
    if return_state:
        return results_df, out
    return results_df
