"""On-device conformance: R DESeq2 golden fixtures through the f32 TPU paths.

The CI suite runs every golden test on CPU (f64 by default); this script
produces the committed artifact demonstrating the same fixtures pass ON THE
ACTUAL DEVICE with the TPU dtype (f32) and the TPU stopping rules
(beta_tol=1e-6 + step_tol secondary stop; see tests/test_f32.py for why).

Runs, per fixture (single-factor / multifactor / continuous):
  - the staged DeseqDataSet + DeseqStats pipeline (refit_cooks as in the
    golden tests),
  - the fused one-program summary pipeline (refit_cooks=False semantics,
    compared against the same CSV the no-refit golden test uses),
  - the gene-streamed pipeline (single-factor, forced multi-block),

and records max relative errors of log2FoldChange / pvalue / padj vs the
frozen R DESeq2 v1.34.0 CSVs plus NaN-mask equality, with the reference
repo's own tolerance scheme (2%, 4% for multifactor/continuous — reference
tests/test_pydeseq2.py:94,435,932-943). Writes TPU_CONFORMANCE.json.

Usage: python benchmarks/tpu_conformance.py   (plain `python` = axon TPU;
       prefix `env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=` for a CPU f32 run)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ["PYDESEQ2_TPU_NO_X64"] = "1"  # f32: the TPU-native dtype

import numpy as np
import pandas as pd

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
DATA = ROOT / "tests" / "data"

F32_BETA_TOL = 1e-6  # above the f32 deviance-ratio noise floor


def compare(res_df: pd.DataFrame, r_res: pd.DataFrame, tol: float) -> dict:
    """Reference checker semantics (tests/test_pydeseq2.py:932-943) as data."""
    out = {
        "nan_mask_pvalue_equal": bool((res_df.pvalue.isna() == r_res.pvalue.isna()).all()),
        "nan_mask_padj_equal": bool((res_df.padj.isna() == r_res.padj.isna()).all()),
        "tol": tol,
    }
    rels = {}
    rels["log2FoldChange"] = float(
        (abs(r_res.log2FoldChange - res_df.log2FoldChange) / abs(r_res.log2FoldChange)).max()
    )
    rels["pvalue"] = float((abs(r_res.pvalue - res_df.pvalue) / r_res.pvalue).max())
    rels["padj"] = float((abs(r_res.padj - res_df.padj) / r_res.padj).max())
    out["max_rel_err"] = rels
    # The relative-error criterion divides by |R log2FC| with no floor, so a
    # gene whose true fold-change is ~0 amplifies f32 noise (abs err ~3e-5 in
    # log2 units — the f32 gradient noise floor of the NB GLM) into an
    # arbitrarily large relative figure the f64-calibrated scheme was never
    # meant to judge. Report the absolute error and the relative error over
    # genes with a non-degenerate fold-change (|log2FC| >= 0.01) alongside.
    out["max_abs_err_log2FC"] = float(
        abs(r_res.log2FoldChange - res_df.log2FoldChange).max()
    )
    nondeg = abs(r_res.log2FoldChange) >= 0.01
    out["max_rel_err_log2FC_nondegenerate"] = float(
        (
            abs(r_res.log2FoldChange - res_df.log2FoldChange)[nondeg]
            / abs(r_res.log2FoldChange)[nondeg]
        ).max()
    )
    out["pass"] = (
        out["nan_mask_pvalue_equal"]
        and out["nan_mask_padj_equal"]
        and all(v < tol for v in rels.values())
    )
    out["pass_excluding_degenerate_lfc"] = (
        out["nan_mask_pvalue_equal"]
        and out["nan_mask_padj_equal"]
        and out["max_rel_err_log2FC_nondegenerate"] < tol
        and rels["pvalue"] < tol
        and rels["padj"] < tol
    )
    return out


def fused_results_df(out: dict, contrast: np.ndarray, index) -> pd.DataFrame:
    lfc = np.asarray(out["lfc"], float)
    return pd.DataFrame(
        {
            "log2FoldChange": (lfc @ np.asarray(contrast, float)) / np.log(2),
            "stat": np.asarray(out["statistics"], float),
            "pvalue": np.asarray(out["p_values"], float),
            "padj": np.asarray(out["padj"], float),
        },
        index=index,
    )


def compare_alt(
    res_df: pd.DataFrame, r_res: pd.DataFrame, alt: str, tol: float = 0.02
) -> dict:
    """The reference's own alt-hypothesis criterion as data.

    Mirrors reference tests/test_pydeseq2.py:180-225: NaN masks equal,
    log2FC and Wald statistic within tol (lessAbs compares |stat| — R
    reports the min-tail statistic's magnitude), p-values within tol over
    the genes whose statistic is non-zero (a zero statistic means the MLE
    sits inside the [-null, null] band and the p-value is pinned to 1;
    padj is NaN-mask-checked only, as in the reference test).
    """
    stat = res_df.stat.abs() if alt == "lessAbs" else res_df.stat
    nonzero = (r_res.stat != 0) & (stat != 0)
    out = {
        "alt_hypothesis": alt,
        "nan_mask_pvalue_equal": bool((res_df.pvalue.isna() == r_res.pvalue.isna()).all()),
        "nan_mask_padj_equal": bool((res_df.padj.isna() == r_res.padj.isna()).all()),
        "tol": tol,
    }
    rels = {
        "log2FoldChange": float(
            (abs(r_res.log2FoldChange - res_df.log2FoldChange) / abs(r_res.log2FoldChange)).max()
        ),
        "stat": float((abs(r_res.stat - stat) / abs(r_res.stat)).max()),
        "pvalue_stat_nonzero": float(
            (abs(r_res.pvalue[nonzero] - res_df.pvalue[nonzero]) / r_res.pvalue[nonzero]).max()
        ),
    }
    out["max_rel_err"] = rels
    nondeg = abs(r_res.log2FoldChange) >= 0.01
    out["max_rel_err_log2FC_nondegenerate"] = float(
        (
            abs(r_res.log2FoldChange - res_df.log2FoldChange)[nondeg]
            / abs(r_res.log2FoldChange)[nondeg]
        ).max()
    )
    out["pass"] = (
        out["nan_mask_pvalue_equal"]
        and out["nan_mask_padj_equal"]
        and all(v < tol for v in rels.values())
    )
    out["pass_excluding_degenerate_lfc"] = (
        out["nan_mask_pvalue_equal"]
        and out["nan_mask_padj_equal"]
        and out["max_rel_err_log2FC_nondegenerate"] < tol
        and rels["stat"] < tol
        and rels["pvalue_stat_nonzero"] < tol
    )
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pydeseq2_tpu import DeseqDataSet, DeseqStats
    from pydeseq2_tpu.fused import summary_host_inputs, summary_pipeline
    from pydeseq2_tpu.fused_stream import run_summary_streamed
    from pydeseq2_tpu.utils import load_example_data

    device = str(jax.devices()[0])
    results: dict = {"device": device, "dtype": "float32", "beta_tol": F32_BETA_TOL}

    def staged(counts_df, metadata, design, contrast, refit_cooks=True):
        dds = DeseqDataSet(
            counts=counts_df,
            metadata=metadata,
            design=design,
            refit_cooks=refit_cooks,
            beta_tol=F32_BETA_TOL,
            quiet=True,
        )
        dds.deseq2()
        ds = DeseqStats(dds, contrast=contrast, quiet=True)
        ds.summary()
        return dds, ds

    def fused(counts_df, dds, contrast_vec, lfc_null=0.0, **knobs):
        host = summary_host_inputs(dds.obsm["design_matrix"])
        out = summary_pipeline(
            jnp.asarray(counts_df.values.T, jnp.float32),
            jnp.asarray(dds.obsm["design_matrix"].values, jnp.float32),
            jnp.asarray(np.asarray(contrast_vec), jnp.float32),
            jnp.asarray(lfc_null, jnp.float32),
            jnp.asarray(host["cooks_cutoff"], jnp.float32),
            cohort_ids=host["cohort_ids"],
            use_for_max=host["use_for_max"],
            mu_init=host["mu_init"],
            max_disp=float(max(10, counts_df.shape[0])),
            beta_tol=F32_BETA_TOL,
            **knobs,
        )
        return fused_results_df(out, contrast_vec, counts_df.columns)

    # ---- single factor ------------------------------------------------------
    counts_df = load_example_data("raw_counts")
    metadata = load_example_data("metadata")
    r_res = pd.read_csv(DATA / "single_factor" / "r_test_res.csv", index_col=0)

    t0 = time.perf_counter()
    dds, ds = staged(counts_df, metadata, "~condition", ["condition", "B", "A"])
    results["single_factor_staged"] = compare(ds.results_df, r_res, 0.02)
    results["single_factor_staged"]["wall_s"] = round(time.perf_counter() - t0, 1)

    cvec = np.array([0.0, 1.0])
    results["single_factor_fused"] = compare(fused(counts_df, dds, cvec), r_res, 0.02)

    streamed = run_summary_streamed(
        counts_df.values.T,
        dds.obsm["design_matrix"],
        cvec,
        gene_block=4,  # 10 genes -> 3 blocks with padding: exercises streaming
        max_disp=float(max(10, counts_df.shape[0])),
        beta_tol=F32_BETA_TOL,
    )
    results["single_factor_streamed"] = compare(
        fused_results_df(streamed, cvec, counts_df.columns), r_res, 0.02
    )

    # ---- apeGLM LFC shrinkage (staged + streamed) ---------------------------
    # Reference scenario: tests/test_pydeseq2.py:256-341 — R size factors /
    # dispersions / MLE LFC+SE are INJECTED so shrinkage is tested in
    # isolation; shrunk log2FoldChange within 2% of the R apeglm golden.
    r_shrunk = pd.read_csv(
        DATA / "single_factor" / "r_test_lfc_shrink_res.csv", index_col=0
    )
    r_base = pd.read_csv(DATA / "single_factor" / "r_test_res.csv", index_col=0)
    r_sf = pd.read_csv(
        DATA / "single_factor" / "r_test_size_factors.csv", index_col=0
    ).squeeze()
    r_disp = pd.read_csv(
        DATA / "single_factor" / "r_test_dispersions.csv", index_col=0
    ).squeeze()

    dds_sh = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition",
        beta_tol=F32_BETA_TOL, quiet=True,
    )
    dds_sh.deseq2()
    dds_sh.obs["size_factors"] = r_sf.values
    dds_sh.var["dispersions"] = r_disp.values
    dds_sh.varm["LFC"].iloc[:, 1] = r_base.log2FoldChange.values * np.log(2)
    ds_sh = DeseqStats(dds_sh, contrast=["condition", "B", "A"], quiet=True)
    ds_sh.summary()
    ds_sh.SE = r_base.lfcSE * np.log(2)
    ds_sh.lfc_shrink(coeff="condition[T.B]")
    rel_staged = float(
        (
            abs(r_shrunk.log2FoldChange - ds_sh.results_df.log2FoldChange)
            / abs(r_shrunk.log2FoldChange)
        ).max()
    )
    results["shrink_staged"] = {
        "tol": 0.02,
        "max_rel_err": {"log2FoldChange": rel_staged},
        "pass": rel_staged < 0.02,
        "pass_excluding_degenerate_lfc": rel_staged < 0.02,
    }

    from pydeseq2_tpu.fused_stream import run_lfc_shrink_streamed

    sh = run_lfc_shrink_streamed(
        counts_df.values.T,
        dds_sh.obsm["design_matrix"],
        1,
        r_disp.values,
        r_sf.values,
        mle_lfc=r_base.log2FoldChange.values * np.log(2),
        mle_se=r_base.lfcSE.values * np.log(2),
        adapt=True,
        gene_block=8,
    )
    shrunk_l2fc = np.asarray(sh["lfc"])[:, 1] / np.log(2)
    rel_streamed = float(
        (
            abs(r_shrunk.log2FoldChange.values - shrunk_l2fc)
            / abs(r_shrunk.log2FoldChange.values)
        ).max()
    )
    results["shrink_streamed"] = {
        "tol": 0.02,
        "max_rel_err": {"log2FoldChange": rel_streamed},
        "pass": rel_streamed < 0.02,
        "pass_excluding_degenerate_lfc": rel_streamed < 0.02,
    }

    # ---- 4 alternative hypotheses with lfc_null = +/-0.5 --------------------
    # Reference scenario: tests/test_pydeseq2.py:180-225 and
    # pydeseq2/ds.py:223-301 (summary reruns Wald with the alt hypothesis).
    # lfc_null is given in log2 units and converted to natural log like the
    # reference (ds.py:301); fused and streamed f32 paths on-device.
    for alt in ("lessAbs", "greaterAbs", "less", "greater"):
        r_alt = pd.read_csv(
            DATA / "single_factor" / f"r_test_res_{alt}.csv", index_col=0
        )
        lfc_null_log2 = -0.5 if alt == "less" else 0.5
        lfc_null_nat = float(np.log(2) * lfc_null_log2)
        results[f"alt_{alt}_fused"] = compare_alt(
            fused(counts_df, dds, cvec, lfc_null=lfc_null_nat, alt_hypothesis=alt),
            r_alt,
            alt,
        )
        streamed_alt = run_summary_streamed(
            counts_df.values.T,
            dds.obsm["design_matrix"],
            cvec,
            lfc_null_nat,
            gene_block=4,
            alt_hypothesis=alt,
            max_disp=float(max(10, counts_df.shape[0])),
            beta_tol=F32_BETA_TOL,
        )
        results[f"alt_{alt}_streamed"] = compare_alt(
            fused_results_df(streamed_alt, cvec, counts_df.columns), r_alt, alt
        )

    # ---- no independent filtering (plain BH) --------------------------------
    # Reference scenario: tests/test_pydeseq2.py:139-177 with
    # independent_filter=False (pydeseq2/ds.py:273-278 plain-BH branch).
    r_nif = pd.read_csv(
        DATA / "single_factor" / "r_test_res_no_independent_filtering.csv",
        index_col=0,
    )
    results["no_indep_filter_fused"] = compare(
        fused(counts_df, dds, cvec, independent_filter=False), r_nif, 0.02
    )
    streamed_nif = run_summary_streamed(
        counts_df.values.T,
        dds.obsm["design_matrix"],
        cvec,
        gene_block=4,
        independent_filter=False,
        max_disp=float(max(10, counts_df.shape[0])),
        beta_tol=F32_BETA_TOL,
    )
    results["no_indep_filter_streamed"] = compare(
        fused_results_df(streamed_nif, cvec, counts_df.columns), r_nif, 0.02
    )

    # ---- multifactor --------------------------------------------------------
    r_res = pd.read_csv(DATA / "multi_factor" / "r_test_res.csv", index_col=0)
    dds, ds = staged(
        counts_df, metadata, "~group + condition", ["condition", "B", "A"]
    )
    results["multifactor_staged"] = compare(ds.results_df, r_res, 0.04)
    cvec = np.array([0.0, 0.0, 1.0])
    results["multifactor_fused"] = compare(fused(counts_df, dds, cvec), r_res, 0.04)

    streamed = run_summary_streamed(
        counts_df.values.T,
        dds.obsm["design_matrix"],
        cvec,
        gene_block=4,
        refit_cooks=True,  # the reference-DEFAULT pipeline, streamed
        max_disp=float(max(10, counts_df.shape[0])),
        beta_tol=F32_BETA_TOL,
    )
    results["multifactor_streamed"] = compare(
        fused_results_df(streamed, cvec, counts_df.columns), r_res, 0.04
    )

    # ---- multifactor with injected outliers (streamed Cook's refit) ---------
    # The R-checked outlier scenario (reference tests/test_pydeseq2.py:434-509)
    # through the streamed replacement/refit flow — the fixture that actually
    # exercises refit (the clean fixture replaces nothing).
    r_out = pd.read_csv(DATA / "multi_factor" / "r_test_res_outliers.csv", index_col=0)
    counts_out = counts_df.copy()
    meta_out = metadata.copy()
    counts_out.loc["sample1", "gene1"] = 2000
    counts_out.loc["sample11", "gene7"] = 1000
    meta_out.loc["sample1", "condition"] = "C"
    dds_out = DeseqDataSet(
        counts=counts_out, metadata=meta_out, design="~group + condition",
        beta_tol=F32_BETA_TOL, quiet=True,
    )
    cvec_out = np.asarray(
        dds_out.contrast(column="condition", baseline="A", group_to_compare="B"),
        np.float32,
    )
    streamed = run_summary_streamed(
        counts_out.values.T,
        dds_out.obsm["design_matrix"],
        cvec_out,
        gene_block=4,
        refit_cooks=True,
        max_disp=float(max(10, counts_out.shape[0])),
        beta_tol=F32_BETA_TOL,
    )
    row = compare(
        fused_results_df(streamed, cvec_out, counts_out.columns), r_out, 0.04
    )
    row["refitted_genes"] = int(np.asarray(streamed["refitted"]).sum())
    results["multifactor_outliers_streamed"] = row

    # ---- run_deseq2 one-call API, reference-default refit_cooks=True --------
    # The flagship entry point on its default path (Cook's replacement +
    # refit, reference pydeseq2/dds.py:221) against the same outlier golden.
    from pydeseq2_tpu import run_deseq2

    api_res, api_state = run_deseq2(
        counts_out,
        meta_out,
        "~group + condition",
        contrast=["condition", "B", "A"],
        beta_tol=F32_BETA_TOL,
        return_state=True,
    )
    row = compare(api_res, r_out, 0.04)
    row["refitted_genes"] = int(np.asarray(api_state["refitted"]).sum())
    results["api_refit_outliers"] = row

    # ---- continuous covariate ----------------------------------------------
    counts_df = pd.read_csv(DATA / "continuous" / "test_counts.csv", index_col=0).T
    metadata = pd.read_csv(DATA / "continuous" / "test_metadata.csv", index_col=0)
    r_res = pd.read_csv(DATA / "continuous" / "r_test_res.csv", index_col=0)
    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        design="~group + condition + measurement",
        beta_tol=F32_BETA_TOL,
        quiet=True,
    )
    dds.deseq2()
    cvec = np.zeros(dds.obsm["design_matrix"].shape[1])
    cvec[-1] = 1
    ds = DeseqStats(dds, contrast=cvec, quiet=True)
    ds.summary()
    results["continuous_staged"] = compare(ds.results_df, r_res, 0.04)
    results["continuous_fused"] = compare(fused(counts_df, dds, cvec), r_res, 0.04)

    streamed = run_summary_streamed(
        counts_df.values.T,
        dds.obsm["design_matrix"],
        cvec.astype(np.float32),
        gene_block=4,
        refit_cooks=True,  # continuous metadata: mu_init resolves to "irls"
        max_disp=float(max(10, counts_df.shape[0])),
        beta_tol=F32_BETA_TOL,
    )
    results["continuous_streamed"] = compare(
        fused_results_df(streamed, cvec, counts_df.columns), r_res, 0.04
    )

    # ---- VST on-device (blind, parametric + mean; fused + streamed) --------
    # Reference scenario: tests/test_pydeseq2.py:761-803 (VST within 2% of
    # the R goldens r_vst.csv / r_mean_vst.csv); previously validated only
    # on the CPU f64 path (tests/test_vst.py).
    from pydeseq2_tpu.fused import vst_pipeline
    from pydeseq2_tpu.fused_stream import run_vst_streamed

    counts_df = load_example_data("raw_counts")
    r_vst = pd.read_csv(DATA / "single_factor" / "r_vst.csv", index_col=0).T
    r_mean_vst = pd.read_csv(
        DATA / "single_factor" / "r_mean_vst.csv", index_col=0
    ).T

    def vst_row(vst_gm: np.ndarray, golden: pd.DataFrame, tol=0.02) -> dict:
        got = np.asarray(vst_gm, float).T  # (N, G)
        rel = float((np.abs(golden.values - got) / golden.values).max())
        return {
            "tol": tol,
            "max_rel_err": {"vst_counts": rel},
            "pass": bool(np.isfinite(got).all() and rel < tol),
            "pass_excluding_degenerate_lfc": bool(
                np.isfinite(got).all() and rel < tol
            ),
        }

    counts_gm32 = jnp.asarray(counts_df.values.T, jnp.float32)
    out = vst_pipeline(counts_gm32, max_disp=float(max(10, len(counts_df))))
    results["vst_fused_parametric"] = vst_row(out["vst_counts"], r_vst)
    results["vst_fused_parametric"]["trend_used_mean"] = bool(
        np.asarray(out.get("trend_used_mean", False))
    )
    out = vst_pipeline(
        counts_gm32, trend_type="mean", max_disp=float(max(10, len(counts_df)))
    )
    results["vst_fused_mean"] = vst_row(out["vst_counts"], r_mean_vst)

    sv = run_vst_streamed(
        counts_df.values.T, gene_block=4, dtype=np.float32,
        max_disp=float(max(10, len(counts_df))),
    )
    results["vst_streamed_parametric"] = vst_row(sv["vst_counts"], r_vst)
    sv = run_vst_streamed(
        counts_df.values.T, gene_block=4, dtype=np.float32,
        trend_type="mean", max_disp=float(max(10, len(counts_df))),
    )
    results["vst_streamed_mean"] = vst_row(sv["vst_counts"], r_mean_vst)

    # ---- normalization modes on-device (poscounts in-stream + iterative) ----
    # Reference scenario: tests/test_pydeseq2.py:40-92,344-365 (poscounts /
    # iterative size factors vs the R goldens), through the streamed path and
    # the one-program device iterative solver in f32.
    from pydeseq2_tpu.ops.sizefactors import iterative_size_factors

    metadata = load_example_data("metadata")
    dds_n = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    r_sf_pos = pd.read_csv(
        DATA / "single_factor" / "r_test_size_factors_poscount.csv", index_col=0
    ).squeeze()
    streamed_pos = run_summary_streamed(
        counts_df.values.T,
        dds_n.obsm["design_matrix"],
        np.array([0.0, 1.0]),
        gene_block=4,
        sf_fit_type="poscounts",
        max_disp=float(max(10, len(counts_df))),
        beta_tol=F32_BETA_TOL,
    )
    rel = float(
        (
            np.abs(r_sf_pos.values - np.asarray(streamed_pos["size_factors"]))
            / np.abs(r_sf_pos.values)
        ).max()
    )
    results["poscounts_streamed"] = {
        "tol": 0.02,
        "max_rel_err": {"size_factors": rel},
        "pass": rel < 0.02,
        "pass_excluding_degenerate_lfc": rel < 0.02,
    }

    r_sf_it = pd.read_csv(
        DATA / "single_factor" / "r_iterative_size_factors.csv", index_col=0
    ).squeeze()
    sf_it, _ = iterative_size_factors(
        counts_gm32, max_disp=float(max(10, len(counts_df)))
    )
    rel = float(
        (np.abs(r_sf_it.values - np.asarray(sf_it)) / np.abs(r_sf_it.values)).max()
    )
    results["iterative_sf_device"] = {
        "tol": 0.02,
        "max_rel_err": {"size_factors": rel},
        "pass": rel < 0.02,
        "pass_excluding_degenerate_lfc": rel < 0.02,
    }

    # The gene-blocked execution path (lax.map tiling of every (G, N)
    # stage — the auto-picked route past ~1 GB of counts) must hit the
    # same golden on-device: a forced 4-gene tile over the 10-gene
    # fixture exercises multi-tile reductions AND a ragged last tile.
    sf_it_b, _ = iterative_size_factors(
        counts_gm32, max_disp=float(max(10, len(counts_df))), gene_block=4
    )
    rel = float(
        (np.abs(r_sf_it.values - np.asarray(sf_it_b)) / np.abs(r_sf_it.values)).max()
    )
    results["iterative_sf_device_blocked"] = {
        "tol": 0.02,
        "max_rel_err": {"size_factors": rel},
        "pass": rel < 0.02,
        "pass_excluding_degenerate_lfc": rel < 0.02,
    }

    results["all_pass"] = all(
        v["pass"] for v in results.values() if isinstance(v, dict) and "pass" in v
    )
    results["all_pass_excluding_degenerate_lfc"] = all(
        v["pass_excluding_degenerate_lfc"]
        for v in results.values()
        if isinstance(v, dict) and "pass" in v
    )
    out_path = Path(os.environ.get("TPU_CONF_OUT", str(ROOT / "TPU_CONFORMANCE.json")))
    out_path.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
