"""North-star scale runs: streamed pipelines at the BASELINE.json configs.

Drives the gene-streamed programs at the scales the reference was never
measured at:

    100  x 60,000   (north-star throughput config; measured CPU baseline exists)
    1,000 x 60,000  (TCGA scale, BASELINE.json config 4)
    10,000 x 60,000 (pseudobulk atlas scale, BASELINE.json config 5)

across four modes:

    summary  counts -> padj, refit_cooks=False (the Wald-summary subset)
    refit    counts -> padj with Cook's outlier replacement + refit — the
             reference's DEFAULT pipeline (pydeseq2/dds.py:221,1042-1064)
    shrink   apeGLM LFC shrinkage of the condition coefficient
             (pydeseq2/ds.py:363-447) from the summary outputs
    vst      blind variance-stabilizing transform (pydeseq2/dds.py:349-514)

and merges wall-clock / genes-per-second / sanity stats into SCALE.json at
the repo root (key "<cfg>" for summary, "<cfg>_<mode>" otherwise).

Usage:
    python benchmarks/scale_runs.py                       # all configs, summary
    SCALE_CONFIGS=1000x60000,10000x60000 SCALE_MODES=refit,shrink,vst \
        python benchmarks/scale_runs.py
    SCALE_BLOCK=4096 SCALE_REPS=3 python benchmarks/scale_runs.py

Reference baselines (BASELINE_MEASURED.json) are measured at 8 anchors up
to 100x60000 (genes) and 10000x2000 (samples); configs without a direct
anchor get vs_baseline from a nonneg-LS cost model fitted over ALL anchors
(wall = c0 + c1*G + c2*N + c3*N*G, in-sample within +/-7% at every anchor
with >= 10k genes or >= 5k samples — labeled "baseline_extrapolated": true
in SCALE.json). The refit/shrink/vst modes have no measured CPU stage
baseline and carry no vs_baseline.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("PYDESEQ2_TPU_NO_X64", "1")

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def make_data_chunked(n_samples: int, n_genes: int, seed: int = 0, chunk: int = 4096):
    """Gene-major synthetic NB counts, generated in chunks to bound host RAM.

    Same generative family as benchmarks/reference_baseline.py:make_data
    (lognormal base means, N(0, 0.5) LFCs, lognormal dispersions, two-level
    condition), gene-major layout so the device upload needs no transpose.
    """
    rng = np.random.default_rng(seed)
    base = rng.lognormal(3.0, 1.5, size=n_genes)
    lfc = rng.normal(0, 0.5, size=n_genes)
    cond = rng.integers(0, 2, n_samples)
    X = np.column_stack([np.ones(n_samples), cond]).astype(np.float32)
    disp = np.clip(rng.lognormal(-2.0, 1.0, size=n_genes), 1e-3, 5.0)
    counts = np.empty((n_genes, n_samples), np.float32)
    for s in range(0, n_genes, chunk):
        e = min(s + chunk, n_genes)
        mu = base[s:e, None] * np.exp(lfc[s:e, None] * cond[None, :])
        counts[s:e] = rng.negative_binomial(
            1.0 / disp[s:e, None], 1.0 / (1.0 + disp[s:e, None] * mu)
        )
    return counts, X


def _bench_reps(fn, reps):
    fn()  # warm (compile on the first config/mode, cache hit afterwards)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pydeseq2_tpu.fused import summary_host_inputs
    from pydeseq2_tpu.fused_stream import (
        lfc_shrink_pipeline_streamed,
        run_summary_streamed,
        summary_pipeline_streamed,
        vst_pipeline_streamed,
    )

    configs = os.environ.get(
        "SCALE_CONFIGS", "100x60000,1000x60000,10000x60000"
    ).split(",")
    modes = os.environ.get("SCALE_MODES", "summary").split(",")
    out_path = ROOT / "SCALE.json"
    results = json.loads(out_path.read_text()) if out_path.exists() else {}

    base_path = ROOT / "BASELINE_MEASURED.json"
    baseline = json.loads(base_path.read_text()) if base_path.exists() else {}
    # Reference CPU cost is per-gene-independent (so ~linear in G), but the
    # per-gene cost is AFFINE in N, not proportional: the scipy solvers'
    # iteration counts are N-independent and only the per-iteration
    # likelihood evaluations scale with N. Round 2 extrapolated linearly in
    # N x G; the measured 1000x10000 anchor (64.2 s vs 261 s predicted)
    # showed that overstates the reference cost ~4x at 1k samples. Fit
    # per-gene(N) = a + b*N through the two measured large-G anchors
    # (100x60000, 1000x10000); the held-out 200x30000 lands within 6%.
    # Round 4: with measured high-N anchors (10000x2000, 5000x2000,
    # 2000x10000) the model upgrades to a non-negative least-squares fit of
    # wall = c0 + c1*G + c2*N + c3*N*G over ALL measured anchors (8 as of
    # r4). In-sample error is within +/-7% at every anchor with G >= 10000
    # or N >= 5000 (the two tiny-G low-N anchors misfit because per-gene
    # fixed costs do not matter at the 60k-gene prediction configs); each
    # previous simpler model overstated the reference at high N.
    pg_model = None
    anchor_keys = sorted(baseline)
    if len(anchor_keys) >= 4:
        A, y = [], []
        for k in anchor_keys:
            n, g = (int(v) for v in k.split("x"))
            A.append([1.0, g, n, n * g])
            y.append(baseline[k]["wall_s"])
        from scipy.optimize import nnls

        coef, _ = nnls(np.asarray(A), np.asarray(y))
        pg_model = coef
        baseline_model_desc = (
            "nonneg LS of wall = c0 + c1*G + c2*N + c3*N*G on "
            f"{len(anchor_keys)} measured reference anchors "
            f"({', '.join(anchor_keys)}); in-sample within +/-7% at every "
            "anchor with G >= 10000 genes or N >= 5000 samples"
        )

    device = str(jax.devices()[0])

    for cfg in configs:
        cfg = cfg.strip()
        n_samples, n_genes = (int(v) for v in cfg.split("x"))
        env_block = os.environ.get("SCALE_BLOCK")
        block = int(env_block) if env_block else None
        reps = int(os.environ.get("SCALE_REPS", 3))

        print(f"== {cfg} (gene_block={block}) ==", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        counts, X = make_data_chunked(n_samples, n_genes)
        gen_s = time.perf_counter() - t0
        contrast = np.array([0.0, 1.0], np.float32)
        host = summary_host_inputs(X)
        max_disp = float(max(10, n_samples))

        counts_dev = jnp.asarray(counts)
        del counts
        x_dev = jnp.asarray(X.astype(np.float32))
        cv_dev = jnp.asarray(contrast)

        # Shared across modes: the full summary wrapper once (resolves the
        # auto gene_block, yields outputs for sanity stats + shrink inputs).
        t0 = time.perf_counter()
        out = run_summary_streamed(
            counts_dev, X, contrast,
            gene_block=block, max_disp=max_disp, beta_tol=1e-6,
        )
        compile_s = time.perf_counter() - t0
        block_resolved = int(out["gene_block"])
        padded_G = -(-n_genes // block_resolved) * block_resolved
        sample_block = (
            min(n_samples, 1024)
            if n_genes * n_samples * 4 > 1_000_000_000
            else None
        )
        if padded_G != n_genes:
            counts_pad = jnp.pad(counts_dev, ((0, padded_G - n_genes), (0, 0)))
        else:
            counts_pad = counts_dev
        mask_dev = jnp.asarray(np.arange(padded_G) < n_genes)
        null_dev = jnp.asarray(0.0, jnp.float32)
        cut_dev = jnp.asarray(host["cooks_cutoff"], jnp.float32)

        for mode in [m.strip() for m in modes]:
            key = cfg if mode == "summary" else f"{cfg}_{mode}"
            print(f"-- mode {mode} --", file=sys.stderr, flush=True)
            entry = {
                "device": device,
                "dtype": "float32",
                "gene_block": block_resolved,
                "data_gen_s": round(gen_s, 1),
            }

            if mode == "summary":
                # Time with a SINGLE scalar readback depending on every stage
                # (bench.py's convention): on a remote-dispatch backend,
                # reading ~17 output arrays back one by one costs ~50 ms of
                # tunnel latency EACH.
                def run_timed():
                    o = summary_pipeline_streamed(
                        counts_pad, x_dev, cv_dev, null_dev, cut_dev, mask_dev,
                        gene_block=block_resolved,
                        sample_block=sample_block,
                        cohort_ids=host["cohort_ids"],
                        use_for_max=host["use_for_max"],
                        mu_init=host["mu_init"],
                        max_disp=max_disp,
                        beta_tol=1e-6,
                    )
                    return float(jnp.nansum(o["padj"]) + jnp.nansum(o["lfc"]))

                best = _bench_reps(run_timed, reps)
                entry["timing"] = (
                    "steady-state: counts device-resident (one-time upload "
                    "and compile excluded), one scalar readback as the barrier"
                )
                entry["compile_plus_first_run_s"] = round(compile_s, 1)
                entry["pvalue_finite_frac"] = round(
                    float(np.isfinite(out["p_values"]).mean()), 5
                )
                entry["padj_finite_frac"] = round(
                    float(np.isfinite(out["padj"]).mean()), 5
                )
                entry["irls_converged_frac"] = round(
                    float(np.asarray(out["irls_converged"], bool).mean()), 5
                )
                if cfg in baseline:
                    entry["vs_baseline"] = round(baseline[cfg]["wall_s"] / best, 1)
                    entry["baseline_extrapolated"] = False
                elif pg_model is not None:
                    pred = float(
                        pg_model
                        @ np.asarray(
                            [1.0, n_genes, n_samples, n_samples * n_genes]
                        )
                    )
                    entry["vs_baseline"] = round(pred / best, 1)
                    entry["baseline_extrapolated"] = True
                    entry["baseline_model"] = baseline_model_desc

            elif mode == "refit":
                # The reference-DEFAULT pipeline: Cook's replacement + refit.
                # Timed as the full host wrapper (device-resident counts):
                # includes the readback of every per-gene result array, the
                # compacted refit program, and the host-side merge — the
                # wall a user of run_summary_streamed(refit_cooks=True) sees.
                #
                # Model-clean NB counts produce essentially no Cook's
                # outliers (a >21-sigma cell), which would time a refit
                # pass that replaces nothing. Spike ~0.2% of genes with one
                # corrupted cell each (the reference's own outlier-test
                # construction, tests/test_pydeseq2.py:437-441, at scale)
                # so the compacted refit tile demonstrably runs.
                rng = np.random.default_rng(7)
                n_spiked = max(16, n_genes // 500)
                g_idx = rng.choice(n_genes, n_spiked, replace=False)
                s_idx = rng.integers(0, n_samples, n_spiked)
                col = np.asarray(counts_dev[g_idx, s_idx])
                spiked = jnp.asarray(
                    np.maximum(col * 100.0, 2000.0), jnp.float32
                )
                counts_spk = counts_dev.at[
                    jnp.asarray(g_idx), jnp.asarray(s_idx)
                ].set(spiked)
                entry["spiked_genes_frac"] = round(n_spiked / n_genes, 5)
                last = {}

                def run_refit():
                    r = run_summary_streamed(
                        counts_spk, X, contrast,
                        gene_block=block_resolved,
                        refit_cooks=True,
                        max_disp=max_disp, beta_tol=1e-6,
                    )
                    last.update(r)

                t0 = time.perf_counter()
                run_refit()  # compile (main refit_mode pass + refit program)
                entry["compile_plus_first_run_s"] = round(
                    time.perf_counter() - t0, 1
                )
                best = _bench_reps(run_refit, reps)
                entry["timing"] = (
                    "full run_summary_streamed(refit_cooks=True) wall, "
                    "counts device-resident: includes per-gene result "
                    "readbacks, the compacted refit program and host merge"
                )
                entry["replaced_frac"] = round(
                    float(np.asarray(last["replaced"]).mean()), 5
                )
                entry["refitted_frac"] = round(
                    float(np.asarray(last["refitted"]).mean()), 5
                )
                entry["pvalue_finite_frac"] = round(
                    float(np.isfinite(last["p_values"]).mean()), 5
                )
                entry["padj_finite_frac"] = round(
                    float(np.isfinite(last["padj"]).mean()), 5
                )
                del counts_spk, run_refit, last  # free the spiked copy

            elif mode == "shrink":
                disp = np.asarray(out["dispersions"], np.float32)
                ok = np.isfinite(disp) & (disp > 0)
                size = np.ones(padded_G, np.float32)
                size[:n_genes][ok] = 1.0 / disp[ok]
                smask = mask_dev & jnp.asarray(
                    np.pad(ok, (0, padded_G - n_genes))
                )
                size_dev = jnp.asarray(size)
                logsf_dev = jnp.log(
                    jnp.asarray(out["size_factors"], jnp.float32)
                )
                from pydeseq2_tpu.models.stats import _apeglm_prior_variance

                mle_lfc = np.asarray(out["lfc"], float)[:, 1]
                mle_se = np.asarray(out["se"], float)
                sel = np.isfinite(mle_lfc) & np.isfinite(mle_se)
                prior_var = _apeglm_prior_variance(mle_lfc[sel], mle_se[sel])
                ps_dev = jnp.asarray(
                    min(float(np.sqrt(prior_var)), 1.0), jnp.float32
                )

                def run_shrink():
                    o = lfc_shrink_pipeline_streamed(
                        counts_pad, size_dev, logsf_dev, x_dev, ps_dev, smask,
                        gene_block=block_resolved, shrink_index=1,
                    )
                    return float(jnp.nansum(o["lfc"]) + jnp.nansum(o["se"]))

                best = _bench_reps(run_shrink, reps)
                entry["timing"] = (
                    "steady-state apeGLM shrink program (prior fitted from "
                    "pass-1 MLEs host-side, untimed), one scalar readback"
                )
                o = lfc_shrink_pipeline_streamed(
                    counts_pad, size_dev, logsf_dev, x_dev, ps_dev, smask,
                    gene_block=block_resolved, shrink_index=1,
                )
                lf = np.asarray(o["lfc"])[:n_genes, 1]
                entry["shrunk_lfc_finite_frac"] = round(
                    float(np.isfinite(lf)[ok].mean()), 5
                )
                entry["shrink_converged_frac"] = round(
                    float(np.asarray(o["converged"])[:n_genes][ok].mean()), 5
                )

            elif mode == "vst":

                def run_vst():
                    o = vst_pipeline_streamed(
                        counts_pad, mask_dev,
                        gene_block=block_resolved,
                        sample_block=sample_block,
                        max_disp=max_disp,
                    )
                    return float(jnp.nansum(o["vst_counts"][:, 0]))

                best = _bench_reps(run_vst, reps)
                entry["timing"] = (
                    "steady-state blind-VST program, device-resident counts, "
                    "one scalar-column readback as the barrier "
                    "(the (G, N) transform stays on device)"
                )
                o = vst_pipeline_streamed(
                    counts_pad, mask_dev,
                    gene_block=block_resolved,
                    sample_block=sample_block,
                    max_disp=max_disp,
                )
                col = np.asarray(o["vst_counts"][:n_genes, 0])
                entry["vst_finite_frac"] = round(float(np.isfinite(col).mean()), 5)
                entry["trend_used_mean"] = bool(np.asarray(o["trend_used_mean"]))

            else:
                raise SystemExit(f"unknown mode {mode!r}")

            entry["wall_s"] = round(best, 3)
            entry["genes_per_s"] = round(n_genes / best, 1)
            entry["reps"] = reps
            results[key] = entry
            out_path.write_text(json.dumps(results, indent=2) + "\n")
            print(json.dumps({key: entry}), flush=True)

        del out, counts_dev, counts_pad

    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
