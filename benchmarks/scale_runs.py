"""North-star scale runs: streamed fused pipeline at the BASELINE.json configs.

Drives the gene-streamed summary pipeline (counts -> padj, refit_cooks=False)
at the scales the reference was never measured at:

    100  x 60,000   (north-star throughput config; measured CPU baseline exists)
    1,000 x 60,000  (TCGA scale, BASELINE.json config 4)
    10,000 x 60,000 (pseudobulk atlas scale, BASELINE.json config 5)

and merges wall-clock / genes-per-second / sanity stats into SCALE.json at the
repo root. Each config's result records the device, the gene_block used, and
the fraction of genes with finite p-values (an all-lanes-ran check).

Usage:
    python benchmarks/scale_runs.py                       # all three configs
    SCALE_CONFIGS=1000x60000 python benchmarks/scale_runs.py
    SCALE_BLOCK=4096 SCALE_REPS=2 python benchmarks/scale_runs.py

The reference baseline (BASELINE_MEASURED.json) only has 100x60000 — the CPU
backend at the two larger configs would need hours — so vs_baseline for those
is extrapolated per-gene-sample work (documented in SCALE.json as
"baseline_extrapolated": true).
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


def pick_block(n_samples: int) -> int | None:
    """None = the pipeline's memory-budget auto-pick (whole axis at small N)."""
    return None


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pydeseq2_tpu.fused_stream import run_summary_streamed

    configs = os.environ.get(
        "SCALE_CONFIGS", "100x60000,1000x60000,10000x60000"
    ).split(",")
    out_path = ROOT / "SCALE.json"
    results = json.loads(out_path.read_text()) if out_path.exists() else {}

    base_path = ROOT / "BASELINE_MEASURED.json"
    baseline = json.loads(base_path.read_text()) if base_path.exists() else {}
    # Reference CPU cost is ~linear in genes x samples over the measured range
    # (per-gene scipy work scales with N): extrapolate from the largest
    # measured config when an exact measurement is missing.
    ref_key = "100x60000"
    ref_rate = None
    if ref_key in baseline:
        n0, g0 = (int(v) for v in ref_key.split("x"))
        ref_rate = baseline[ref_key]["wall_s"] / (n0 * g0)  # s per gene-sample

    for cfg in configs:
        cfg = cfg.strip()
        n_samples, n_genes = (int(v) for v in cfg.split("x"))
        env_block = os.environ.get("SCALE_BLOCK")
        block = int(env_block) if env_block else pick_block(n_samples)
        reps = int(os.environ.get("SCALE_REPS", 2 if n_samples <= 1000 else 1))

        print(f"== {cfg} (gene_block={block}) ==", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        counts, X = make_data_chunked(n_samples, n_genes)
        gen_s = time.perf_counter() - t0
        contrast = np.array([0.0, 1.0], np.float32)

        # Time with a SINGLE scalar readback depending on every stage
        # (bench.py's convention): on a remote-dispatch backend, reading all
        # ~17 output arrays back one by one costs ~50 ms of tunnel latency
        # EACH — measured 0.8 s of pure readback on a 0.18 s program.
        import jax.numpy as jnp

        from pydeseq2_tpu.fused import summary_host_inputs
        from pydeseq2_tpu.fused_stream import summary_pipeline_streamed

        host = summary_host_inputs(X)

        def make_timed():
            """Device-resident inputs + a timed call with ONE readback."""
            padded_G = -(-n_genes // block_resolved) * block_resolved
            c = counts
            if padded_G != n_genes:
                c = np.pad(counts, ((0, padded_G - n_genes), (0, 0)))
            c_dev = jnp.asarray(c)
            x_dev = jnp.asarray(X.astype(np.float32))
            cv_dev = jnp.asarray(contrast)
            null_dev = jnp.asarray(0.0, jnp.float32)
            cut_dev = jnp.asarray(host["cooks_cutoff"], jnp.float32)
            mask_dev = jnp.asarray(np.arange(padded_G) < n_genes)

            def run_timed():
                out_d = summary_pipeline_streamed(
                    c_dev,
                    x_dev,
                    cv_dev,
                    null_dev,
                    cut_dev,
                    mask_dev,
                    gene_block=block_resolved,
                    sample_block=sample_block,
                    cohort_ids=host["cohort_ids"],
                    use_for_max=host["use_for_max"],
                    mu_init=host["mu_init"],
                    max_disp=float(max(10, n_samples)),
                    beta_tol=1e-6,
                )
                return float(jnp.nansum(out_d["padj"]) + jnp.nansum(out_d["lfc"]))

            return run_timed

        # Full host wrapper once: resolves auto blocks + materializes outputs
        # for the sanity stats (not timed).
        t0 = time.perf_counter()
        out = run_summary_streamed(
            counts,
            X,
            contrast,
            gene_block=block,
            max_disp=float(max(10, n_samples)),
            beta_tol=1e-6,
        )
        compile_s = time.perf_counter() - t0
        block_resolved = int(out["gene_block"])
        sample_block = None
        if counts.size * 4 > 1_000_000_000:
            divisors = [
                d for d in range(1, min(n_samples, 1024) + 1) if n_samples % d == 0
            ]
            sample_block = divisors[-1] if divisors[-1] > 1 else None

        run_timed = make_timed()
        run_timed()  # warm the timed call path
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run_timed()
            times.append(time.perf_counter() - t0)
        best = min(times)

        pv = out["p_values"]
        finite_frac = float(np.isfinite(pv).mean())
        padj_finite = float(np.isfinite(out["padj"]).mean())
        entry = {
            "wall_s": round(best, 3),
            "genes_per_s": round(n_genes / best, 1),
            "timing": "steady-state: counts device-resident (one-time upload "
            "and compile excluded), one scalar readback as the barrier",
            "compile_plus_first_run_s": round(compile_s, 1),
            "data_gen_s": round(gen_s, 1),
            "gene_block": int(out["gene_block"]),
            "reps": reps,
            "pvalue_finite_frac": round(finite_frac, 5),
            "padj_finite_frac": round(padj_finite, 5),
            "irls_converged_frac": round(
                float(np.asarray(out["irls_converged"], bool).mean()), 5
            ),
            "device": str(jax.devices()[0]),
            "dtype": "float32",
        }
        if cfg in baseline:
            entry["vs_baseline"] = round(baseline[cfg]["wall_s"] / best, 1)
            entry["baseline_extrapolated"] = False
        elif ref_rate is not None:
            entry["vs_baseline"] = round(ref_rate * n_samples * n_genes / best, 1)
            entry["baseline_extrapolated"] = True
        results[cfg] = entry
        out_path.write_text(json.dumps(results, indent=2) + "\n")
        print(json.dumps({cfg: entry}), flush=True)
        del out, counts

    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
