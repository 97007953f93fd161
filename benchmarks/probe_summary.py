"""Isolate where the summary pipeline spends time beyond the Wald pipeline.

The monolithic wald_pipeline at 100x60k runs in ~0.12 s; the streamed summary
(same stages + Cook's flags + padj) measured ~1.0 s even as a single block.
This probe times the candidates: the monolithic summary program, the streamed
program with/without the stats layer, the batched padj program, and the two
size-factor implementations.

Usage: python benchmarks/probe_summary.py  (BENCH_SAMPLES/BENCH_GENES knobs)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("PYDESEQ2_TPU_NO_X64", "1")

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from reference_baseline import make_data


def timeit(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from pydeseq2_tpu import fused
    from pydeseq2_tpu.fused_stream import (
        _streamed_size_factors,
        summary_pipeline_streamed,
    )

    N = int(os.environ.get("BENCH_SAMPLES", 100))
    G = int(os.environ.get("BENCH_GENES", 60_000))
    counts_np, design_np = make_data(N, G)
    dtype = jnp.float32
    counts = jnp.asarray(counts_np.T, dtype)
    X = jnp.asarray(design_np, dtype)
    contrast = jnp.asarray(np.eye(design_np.shape[1])[-1], dtype)
    host = fused.summary_host_inputs(design_np)
    mask = jnp.ones((G,), bool)
    zero = jnp.asarray(0.0, dtype)
    cutoff = jnp.asarray(host["cooks_cutoff"], dtype)

    def rd(x):
        return float(jnp.nansum(x))

    rows = []
    rows.append(("wald_pipeline (monolithic)", timeit(lambda: rd(
        fused.wald_pipeline(counts, X, contrast, zero,
                            max_disp=float(max(10, N)), beta_tol=1e-6,
                            mu_init=host["mu_init"])["p_values"]))))
    rows.append(("summary_pipeline (monolithic)", timeit(lambda: rd(
        fused.summary_pipeline(counts, X, contrast, zero, cutoff,
                               cohort_ids=host["cohort_ids"],
                               use_for_max=host["use_for_max"],
                               mu_init=host["mu_init"],
                               max_disp=float(max(10, N)),
                               beta_tol=1e-6)["padj"]))))

    common = dict(
        cohort_ids=host["cohort_ids"], use_for_max=host["use_for_max"],
        mu_init=host["mu_init"], max_disp=float(max(10, N)), beta_tol=1e-6,
        gene_block=G,
    )
    rows.append(("streamed 1-block, stats_layer=False", timeit(lambda: rd(
        summary_pipeline_streamed(counts, X, contrast, zero, cutoff, mask,
                                  stats_layer=False, **common)["p_values"]))))
    rows.append(("streamed 1-block, full summary", timeit(lambda: rd(
        summary_pipeline_streamed(counts, X, contrast, zero, cutoff, mask,
                                  **common)["padj"]))))

    # Components
    out = fused.wald_pipeline(counts, X, contrast, zero,
                              max_disp=float(max(10, N)), beta_tol=1e-6,
                              mu_init=host["mu_init"])
    pv, bm = out["p_values"], out["base_mean"]
    # NOTE: device_padj is not a jitted entry point, so this row measures
    # EAGER per-op dispatch (dozens of tunnel round-trips on a remote
    # backend: 732 ms standalone vs <70 ms of actual compute inside the
    # jitted summary program). Keep for the dispatch-latency datum.
    rows.append(("device_padj (EAGER dispatch)", timeit(lambda: rd(
        fused.device_padj(pv, bm, mask, 0.05, True)))))
    logmeans = jnp.log(counts).mean(axis=1)
    rows.append(("streamed size factors (full sort)", timeit(lambda: rd(
        _streamed_size_factors(counts, mask, logmeans)))))
    rows.append(("fused _size_factors", timeit(lambda: rd(
        fused._size_factors(counts, mask)[0]))))

    print(f"# device={jax.devices()[0]} G={G} N={N}")
    for name, t in rows:
        print(f"{name:38s} {t * 1e3:9.2f} ms")


if __name__ == "__main__":
    main()
