"""Benchmark: fused DESeq2 Wald pipeline throughput on the available device.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

- metric: genes/sec through the full fused Wald pipeline (size factors ->
  genewise dispersion MLE -> trend -> prior -> MAP dispersions -> IRLS LFCs ->
  Wald tests) on a synthetic single-factor dataset.
- vs_baseline: speedup over the measured reference PyDESeq2 CPU wall-clock on
  this host for the same config (see benchmarks/reference_baseline.py and
  BASELINE_MEASURED.json; the reference repo publishes no numbers of its own,
  see BASELINE.md).

Env knobs: BENCH_SAMPLES (100), BENCH_GENES (60000 - the BASELINE.json
north-star throughput config), BENCH_DTYPE (float32|float64, default float32 -
validated against f64 golden results in tests), BENCH_REPS (3), BENCH_STAGES
(1 = also time each component kernel separately and print the split to
stderr; 0 to skip).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

# The TPU compiler aborts on x64-typed programs (f64 is CPU-emulation only),
# so only enable x64 for explicit float64 runs. Must happen before the
# pydeseq2_tpu import below (which flips jax_enable_x64 unless told not to).
if os.environ.get("BENCH_DTYPE", "float32") != "float64":
    os.environ["PYDESEQ2_TPU_NO_X64"] = "1"


def main() -> None:
    n_samples = int(os.environ.get("BENCH_SAMPLES", 100))
    n_genes = int(os.environ.get("BENCH_GENES", 60_000))
    dtype_name = os.environ.get("BENCH_DTYPE", "float32")
    reps = int(os.environ.get("BENCH_REPS", 3))
    with_stages = os.environ.get("BENCH_STAGES", "1") == "1"

    import jax
    import jax.numpy as jnp

    from pydeseq2_tpu.fused import wald_pipeline

    dtype = jnp.float64 if dtype_name == "float64" else jnp.float32

    # Same generator as the reference baseline driver so configs align.
    sys.path.insert(0, str(Path(__file__).resolve().parent / "benchmarks"))
    from reference_baseline import make_data

    counts, design = make_data(n_samples, n_genes)
    contrast = np.zeros(design.shape[1])
    contrast[-1] = 1.0

    counts_d = jnp.asarray(counts.T, dtype=dtype)  # gene-major (G, N)
    design_d = jnp.asarray(design, dtype=dtype)
    contrast_d = jnp.asarray(contrast, dtype=dtype)
    lfc_null = jnp.asarray(0.0, dtype)

    # f32 deviance differences bottom out around 1e-7, so the IRLS stopping
    # ratio must sit above the noise floor (f64 uses the reference 1e-8).
    beta_tol = 1e-8 if dtype == jnp.float64 else 1e-6

    def run():
        out = wald_pipeline(
            counts_d,
            design_d,
            contrast_d,
            lfc_null,
            max_disp=float(max(10, n_samples)),
            beta_tol=beta_tol,
        )
        # block_until_ready is not a reliable barrier on remote-dispatch
        # backends; a small host readback of a value depending on every
        # pipeline stage is.
        checksum = float(jnp.nansum(out["p_values"]) + jnp.nansum(out["lfc"]))
        return out, checksum

    t_compile0 = time.perf_counter()
    run()  # compile + first run
    compile_s = time.perf_counter() - t_compile0

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    genes_per_s = n_genes / best

    key = f"{n_samples}x{n_genes}"
    vs_baseline = float("nan")
    baseline_path = Path(__file__).resolve().parent / "BASELINE_MEASURED.json"
    if baseline_path.exists():
        data = json.loads(baseline_path.read_text())
        if key in data:
            vs_baseline = data[key]["wall_s"] / best

    print(
        json.dumps(
            {
                "metric": f"fused Wald pipeline genes/sec ({key}, {dtype_name}, "
                f"{jax.devices()[0].platform})",
                "value": round(genes_per_s, 2),
                "unit": "genes/s",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline == vs_baseline else None,
            }
        )
    )
    print(
        f"# wall={best:.3f}s compile={compile_s:.1f}s reps={times} "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )

    if with_stages:
        # Per-stage split: each component kernel timed as its own program
        # (steady-state, one host-readback barrier each). Stage sum exceeds
        # the fused wall because the fused program deduplicates shared work
        # (mu rebuilds, normed counts) and XLA fuses across stage boundaries.
        try:
            _stage_split(counts_d, design_d, contrast_d, n_samples, dtype)
        except Exception as e:  # never let diagnostics break the bench line
            print(f"# stage split failed: {e!r}", file=sys.stderr)


def _stage_split(counts, X, contrast, n_samples, dtype) -> None:
    import jax
    import jax.numpy as jnp

    from pydeseq2_tpu.fused import _size_factors
    from pydeseq2_tpu.ops.dispersion import alpha_mle_batch
    from pydeseq2_tpu.ops.irls import hat_diagonals, irls_beta_init, irls_core
    from pydeseq2_tpu.ops.linreg import (
        fit_lin_mu_batch,
        fit_moments_dispersions_batch,
        fit_rough_dispersions_batch,
    )
    from pydeseq2_tpu.ops.wald import wald_test_batch

    G, N = counts.shape
    P = X.shape[1]
    mask = jnp.ones((G,), bool)
    max_disp = float(max(10, n_samples))
    beta_tol = 1e-8 if dtype == jnp.float64 else 1e-6

    print(
        "# stage split: standalone-program timings with per-program dispatch; "
        "stages intentionally sum to MORE than the fused wall (the fused "
        "program dedups shared work and fuses across stage boundaries)",
        file=sys.stderr,
    )

    def timed(label, fn):
        fn()  # compile
        t0 = time.perf_counter()
        checksum = fn()  # one steady-state rep w/ host readback inside fn
        dt = time.perf_counter() - t0
        print(f"# stage {label:24s} {dt * 1e3:9.2f} ms", file=sys.stderr)
        return checksum

    rd = lambda x: float(jnp.nansum(x))

    # jit the stage: eagerly the select bisection dispatches ~32 per-op
    # round-trips through the remote tunnel (~1.3 s of pure latency for
    # <2 ms of compute).
    sf_fn = jax.jit(lambda c: _size_factors(c, mask)[0])
    sf = sf_fn(counts)
    normed = counts / sf[None, :]
    timed("size_factors", lambda: rd(sf_fn(counts)))
    mom = jnp.clip(
        jnp.minimum(
            fit_rough_dispersions_batch(normed, X),
            fit_moments_dispersions_batch(normed, sf),
        ),
        1e-8,
        max_disp,
    )
    timed(
        "mom_dispersions",
        lambda: rd(
            jnp.minimum(
                fit_rough_dispersions_batch(normed, X),
                fit_moments_dispersions_batch(normed, sf),
            )
        ),
    )
    mu_hat = fit_lin_mu_batch(counts, sf, X, 0.5)
    timed("mu_init(linear)", lambda: rd(fit_lin_mu_batch(counts, sf, X, 0.5)))
    timed(
        "genewise_dispersions",
        lambda: rd(
            alpha_mle_batch(
                counts, X, mu_hat, mom, 1e-8, max_disp, cr_reg=True, prior_reg=False
            )[0]
        ),
    )
    disp, _ = alpha_mle_batch(counts, X, mu_hat, mom, 1e-8, max_disp)
    timed(
        "map_dispersions",
        lambda: rd(
            alpha_mle_batch(
                counts,
                X,
                mu_hat,
                disp,
                1e-8,
                max_disp,
                prior_disp_var=0.5,
                cr_reg=True,
                prior_reg=True,
            )[0]
        ),
    )
    beta_init = irls_beta_init(counts, sf, X)
    timed("irls_beta_init", lambda: rd(irls_beta_init(counts, sf, X)))
    timed(
        "irls_core",
        lambda: rd(
            irls_core(counts, sf, X, disp, beta_init, min_mu=0.5, beta_tol=beta_tol)[0]
        ),
    )
    beta, _, _ = irls_core(counts, sf, X, disp, beta_init, min_mu=0.5, beta_tol=beta_tol)
    timed(
        "hat_diagonals",
        lambda: rd(hat_diagonals(counts, sf, X, disp, beta, min_mu=0.5)[0]),
    )
    H, mu = hat_diagonals(counts, sf, X, disp, beta, min_mu=0.5)
    ridge = 1e-6 * jnp.eye(P, dtype=dtype)
    timed(
        "wald_test",
        lambda: rd(
            wald_test_batch(
                X, disp, beta, mu, ridge, contrast, jnp.asarray(0.0, dtype), None
            )[0]
        ),
    )


if __name__ == "__main__":
    main()
