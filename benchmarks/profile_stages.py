"""Per-stage TPU timing of the fused pipeline's component kernels.

Times each batched kernel separately (steady-state, host-readback barrier)
so optimization targets the real hot spot.

Usage: python benchmarks/profile_stages.py  (BENCH_SAMPLES/BENCH_GENES knobs)
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
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from pydeseq2_tpu.ops.dispersion import alpha_mle_batch
    from pydeseq2_tpu.ops.irls import hat_diagonals, irls_beta_init, irls_core
    from pydeseq2_tpu.ops.linreg import (
        fit_lin_mu_batch,
        fit_moments_dispersions_batch,
        fit_rough_dispersions_batch,
    )
    from pydeseq2_tpu.ops.wald import wald_test_batch
    from pydeseq2_tpu.fused import wald_pipeline, _size_factors

    N = int(os.environ.get("BENCH_SAMPLES", 100))
    G = int(os.environ.get("BENCH_GENES", 10_000))
    counts_np, design_np = make_data(N, G)
    dtype = jnp.float32

    counts = jnp.asarray(counts_np.T, dtype)
    X = jnp.asarray(design_np, dtype)
    contrast = jnp.asarray(np.eye(design_np.shape[1])[-1], dtype)
    P = X.shape[1]
    mask = jnp.ones((G,), bool)

    sf, _ = _size_factors(counts, mask)
    normed = counts / sf[None, :]
    mom = jnp.clip(
        jnp.minimum(
            fit_rough_dispersions_batch(normed, X),
            fit_moments_dispersions_batch(normed, sf),
        ),
        1e-8,
        float(max(10, N)),
    )
    mu_hat = fit_lin_mu_batch(counts, sf, X, 0.5)
    max_disp = float(max(10, N))

    def rd(x):
        return float(jnp.nansum(x))

    rows = []

    rows.append(("size_factors+normed", timeit(lambda: rd(_size_factors(counts, mask)[0]))))
    rows.append(("mom_dispersions", timeit(lambda: rd(
        jnp.minimum(fit_rough_dispersions_batch(normed, X),
                    fit_moments_dispersions_batch(normed, sf))))))
    rows.append(("lin_mu_init", timeit(lambda: rd(fit_lin_mu_batch(counts, sf, X, 0.5)))))
    rows.append(("alpha_mle_genewise", timeit(lambda: rd(
        alpha_mle_batch(counts, X, mu_hat, mom, 1e-8, max_disp,
                        cr_reg=True, prior_reg=False)[0]))))
    rows.append(("alpha_mle_map", timeit(lambda: rd(
        alpha_mle_batch(counts, X, mu_hat, mom, 1e-8, max_disp,
                        prior_disp_var=0.5, cr_reg=True, prior_reg=True)[0]))))

    disp, _ = alpha_mle_batch(counts, X, mu_hat, mom, 1e-8, max_disp)
    beta_init = irls_beta_init(counts, sf, X)

    def irls_run():
        beta, needs_fb, conv = irls_core(counts, sf, X, disp, beta_init,
                                         min_mu=0.5, beta_tol=1e-6)
        return rd(beta)

    rows.append(("irls_beta_init", timeit(lambda: rd(irls_beta_init(counts, sf, X)))))
    rows.append(("irls_core", timeit(irls_run)))
    beta, _, _ = irls_core(counts, sf, X, disp, beta_init, min_mu=0.5, beta_tol=1e-6)
    rows.append(("hat_diagonals", timeit(lambda: rd(
        hat_diagonals(counts, sf, X, disp, beta, min_mu=0.5)[0]))))
    H, mu = hat_diagonals(counts, sf, X, disp, beta, min_mu=0.5)
    ridge = 1e-6 * jnp.eye(P, dtype=dtype)
    rows.append(("wald_test", timeit(lambda: rd(
        wald_test_batch(X, disp, beta, mu, ridge, contrast,
                        jnp.asarray(0.0, dtype), None)[0]))))

    # apeGLM shrinkage kernel (the lfc_shrink hot loop) at full gene width.
    from pydeseq2_tpu.fused import vst_pipeline
    from pydeseq2_tpu.ops.shrink import nbinom_glm_batch

    offset = jnp.log(sf)  # (N,) log normalization, replicated over genes
    size = 1.0 / disp
    rows.append(("apeglm_shrink (nbinomGLM)", timeit(lambda: rd(
        nbinom_glm_batch(X, counts, size, offset, 15.0, 1.0)[0]))))
    rows.append(("FULL vst_pipeline (blind)", timeit(lambda: rd(
        vst_pipeline(counts, max_disp=max_disp)["vst_counts"]))))
    rows.append(("FULL wald_pipeline", timeit(lambda: rd(
        wald_pipeline(counts, X, contrast, jnp.asarray(0.0, dtype),
                      max_disp=max_disp, beta_tol=1e-6)["p_values"]))))

    print(f"# device={jax.devices()[0]} G={G} N={N} P={P}")
    for name, t in rows:
        print(f"{name:32s} {t*1e3:10.2f} ms")


if __name__ == "__main__":
    main()
