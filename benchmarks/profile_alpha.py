"""Micro-profile of alpha_mle_batch: grid scans vs Newton polish cost.

Times the solver at different (grid_length, newton_iters) settings to guide
tuning. Usage: python benchmarks/profile_alpha.py (BENCH_GENES/BENCH_SAMPLES).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("PYDESEQ2_TPU_NO_X64", "1")

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from reference_baseline import make_data


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pydeseq2_tpu.ops.dispersion import alpha_mle_batch
    from pydeseq2_tpu.ops.linreg import (
        fit_lin_mu_batch,
        fit_moments_dispersions_batch,
        fit_rough_dispersions_batch,
    )
    from pydeseq2_tpu.fused import _size_factors

    N = int(os.environ.get("BENCH_SAMPLES", 100))
    G = int(os.environ.get("BENCH_GENES", 60_000))
    counts_np, design_np = make_data(N, G)
    dtype = jnp.float32
    counts = jnp.asarray(counts_np.T, dtype)
    X = jnp.asarray(design_np, dtype)
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
    mu = fit_lin_mu_batch(counts, sf, X, 0.5)
    max_disp = float(max(10, N))

    def run(gl, ni):
        a, _ = alpha_mle_batch(
            counts, X, mu, mom, 1e-8, max_disp, cr_reg=True, prior_reg=False,
            grid_length=gl, newton_iters=ni,
        )
        return np.asarray(a)

    ref = run(48, 8)
    print(f"# device={jax.devices()[0]} G={G} N={N}")
    for gl, ni in [(48, 8), (48, 0), (48, 4), (32, 4), (24, 4), (32, 6)]:
        run(gl, ni)  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            a = run(gl, ni)
            ts.append(time.perf_counter() - t0)
        rel = np.abs(np.log(a) - np.log(ref))
        print(
            f"grid={gl:3d} newton={ni}  {min(ts)*1e3:8.2f} ms  "
            f"max|dlog alpha|={rel.max():.4g}  p99={np.quantile(rel, 0.99):.4g}"
        )


if __name__ == "__main__":
    main()
