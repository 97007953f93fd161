"""Standalone timing probe for the dispersion solver (genewise + MAP).

Times alpha_mle_batch on a synthetic (G, N) tile in f32 on the current
device, with the coarse-cache MAP reuse — the configuration the fused
pipeline runs. One scalar readback per measurement (remote-tunnel rule).

Usage: python benchmarks/probe_dispersion.py [G] [N]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("PYDESEQ2_TPU_NO_X64", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pydeseq2_tpu.ops.dispersion import alpha_mle_batch  # noqa: E402


def timeit(fn, reps=3):
    fn()  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    base = rng.lognormal(3.0, 1.5, size=G)
    disp = np.clip(rng.lognormal(-2.0, 1.0, size=G), 1e-3, 5.0)
    mu = np.broadcast_to(base[:, None], (G, N)).copy()
    counts = rng.negative_binomial(
        1 / disp[:, None], 1 / (1 + disp[:, None] * mu)
    ).astype(np.float32)
    X = np.ones((N, 2), np.float32)
    X[:, 1] = rng.integers(0, 2, N)

    counts_d = jnp.asarray(counts, dtype)
    mu_d = jnp.asarray(mu, dtype)
    X_d = jnp.asarray(X, dtype)
    ah = jnp.asarray(np.clip(disp, 1e-8, 10.0), dtype)
    max_disp = float(max(10, N))

    @jax.jit
    def genewise(c, X, m, a):
        alpha, conv, coarse = alpha_mle_batch(
            c, X, m, a, 1e-8, max_disp, cr_reg=True, return_coarse=True
        )
        return alpha.sum(), conv.sum(), coarse

    @jax.jit
    def map_fit(c, X, m, a, cache):
        alpha, conv = alpha_mle_batch(
            c, X, m, a, 1e-8, max_disp,
            prior_disp_var=0.5, cr_reg=True, prior_reg=True,
            coarse_cache=cache,
        )
        return alpha.sum(), conv.sum()

    t0 = time.perf_counter()
    s, cv, cache = genewise(counts_d, X_d, mu_d, ah)
    float(s)
    compile_gw = time.perf_counter() - t0

    tg = timeit(lambda: float(genewise(counts_d, X_d, mu_d, ah)[0]))

    t0 = time.perf_counter()
    float(map_fit(counts_d, X_d, mu_d, ah, cache)[0])
    compile_map = time.perf_counter() - t0
    tm = timeit(lambda: float(map_fit(counts_d, X_d, mu_d, ah, cache)[0]))

    print(
        f"# device={jax.devices()[0]} G={G} N={N} "
        f"compile gw={compile_gw:.1f}s map={compile_map:.1f}s"
    )
    print(f"genewise   {tg*1e3:9.2f} ms   conv={float(cv)/G:.3f}")
    print(f"map        {tm*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
