"""Isolate the cost of the in-program IRLS rescue on TPU.

Times the fused Wald pipeline (a) as shipped (lax.cond rescue), (b) with the
rescue monkeypatched out, and reports how many lanes were flagged — to tell
whether a slowdown is the cond branch actually firing or a compilation
artifact of the conditional itself.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("PYDESEQ2_TPU_NO_X64", "1")

import sys
from pathlib import Path

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
    from pydeseq2_tpu.ops import irls as irls_ops

    N = int(os.environ.get("BENCH_SAMPLES", 100))
    G = int(os.environ.get("BENCH_GENES", 10_000))
    counts_np, design_np = make_data(N, G)
    dtype = jnp.float32
    counts = jnp.asarray(counts_np.T, dtype)
    X = jnp.asarray(design_np, dtype)
    contrast = jnp.asarray(np.eye(design_np.shape[1])[-1], dtype)

    def run(tag):
        # No readback here: the timed lambdas below do exactly one host
        # readback each so the with/without comparison is unbiased.
        return fused.wald_pipeline(
            counts, X, contrast, jnp.asarray(0.0, dtype),
            max_disp=float(max(10, N)), beta_tol=1e-6,
        )

    out = run("warm")
    conv = np.asarray(out["irls_converged"])
    print(f"# irls_converged: {conv.sum()}/{conv.size}")
    t_with = timeit(lambda: float(jnp.nansum(run("t")["p_values"])))
    print(f"with rescue    : {t_with*1e3:9.2f} ms")

    # Monkeypatch the rescue away and retrace under a fresh jit wrapper.
    def no_rescue(counts, sf, X, disp, beta_init, min_mu, beta_tol):
        beta, needs_fb, convd = irls_ops.irls_core(
            counts, sf, X, disp, beta_init, min_mu=min_mu, beta_tol=beta_tol
        )
        return beta, convd, jnp.asarray(0, jnp.int32)

    fused._irls_with_rescue = no_rescue
    import functools

    plain = functools.partial(
        jax.jit,
        static_argnames=(
            "min_mu", "min_disp", "max_disp", "beta_tol", "trend_type",
            "trend_rounds", "alt_hypothesis", "mu_init",
        ),
    )(
        lambda *a, **k: {
            k2: v
            for k2, v in fused._wald_impl(*a, **k).items()
            if not k2.startswith("_")
        }
    )

    def run2():
        out = plain(
            counts, X, contrast, jnp.asarray(0.0, dtype),
            max_disp=float(max(10, N)), beta_tol=1e-6,
        )
        return float(jnp.nansum(out["p_values"]))

    t_without = timeit(run2)
    print(f"without rescue : {t_without*1e3:9.2f} ms")
    print(f"# device={jax.devices()[0]} G={G} N={N}")


if __name__ == "__main__":
    main()
