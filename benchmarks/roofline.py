"""Roofline / MFU estimate for the fused pipeline on the current device.

Uses XLA's own compiled-program cost model (``compiled.cost_analysis()``:
flop count and bytes accessed) plus the measured steady-state wall time to
place the fused Wald pipeline on the roofline of the device:

- achieved FLOP/s vs the chip's matmul peak,
- achieved HBM bytes/s vs the chip's memory bandwidth.

The DESeq2 pipeline is not a matmul workload: the design matrices are tiny
(P <= ~8), so the MXU share of the FLOPs is negligible and the program lives
on the VPU (transcendentals: exp/log/lgamma in the NB likelihood scans) and
HBM. The meaningful roofline bound is therefore bandwidth; FLOP/s vs MXU
peak is reported for completeness, not as "MFU" in the LLM sense.

Peaks used for TPU v5e (v5 lite), from public spec sheets: 197 TFLOP/s bf16
matmul peak and 819 GB/s HBM bandwidth. Writes ROOFLINE.json.

Usage: python benchmarks/roofline.py  (BENCH_SAMPLES/BENCH_GENES knobs)
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
sys.path.insert(0, str(Path(__file__).resolve().parent))

from reference_baseline import make_data  # noqa: E402

V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pydeseq2_tpu.fused import wald_pipeline

    N = int(os.environ.get("BENCH_SAMPLES", 100))
    G = int(os.environ.get("BENCH_GENES", 60_000))
    counts_np, design_np = make_data(N, G)
    dtype = jnp.float32
    counts = jnp.asarray(counts_np.T, dtype)
    X = jnp.asarray(design_np, dtype)
    contrast = jnp.asarray(np.eye(design_np.shape[1])[-1], dtype)

    def fn(c, Xd, cv):
        return wald_pipeline(
            c, Xd, cv, jnp.asarray(0.0, dtype), max_disp=float(max(10, N)),
            beta_tol=1e-6,
        )

    lowered = jax.jit(fn).lower(counts, X, contrast)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", float("nan")))
    xla_bytes = float(cost.get("bytes accessed", float("nan")))

    out = compiled(counts, X, contrast)
    float(jnp.nansum(out["p_values"]))  # readback barrier
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = compiled(counts, X, contrast)
        float(jnp.nansum(out["p_values"]))
        times.append(time.perf_counter() - t0)
    wall = min(times)

    result = {
        "config": f"{N}x{G} f32 fused wald_pipeline",
        "device": str(jax.devices()[0]),
        "wall_s": round(wall, 4),
        "genes_per_s": round(G / wall, 1),
        "xla_flops": flops,
        "xla_bytes_accessed": xla_bytes,
        "achieved_tflops": round(flops / wall / 1e12, 3),
        "achieved_gbytes_per_s": round(xla_bytes / wall / 1e9, 1),
        "pct_of_v5e_bf16_matmul_peak": round(
            100 * flops / wall / V5E_PEAK_BF16_FLOPS, 2
        ),
        "pct_of_v5e_hbm_bandwidth": round(
            100 * (xla_bytes / wall) / V5E_HBM_BYTES_PER_S, 1
        ),
        "note": "XLA 'bytes accessed' counts logical operand traffic; actual "
        "HBM traffic is lower after fusion, so pct_of_hbm is an upper bound "
        "on bandwidth pressure. Iteration counts of the while_loop solvers "
        "are data-dependent; XLA's flop count assumes one trip, so "
        "achieved_tflops understates real arithmetic.",
    }
    (ROOT / "ROOFLINE.json").write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
