"""Trip-count-aware roofline of the fused pipeline on the current device.

v2 (round 3): the v1 artifact placed the whole program on the roofline with
XLA's one-trip cost model and could not say what actually bounds the 92 ms
wall. This version measures:

1. **Per-stage wall attribution summing to the full wall** — each stage is
   timed as a *prefix program*: ``jit`` of ``_wald_impl`` returning only that
   stage's output, so XLA dead-code-eliminates everything downstream. The
   difference between consecutive prefixes is the stage's marginal wall; the
   telescoping sum equals the full program's wall by construction (up to
   cross-stage fusion, which the residual row makes visible).

2. **Measured while-loop trip counts** — the two data-dependent loops
   (IRLS ``lax.while_loop``, trend exclusion ``lax.while_loop``) are rerun
   standalone on the *same inputs* the fused program produces, with
   ``return_iters``/``return_rounds`` instrumentation. Dispersion solves are
   static-trip by design (defaults from ops/dispersion.py: 32-point coarse
   scan + 4-step Newton-only polish; the MAP fit reuses the coarse cache:
   0 + 4).

3. **Trip-corrected stage rooflines** — XLA's cost model counts a while
   body once; multiplying a loop stage's marginal flops/bytes by its
   measured trip count gives the effective arithmetic/traffic rate for that
   stage, which is what decides compute- vs bandwidth- vs latency-bound.

Peaks used for TPU v5e (v5 lite), from public spec sheets: 197 TFLOP/s bf16
matmul peak and 819 GB/s HBM bandwidth. The DESeq2 pipeline is not a matmul
workload (P <= 8 designs live on the VPU + HBM), so the bandwidth ceiling is
the meaningful one. Writes ROOFLINE.json.

Usage: python benchmarks/roofline.py  (BENCH_SAMPLES/BENCH_GENES knobs)
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

os.environ.setdefault("PYDESEQ2_TPU_NO_X64", "1")

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from reference_baseline import make_data  # noqa: E402

V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9

# Prefix boundaries: output key of _wald_impl (or summary_pipeline for the
# stats layer) that forces computation up to and including the stage.
STAGES = [
    ("size_factors", "size_factors"),
    ("mom_disp", "_mom"),
    ("mu_init", "_mu_hat"),
    ("genewise_disp", "genewise_dispersions"),  # grid scan + Newton polish
    ("trend", "fitted_dispersions"),
    ("prior", "prior_disp_var"),
    ("map_disp", "dispersions"),
    ("irls_lfc", "lfc"),
    ("wald", "p_values"),
]


def timeit(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pydeseq2_tpu.fused import (
        _wald_impl,
        fit_fused_trend,
        summary_host_inputs,
        summary_pipeline,
    )
    from pydeseq2_tpu.ops.irls import irls_beta_init, irls_core

    N = int(os.environ.get("BENCH_SAMPLES", 100))
    G = int(os.environ.get("BENCH_GENES", 60_000))
    counts_np, design_np = make_data(N, G)
    dtype = jnp.float32
    counts = jnp.asarray(counts_np.T, dtype)
    X = jnp.asarray(design_np, dtype)
    contrast = jnp.asarray(np.eye(design_np.shape[1])[-1], dtype)
    null = jnp.asarray(0.0, dtype)
    max_disp = float(max(10, N))
    host = summary_host_inputs(design_np)

    # ---- full summary program (the bench headline) --------------------------
    def full():
        out = summary_pipeline(
            counts, X, contrast, null,
            jnp.asarray(host["cooks_cutoff"], dtype),
            cohort_ids=host["cohort_ids"],
            use_for_max=host["use_for_max"],
            mu_init=host["mu_init"],
            max_disp=max_disp, beta_tol=1e-6,
        )
        return float(jnp.nansum(out["padj"]))

    wall_full = timeit(full)

    # Dispatch + scalar-readback floor: a near-empty program timed the same
    # way. Every prefix (and the full wall) contains this constant once, so
    # the FIRST stage's marginal absorbs it; reported so the attribution
    # can be read net of it.
    @jax.jit
    def null_prog(c):
        return jnp.nansum(c[:, 0])

    floor = timeit(lambda: float(null_prog(counts)))

    # ---- prefix programs ----------------------------------------------------
    def make_prefix(key):
        @jax.jit
        def prefix(c, Xd, cv):
            out = _wald_impl(
                c, Xd, cv, null, max_disp=max_disp, beta_tol=1e-6,
                mu_init=host["mu_init"],
            )
            return jnp.nansum(out[key])

        return prefix

    stages = []
    prev_wall, prev_flops, prev_bytes = 0.0, 0.0, 0.0
    for name, key in STAGES:
        fn = make_prefix(key)
        lowered = fn.lower(counts, X, contrast)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        flops = float(cost.get("flops", float("nan")))
        byts = float(cost.get("bytes accessed", float("nan")))
        w = timeit(lambda: float(compiled(counts, X, contrast)))
        stages.append(
            {
                "stage": name,
                "prefix_wall_s": round(w, 4),
                "marginal_wall_s": round(w - prev_wall, 4),
                "marginal_flops_1trip": flops - prev_flops,
                "marginal_bytes_1trip": byts - prev_bytes,
            }
        )
        prev_wall, prev_flops, prev_bytes = w, flops, byts
        print(f"  {name}: prefix {w*1e3:.1f} ms", file=sys.stderr, flush=True)

    stats_layer_s = wall_full - prev_wall  # cooks + BH sweep + readback delta
    stages.append(
        {
            "stage": "cooks+padj",
            "prefix_wall_s": round(wall_full, 4),
            "marginal_wall_s": round(stats_layer_s, 4),
        }
    )

    # ---- measured trip counts ----------------------------------------------
    # Rerun the loops standalone on the SAME inputs the fused program
    # produced (read back from a full _wald_impl execution).
    probe = jax.jit(
        partial(
            _wald_impl, max_disp=max_disp, beta_tol=1e-6, mu_init=host["mu_init"]
        )
    )(counts, X, contrast, null)
    sf = probe["size_factors"]
    disp_safe = jnp.nan_to_num(probe["dispersions"], nan=0.5)
    beta_init = irls_beta_init(counts, sf, X)

    @jax.jit
    def irls_trips(c, s, Xd, d, b0):
        _, _, _, it = irls_core(
            c, s, Xd, d, b0, min_mu=0.5, beta_tol=1e-6, return_iters=True
        )
        return it

    n_irls = int(irls_trips(counts, sf, X, disp_safe, beta_init))

    @jax.jit
    def trend_trips(bm, gw, nz):
        return fit_fused_trend(bm, gw, nz, 1e-8, "parametric", 20, True)[4]

    n_trend = int(
        trend_trips(
            probe["base_mean"], probe["genewise_dispersions"], probe["_non_zero"]
        )
    )

    trips = {
        "irls_while_loop": n_irls,
        "trend_exclusion_rounds": n_trend,
        "genewise_disp_static": {"coarse_scan": 32, "fine_scan": 0, "newton": 4},
        "map_disp_static": {"coarse_scan": 0, "fine_scan": 0, "newton": 4},
        "note": "irls trips = slowest lane (every trip processes all G "
        "lanes). The genewise stage also contains the static-trip grid "
        "scans; mu_init == 'irls' configs would add a second IRLS loop "
        "(this config uses the linear init).",
    }

    # ---- trip-corrected stage rooflines ------------------------------------
    # The marginal cost of a loop stage divides into per-trip body cost and
    # outside-the-loop cost; XLA's model counts the body once. Scaling the
    # whole marginal by the trip count therefore UPPER-bounds arithmetic and
    # traffic — still the right scale for bound classification.
    per_stage_roofline = {}
    # lax.scan lowers to an HLO while too, so the static-trip grid scans are
    # equally undercounted: genewise = 32 coarse + 4 Newton body
    # evaluations of the (G, N) objective (fine scan disabled), MAP = 0 + 4
    # (its coarse scan reuses the genewise cache; only the Newton polish
    # re-evaluates the objective). Keep these in sync with the
    # genewise_disp_static / map_disp_static trips dict above and the
    # ops/dispersion.py defaults.
    trip_mult = {
        "irls_lfc": n_irls,
        "trend": max(n_trend, 1),
        "genewise_disp": 36,
        "map_disp": 4,
    }
    for s in stages:
        if "marginal_flops_1trip" not in s:
            continue
        mult = trip_mult.get(s["stage"], 1)
        w = s["marginal_wall_s"]
        if w < 2e-3:
            # Below timing noise: a rate would be meaningless (and can even
            # be negative-wall garbage). Report the raw costs only.
            per_stage_roofline[s["stage"]] = {
                "trip_mult": mult,
                "est_gflops_total": round(s["marginal_flops_1trip"] * mult / 1e9, 2),
                "est_gbytes_total": round(s["marginal_bytes_1trip"] * mult / 1e9, 3),
                "note": "marginal wall below timing noise; no rate",
            }
            continue
        fl = s["marginal_flops_1trip"] * mult
        by = s["marginal_bytes_1trip"] * mult
        per_stage_roofline[s["stage"]] = {
            "trip_mult": mult,
            "est_gflops_total": round(fl / 1e9, 2),
            "est_gbytes_total": round(by / 1e9, 3),
            "achieved_tflops": round(fl / w / 1e12, 3),
            "achieved_gbytes_per_s": round(by / w / 1e9, 1),
            "pct_hbm_bw": round(100 * by / w / V5E_HBM_BYTES_PER_S, 1),
            "pct_mxu_peak": round(100 * fl / w / V5E_PEAK_BF16_FLOPS, 2),
        }

    attributed = sum(s["marginal_wall_s"] for s in stages)
    result = {
        "config": f"{N}x{G} f32 fused summary_pipeline",
        "device": str(jax.devices()[0]),
        "wall_s_full_summary": round(wall_full, 4),
        "genes_per_s": round(G / wall_full, 1),
        "dispatch_readback_floor_s": round(floor, 4),
        "stage_attribution": stages,
        "attribution_sums_to_s": round(attributed, 4),
        "measured_trip_counts": trips,
        "per_stage_roofline_trip_corrected": per_stage_roofline,
        "peaks": {
            "v5e_bf16_matmul_flops": V5E_PEAK_BF16_FLOPS,
            "v5e_hbm_bytes_per_s": V5E_HBM_BYTES_PER_S,
        },
        "note": "Prefix-DCE attribution: stage wall = prefix(k) - "
        "prefix(k-1), telescoping to the full wall. Trip-corrected rates "
        "multiply XLA's one-trip cost model by measured while-loop trips "
        "(upper bound: outside-loop cost is scaled too). 'bytes accessed' "
        "is logical operand traffic, an upper bound on HBM traffic after "
        "fusion.",
    }
    out_path = Path(os.environ.get("ROOFLINE_OUT", str(ROOT / "ROOFLINE.json")))
    out_path.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
