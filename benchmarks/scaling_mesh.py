"""Throughput vs device count on a virtual CPU mesh (sharding-overhead probe).

Real multi-chip TPU hardware is not available in this environment, so this
measures the next-best thing: the fused pipelines jitted over 1/2/4/8
virtual CPU devices (xla_force_host_platform_device_count) with the gene axis
sharded. On a 2-core host more virtual devices cannot make the math faster —
what this DOES measure is the cost the SPMD partitioning itself adds
(collectives at the size-factor median / trend / prior / filtering reduction
points, per-shard program overhead): if gene sharding is communication-light,
throughput should stay ~flat as the device count rises, which is the
correctness trend that predicts near-linear scaling on real chips where each
shard gets its own compute.

Two configs (VERDICT r2 item 9): the 100-sample north-star shape, and a
1k-sample shape where the cross-gene reductions (sample medians, trend
gathers) carry real weight. Writes SCALING_MESH.json at the repo root.

Knobs: SCALING_CONFIGS (default "100x30000,1000x20000"), SCALING_MESHES
(default "1,2,4,8").
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # both required to stay off the TPU
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("PYDESEQ2_TPU_NO_X64", "1")

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from reference_baseline import make_data  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pydeseq2_tpu.fused import wald_pipeline
    from pydeseq2_tpu.parallel.mesh import (
        make_gene_mesh,
        replicated,
        shard_gene_major,
    )

    configs = os.environ.get("SCALING_CONFIGS", "100x30000,1000x20000").split(",")
    meshes = [int(v) for v in os.environ.get("SCALING_MESHES", "1,2,4,8").split(",")]

    out_path = ROOT / "SCALING_MESH.json"
    artifact = {
        "host": "virtual CPU mesh (2 physical cores) - measures sharding "
        "overhead, not compute scaling",
        "configs": {},
    }

    for cfg in configs:
        N, G = (int(v) for v in cfg.strip().split("x"))
        counts_np, design_np = make_data(N, G)
        dtype = jnp.float32
        contrast_np = np.eye(design_np.shape[1])[-1]

        results = {}
        reference_pv = None
        for n_dev in meshes:
            mesh = make_gene_mesh(n_dev)
            counts = shard_gene_major(jnp.asarray(counts_np.T, dtype), mesh)
            design = jax.device_put(
                jnp.asarray(design_np, dtype), replicated(mesh)
            )
            contrast = jax.device_put(
                jnp.asarray(contrast_np, dtype), replicated(mesh)
            )

            fn = jax.jit(
                lambda c, X, cv: wald_pipeline(
                    c, X, cv, jnp.asarray(0.0, dtype),
                    max_disp=float(max(10, N)), beta_tol=1e-6,
                )
            )

            def run():
                out = fn(counts, design, contrast)
                return np.asarray(out["p_values"])

            t0 = time.perf_counter()
            pv = run()
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                pv = run()
                times.append(time.perf_counter() - t0)
            best = min(times)

            if reference_pv is None:
                reference_pv = pv
                max_dev = 0.0
            else:
                a, b = np.nan_to_num(pv), np.nan_to_num(reference_pv)
                max_dev = float(np.max(np.abs(a - b)))
            entry = {
                "wall_s": round(best, 3),
                "genes_per_s": round(G / best, 1),
                "compile_s": round(compile_s, 1),
                "max_abs_pvalue_dev_vs_1dev": max_dev,
            }
            results[str(n_dev)] = entry
            print(json.dumps({cfg: {f"{n_dev}_devices": entry}}), flush=True)

        artifact["configs"][cfg] = {
            "program": "fused wald_pipeline f32, gene-sharded",
            "results": results,
        }
        out_path.write_text(json.dumps(artifact, indent=2) + "\n")

    # ---- streamed summary + Cook's refit over the mesh (VERDICT r3 #5) ----
    # The reference-DEFAULT pipeline (replacement + refit,
    # pydeseq2/dds.py:1042-1064) through run_summary_streamed with injected
    # outliers, so the compacted refit tile is real work under SPMD.
    from pydeseq2_tpu.fused_stream import run_summary_streamed

    refit_cfgs = [
        c for c in os.environ.get("SCALING_REFIT_CONFIGS", "1000x20000").split(",")
        if c.strip()
    ]
    for cfg in refit_cfgs:
        N, G = (int(v) for v in cfg.strip().split("x"))
        counts_np, design_np = make_data(N, G)
        counts_gm = counts_np.T.copy()
        rng = np.random.default_rng(11)
        lanes = rng.choice(G, max(8, G // 1000), replace=False)
        counts_gm[lanes, 1] = 1e6  # Cook's outliers spread over shards
        contrast_np = np.eye(design_np.shape[1])[-1]

        results = {}
        reference_pv = None
        for n_dev in meshes:
            mesh = make_gene_mesh(n_dev)
            counts = shard_gene_major(jnp.asarray(counts_gm, jnp.float32), mesh)

            def run():
                res = run_summary_streamed(
                    counts,
                    design_np.astype(np.float32),
                    contrast_np,
                    refit_cooks=True,
                    dtype=np.float32,
                    max_disp=float(max(10, N)),
                    beta_tol=1e-6,
                )
                return res

            t0 = time.perf_counter()
            res = run()
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                res = run()
                times.append(time.perf_counter() - t0)
            best = min(times)
            pv = np.asarray(res["p_values"])
            if reference_pv is None:
                reference_pv = pv
                max_dev = 0.0
            else:
                a, b = np.nan_to_num(pv), np.nan_to_num(reference_pv)
                max_dev = float(np.max(np.abs(a - b)))
            entry = {
                "wall_s": round(best, 3),
                "genes_per_s": round(G / best, 1),
                "compile_s": round(compile_s, 1),
                "replaced": int(res["replaced"].sum()),
                "refitted": int(res["refitted"].sum()),
                "max_abs_pvalue_dev_vs_1dev": max_dev,
            }
            results[str(n_dev)] = entry
            print(json.dumps({cfg: {f"{n_dev}_devices_refit": entry}}), flush=True)

        artifact["configs"][cfg + "_refit"] = {
            "program": "run_summary_streamed(refit_cooks=True) f32, "
            "gene-sharded, injected outliers (full host-wrapper wall incl. "
            "refit tile + merge)",
            "results": results,
        }
        out_path.write_text(json.dumps(artifact, indent=2) + "\n")

    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
