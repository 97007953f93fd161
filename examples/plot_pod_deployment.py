"""
Multi-chip deployment: gene-sharded analysis on a TPU pod slice
===============================================================

The reference's parallelism is a per-gene joblib process pool (reference
pydeseq2/default_inference.py:38-124) — shared-nothing workers on one
host. The TPU-native equivalent is SPMD **gene sharding**: every gene-major
operand is laid out over a 1-D ``Mesh(("genes",))``, per-gene solvers run
shard-locally with zero communication, and XLA inserts the few collectives
the analysis actually needs (size-factor medians, dispersion-trend and
prior reductions, the BH sweep) at the mesh boundaries — over ICI inside a
slice, DCN across hosts.

This example runs on ANY JAX backend: on CPU it simulates an 8-device mesh
(the same mechanism the test suite and the driver's multi-chip dry run
use); on a real pod slice the identical code sees the real chips. Results
are bit-for-bit independent of the device count (pinned by
tests/test_sharding.py, including the Cook's-refit flow at
G=32768 / gene_block=4096).

.. contents:: Contents
    :local:
    :depth: 2
"""

# %%
# Simulate a multi-chip mesh when no pod is attached. On a real v5e-16 this
# block is unnecessary — ``jax.devices()`` already lists the chips.
import os

if "XLA_FLAGS" not in os.environ:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax
import numpy as np
import pandas as pd

# %%
# Synthetic cohort: two conditions with 8 replicates each, NB counts.
rng = np.random.default_rng(0)
n_samples, n_genes = 16, 4096
cond = np.repeat(["A", "B"], n_samples // 2)
mu = np.exp(rng.normal(3, 1, (n_samples, n_genes)))
counts = pd.DataFrame(
    rng.negative_binomial(5, 1 / (1 + mu / 5)),
    index=[f"sample{i}" for i in range(n_samples)],
    columns=[f"gene{i}" for i in range(n_genes)],
)
metadata = pd.DataFrame({"condition": cond}, index=counts.index)

# %%
# One-call analysis over the mesh. ``make_gene_mesh(n)`` builds the 1-D
# ("genes",) mesh; ``run_deseq2`` pads the gene axis shard-even, places the
# counts with a NamedSharding, and runs the reference-default pipeline
# (Cook's outlier replacement + refit) as the streamed program pair.
from pydeseq2_tpu import run_deseq2
from pydeseq2_tpu.parallel.mesh import make_gene_mesh

mesh = make_gene_mesh(min(8, jax.device_count()))
results = run_deseq2(
    counts,
    metadata,
    "~condition",
    contrast=["condition", "B", "A"],
    mesh=mesh,
)
print(results.head())

# %%
# Stage-level control works over the same mesh: the staged
# :class:`~pydeseq2_tpu.DeseqDataSet` accepts a mesh-aware inference
# backend, and the streamed wrappers take pre-sharded device arrays
# directly (pad to a device multiple and pass ``n_genes=`` so pad lanes
# stay out of the filtering quantiles):
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pydeseq2_tpu.fused_stream import run_summary_streamed
from pydeseq2_tpu.parallel.mesh import pad_to_multiple

counts_gm = counts.values.T.astype(float)  # gene-major (G, N)
padded, _ = pad_to_multiple(counts_gm, np.prod(list(mesh.shape.values())))
counts_sharded = jax.device_put(
    jnp.asarray(padded, jnp.float32), NamedSharding(mesh, P("genes", None))
)
design = pd.get_dummies(metadata["condition"], drop_first=True, dtype=float)
design.insert(0, "Intercept", 1.0)
res = run_summary_streamed(
    counts_sharded,
    design,
    np.array([0.0, 1.0]),
    refit_cooks=True,
    n_genes=n_genes,
)
print("padj < 0.05:", int((res["padj"] < 0.05).sum()))

# %%
# Multi-host pods: call ``pydeseq2_tpu.parallel.mesh.init_distributed()``
# (a ``jax.distributed.initialize`` wrapper) on every host before building
# the mesh — the same SPMD program then spans hosts, with the trend/prior
# collectives riding DCN. tests/test_multihost.py exercises this with two
# OS processes.
