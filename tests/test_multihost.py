"""Multi-host entry: two-process jax.distributed run over a global gene mesh.

The reference has no multi-node story (its only parallelism is a joblib pool,
SURVEY.md section 2.3); the TPU-native scaling path is a gene-sharded mesh
spanning hosts via jax.distributed. Real multi-host TPU hardware is not
available in CI, so this test exercises the entry point end to end with two
OS processes x 2 virtual CPU devices each: coordinator handshake
(parallel.mesh.init_distributed), global mesh construction, gene-sharded
global arrays, the fused pipeline's cross-gene collectives, and result
gathering — asserting exact agreement with a single-process run.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from pydeseq2_tpu.fused import wald_pipeline

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_gene_mesh(tmp_path):
    rng = np.random.default_rng(0)
    G, N = 16, 12  # divisible by 4 global devices
    mu = rng.lognormal(3.0, 1.0, size=(G, 1))
    counts = rng.negative_binomial(5, 1 / (1 + 0.2 * mu), size=(G, N)).astype(float)
    counts[0, :] = 0  # all-zero lane crosses the shard boundary machinery
    design = np.column_stack([np.ones(N), rng.integers(0, 2, N)]).astype(float)
    contrast = np.array([0.0, 1.0])

    expected = wald_pipeline(
        jnp.asarray(counts),
        jnp.asarray(design),
        jnp.asarray(contrast),
        jnp.asarray(0.0),
        max_disp=float(max(10, N)),
    )

    data_path = tmp_path / "data.npz"
    np.savez(
        data_path,
        counts=counts,
        design=design,
        contrast=contrast,
        lfc=np.asarray(expected["lfc"]),
        p_values=np.asarray(expected["p_values"]),
        size_factors=np.asarray(expected["size_factors"]),
    )

    port = _free_port()
    env = dict(os.environ)
    repo_root = str(WORKER.parent.parent)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",  # both required: gates the axon plugin
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=repo_root + os.pathsep + env.get("PYTHONPATH", ""),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), "2", str(port), str(data_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"worker {i}: ok" in out
