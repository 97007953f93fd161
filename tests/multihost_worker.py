"""Worker process for the two-process jax.distributed gene-mesh test.

Launched by tests/test_multihost.py with argv:
    multihost_worker.py <process_id> <num_processes> <coordinator_port> <data.npz>

Each worker owns 2 virtual CPU devices (XLA_FLAGS set by the parent), joins
the distributed runtime through pydeseq2_tpu.parallel.mesh.init_distributed,
builds the GLOBAL gene mesh, runs the fused Wald pipeline on a gene-sharded
global array, and checks the all-gathered result against the single-process
expectation computed by the parent. Exit code 0 = pass.
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    proc_id, nproc, port, data_path = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )

    from pydeseq2_tpu.parallel.mesh import init_distributed, make_gene_mesh

    init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=proc_id,
    )

    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    import pydeseq2_tpu  # noqa: F401  (enables x64 so dtypes match the parent)
    from pydeseq2_tpu.fused import wald_pipeline

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == proc_id

    data = np.load(data_path)
    counts, design, contrast = data["counts"], data["design"], data["contrast"]
    G, N = counts.shape

    mesh = make_gene_mesh()  # over ALL global devices (nproc * 2 here)
    assert mesh.devices.size == nproc * 2, mesh
    gene_sh = NamedSharding(mesh, P("genes", None))
    counts_d = jax.make_array_from_callback(
        (G, N), gene_sh, lambda idx: counts[idx]
    )
    design_d = jax.make_array_from_callback(
        design.shape, NamedSharding(mesh, P()), lambda idx: design[idx]
    )
    contrast_d = jax.make_array_from_callback(
        contrast.shape, NamedSharding(mesh, P()), lambda idx: contrast[idx]
    )

    out = jax.jit(
        lambda c, X, cv: wald_pipeline(
            c, X, cv, jnp.asarray(0.0, c.dtype), max_disp=float(max(10, N))
        )
    )(counts_d, design_d, contrast_d)

    # Cross-gene reductions (size-factor medians, trend, prior MAD) ran as XLA
    # collectives over the 2-process mesh; the gathered result must equal the
    # parent's single-process run to roundoff.
    for key in ("lfc", "p_values", "size_factors"):
        got = np.asarray(multihost_utils.process_allgather(out[key], tiled=True))
        want = data[key]
        # rtol covers cross-shard reduction-order roundoff (~1e-9 observed).
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9, err_msg=key)

    print(f"worker {proc_id}: ok", flush=True)


if __name__ == "__main__":
    main()
