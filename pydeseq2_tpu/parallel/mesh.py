"""Gene-sharding over a 1-D device mesh.

The TPU-native replacement for the reference's joblib process pool
(reference pydeseq2/default_inference.py:38-124): genes are the only scaling
axis of the DESeq2 problem (SURVEY.md section 2.3), so the parallelism model
is a 1-D ``("genes",)`` mesh with every gene-major array sharded on its
leading axis and the design matrix / size factors replicated. Per-gene
solvers need no communication; the few global reductions (size-factor
medians, trend fit, prior variance MAD, filtering quantiles) become XLA
collectives inserted automatically when the fused pipeline is jitted with
these shardings.

Multi-host entry: call :func:`init_distributed` first (wraps
``jax.distributed.initialize``), then build the mesh over all global devices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_gene_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """Create a 1-D mesh with axis name ``"genes"``.

    Parameters
    ----------
    n_devices : int, optional
        Number of devices to use (default: all available).
    devices : sequence, optional
        Explicit device list (overrides ``n_devices``).
    """
    if devices is None:
        devices = jax.devices()[: (n_devices or len(jax.devices()))]
    return Mesh(np.array(devices), axis_names=("genes",))


def gene_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for gene-major arrays: leading axis split over the mesh."""
    return NamedSharding(mesh, P("genes"))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for replicated arrays (design matrix, size factors)."""
    return NamedSharding(mesh, P())


def shard_gene_major(arr, mesh: Mesh):
    """Place a gene-leading array sharded over the mesh."""
    spec = P("genes", *([None] * (np.ndim(arr) - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def pad_to_multiple(arr: np.ndarray, multiple: int, fill=0):
    """Pad the leading axis to a multiple of ``multiple`` (shard-even sizes).

    Returns (padded_array, original_length).
    """
    g = arr.shape[0]
    rem = (-g) % multiple
    if rem == 0:
        return arr, g
    pad_width = [(0, rem)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad_width, constant_values=fill), g


def init_distributed(**kwargs) -> None:
    """Multi-host entry point (wraps ``jax.distributed.initialize``).

    On a TPU pod slice, call once per host before building the mesh; all
    hosts then see the global device set and the same SPMD program.
    """
    jax.distributed.initialize(**kwargs)
