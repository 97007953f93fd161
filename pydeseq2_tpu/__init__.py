"""pydeseq2_tpu — a TPU-native DESeq2 differential-expression framework.

A from-scratch JAX/XLA re-design of the DESeq2 method (negative-binomial GLMs
with empirical-Bayes dispersion shrinkage, Wald tests, apeGLM LFC shrinkage).
Capability parity target: owkin/PyDESeq2 (see SURVEY.md). Instead of the
reference's per-gene scipy loops in a joblib process pool
(reference: pydeseq2/default_inference.py:65-124), every per-gene solver here
is a batched, masked, fixed-structure JAX kernel operating on gene-major
(G, N) tiles, jit-compiled once and sharded over a 1-D gene mesh for
multi-chip TPU execution.

Numerics note: DESeq2 parity (<2% rel. err. vs R golden files) requires
float64 in several stages, so x64 is enabled at import unless the environment
variable ``PYDESEQ2_TPU_NO_X64`` is set. Per-dataset ``dtype`` can still be
float32 for TPU speed (validated against f64 within tolerance on the repo's
fixtures).
"""

import os

import jax

if not os.environ.get("PYDESEQ2_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# On TPU, f32 matmuls/einsums default to bf16 MXU passes. The IRLS Gram
# matrices, linear predictors (beta @ X.T), and Cox-Reid information matrices
# all flow through dots whose error at bf16 (~3 decimal digits) sits ABOVE the
# solvers' stopping tolerances: measured on a v5e, ~37% of IRLS lanes then
# never satisfy the deviance stop, cascade into the Newton rescue, and the
# pipeline both slows down and loses golden parity. These dots are thin
# (P <= ~8 design columns) and HBM-bound, so full-f32 multiply costs nothing
# measurable; pin it globally.
jax.config.update("jax_default_matmul_precision", "highest")

from pydeseq2_tpu.api import run_deseq2  # noqa: E402
from pydeseq2_tpu.container import DeseqDataContainer  # noqa: E402
from pydeseq2_tpu.models.dataset import DeseqDataSet  # noqa: E402
from pydeseq2_tpu.models.stats import DeseqStats  # noqa: E402
from pydeseq2_tpu.inference import Inference  # noqa: E402
from pydeseq2_tpu.jax_inference import JaxInference  # noqa: E402
from pydeseq2_tpu.default_inference import DefaultInference  # noqa: E402
from pydeseq2_tpu.preprocessing import (  # noqa: E402
    deseq2_norm,
    deseq2_norm_fit,
    deseq2_norm_transform,
)

__version__ = "0.1.0"

__all__ = [
    "run_deseq2",
    "DeseqDataSet",
    "DeseqStats",
    "DeseqDataContainer",
    "Inference",
    "JaxInference",
    "DefaultInference",
    "deseq2_norm",
    "deseq2_norm_fit",
    "deseq2_norm_transform",
    "__version__",
]
