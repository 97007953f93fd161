"""Test harness configuration: force CPU with a virtual 8-device mesh.

The CI/test suite must not depend on TPU hardware; sharding tests simulate a
multi-chip mesh with xla_force_host_platform_device_count (the strategy the
reference has no analog for - it has no multi-device story - see SURVEY.md
section 4).

NOTE: the environment's sitecustomize registers a remote-TPU PJRT plugin at
interpreter start and pins JAX_PLATFORMS=axon, so merely setting env vars in
pytest.ini is not enough; we override the config before any backend
initializes (conftest imports before test modules).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pytest  # noqa: E402

import pydeseq2_tpu  # noqa: E402,F401  (enables x64)
from pydeseq2_tpu.utils import load_example_data  # noqa: E402

TEST_DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound the XLA:CPU compiler's accumulated in-process state.

    With the whole suite in one process, compiling the largest sharded
    program (fused pipeline with the two-phase IRLS mu-init, 8 virtual
    devices) segfaults inside ``backend_compile_and_load`` once a few
    hundred compilations' worth of state has built up — deterministically
    at the same test, while the same test passes in a fresh process or a
    half-suite run. Dropping the jit caches per module keeps the peak
    state bounded; within-module compilation reuse (where the real wins
    are) is untouched.
    """
    yield
    jax.clear_caches()


@pytest.fixture
def counts_df() -> pd.DataFrame:
    return load_example_data(modality="raw_counts", dataset="synthetic")


@pytest.fixture
def metadata() -> pd.DataFrame:
    return load_example_data(modality="metadata", dataset="synthetic")


def data_path(*parts: str) -> str:
    return os.path.join(TEST_DATA, *parts)


def assert_res_almost_equal(res_df: pd.DataFrame, r_res: pd.DataFrame, tol=0.02):
    """Shared golden-file checker: identical NaN masks + relative errors.

    Parity: reference tests/test_pydeseq2.py:932-943.
    """
    assert (res_df.pvalue.isna() == r_res.pvalue.isna()).all()
    assert (res_df.padj.isna() == r_res.padj.isna()).all()
    assert (
        abs(r_res.log2FoldChange - res_df.log2FoldChange) / abs(r_res.log2FoldChange)
    ).max() < tol
    assert (abs(r_res.pvalue - res_df.pvalue) / r_res.pvalue).max() < tol
    assert (abs(r_res.padj - res_df.padj) / r_res.padj).max() < tol
