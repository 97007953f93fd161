"""apeGLM LFC shrinkage conformance vs R golden files.

Mirrors reference tests/test_pydeseq2.py:256-341,367-430,470-509,566-622:
shrinkage is tested in isolation by injecting the R-fitted size factors,
dispersions and MLE LFCs before shrinking.
"""

import numpy as np
import pandas as pd

from pydeseq2_tpu import DeseqDataSet, DeseqStats

from conftest import data_path


def _run_shrink(counts_df, metadata, design, folder, coeff, contrast, adapt=True):
    r_res = pd.read_csv(data_path(folder, "r_test_res.csv"), index_col=0)
    shrink_file = (
        "r_test_lfc_shrink_res.csv" if adapt else "r_test_lfc_shrink_no_apeAdapt_res.csv"
    )
    r_shrunk_res = pd.read_csv(data_path(folder, shrink_file), index_col=0)
    r_size_factors = pd.read_csv(
        data_path(folder, "r_test_size_factors.csv"), index_col=0
    ).squeeze()
    r_dispersions = pd.read_csv(
        data_path(folder, "r_test_dispersions.csv"), index_col=0
    ).squeeze()

    dds = DeseqDataSet(counts=counts_df, metadata=metadata, design=design, quiet=True)
    dds.deseq2()
    dds.obs["size_factors"] = r_size_factors.values
    dds.var["dispersions"] = r_dispersions.values
    dds.varm["LFC"].iloc[:, 1] = r_res.log2FoldChange.values * np.log(2)

    res = DeseqStats(dds, contrast=contrast, quiet=True)
    res.summary()
    res.SE = r_res.lfcSE * np.log(2)
    res.lfc_shrink(coeff=coeff, adapt=adapt)
    return res.results_df, r_shrunk_res


def test_lfc_shrinkage(counts_df, metadata, tol=0.02):
    shrunk_res, r_shrunk_res = _run_shrink(
        counts_df,
        metadata,
        "~condition",
        "single_factor",
        "condition[T.B]",
        ["condition", "B", "A"],
    )
    assert (
        abs(r_shrunk_res.log2FoldChange - shrunk_res.log2FoldChange)
        / abs(r_shrunk_res.log2FoldChange)
    ).max() < tol


def test_lfc_shrinkage_no_apeAdapt(counts_df, metadata, tol=0.02):
    shrunk_res, r_shrunk_res = _run_shrink(
        counts_df,
        metadata,
        "~condition",
        "single_factor",
        "condition[T.B]",
        ["condition", "B", "A"],
        adapt=False,
    )
    assert (
        abs(r_shrunk_res.log2FoldChange - shrunk_res.log2FoldChange)
        / abs(r_shrunk_res.log2FoldChange)
    ).max() < tol


def test_multifactor_lfc_shrinkage(counts_df, metadata, tol=0.02):
    shrunk_res, r_shrunk_res = _run_shrink(
        counts_df,
        metadata,
        "~group + condition",
        "multi_factor",
        "condition[T.B]",
        ["condition", "B", "A"],
    )
    assert (
        abs(r_shrunk_res.log2FoldChange - shrunk_res.log2FoldChange)
        / abs(r_shrunk_res.log2FoldChange)
    ).max() < tol


def test_lfc_shrinkage_large_counts(tol=0.03):
    # Tolerance note: with ~500k counts the apeGLM posterior has a wide, flat
    # basin; R's optimizer and scipy's L-BFGS-B (reference) stop early inside
    # it (ftol), while our batched Newton converges to the exact MAP (lower
    # objective, zero gradient - verified below). The resulting LFC for the
    # largest-count gene differs from R's early-stop point by ~2.5%, so this
    # test uses 3% (the reference's own multifactor/outlier tests use 4%).
    counts_df = pd.DataFrame(
        data=[
            [25, 405, 1355, 12558, 489843],
            [28, 480, 2144, 13844, 514571],
            [12, 690, 1919, 15632, 564106],
            [31, 420, 1684, 11513, 556380],
            [34, 278, 3849, 11577, 412551],
            [19, 249, 3086, 7296, 295565],
            [17, 491, 4089, 13805, 280945],
            [15, 251, 2785, 10492, 214062],
        ],
        index=["A1", "A2", "A3", "A4", "B1", "B2", "B3", "B4"],
        columns=["g1", "g2", "g3", "g4", "g5"],
    )
    metadata_df = pd.DataFrame(
        data=["A", "A", "A", "A", "B", "B", "B", "B"],
        index=counts_df.index,
        columns=["condition"],
    )
    shrunk_res, r_shrunk_res = _run_shrink(
        counts_df,
        metadata_df,
        "~condition",
        "large_counts",
        "condition[T.B]",
        ["condition", "B", "A"],
    )
    assert (
        abs(r_shrunk_res.log2FoldChange - shrunk_res.log2FoldChange)
        / abs(r_shrunk_res.log2FoldChange)
    ).max() < tol

    # Stronger check than closeness-to-R: our MAP objective must be at least
    # as good as the one at R's reported solution for every gene.
    import jax.numpy as jnp

    from pydeseq2_tpu.ops.shrink import nbinom_fn_batch

    r_disp = pd.read_csv(
        data_path("large_counts", "r_test_dispersions.csv"), index_col=0
    ).squeeze()
    r_sf = pd.read_csv(
        data_path("large_counts", "r_test_size_factors.csv"), index_col=0
    ).squeeze()
    X = np.column_stack([np.ones(8), [0, 0, 0, 0, 1, 1, 1, 1]])
    size = jnp.asarray(1.0 / r_disp.values)
    offset = jnp.asarray(np.log(r_sf.values))
    cnts = jnp.asarray(counts_df.values.T.astype(float))
    prior_scale = 0.4554607966995  # min(sqrt(prior_var), 1) on this fixture

    def profile_obj(slopes):
        # Profile the objective over the intercept (the solvers' intercepts
        # are not stored), scanning a fine grid around the log normed mean.
        base = np.log((counts_df.values / r_sf.values[:, None]).mean(0))
        best = np.full(5, np.inf)
        for d in np.linspace(-0.5, 0.5, 501):
            betas = jnp.asarray(np.column_stack([base + d, slopes]))
            f = np.asarray(
                nbinom_fn_batch(
                    betas, jnp.asarray(X), cnts, size, offset, 15.0, prior_scale, 1
                )
            )
            best = np.minimum(best, f)
        return best

    f_ours = profile_obj(shrunk_res.log2FoldChange.values * np.log(2))
    f_theirs = profile_obj(r_shrunk_res.log2FoldChange.values * np.log(2))
    # 1e-3 absorbs the intercept-grid profiling noise; it still rules out a
    # different posterior basin (basin gaps here are O(1e-2) or larger).
    assert (f_ours <= f_theirs + 1e-3).all()


def test_continuous_lfc_shrinkage(tol=0.02):
    counts_df = pd.read_csv(data_path("continuous", "test_counts.csv"), index_col=0).T
    metadata = pd.read_csv(data_path("continuous", "test_metadata.csv"), index_col=0)

    r_res = pd.read_csv(data_path("continuous", "r_test_res.csv"), index_col=0)
    r_shrunk_res = pd.read_csv(
        data_path("continuous", "r_test_lfc_shrink_res.csv"), index_col=0
    )
    r_size_factors = pd.read_csv(
        data_path("continuous", "r_test_size_factors.csv"), index_col=0
    ).squeeze()
    r_dispersions = pd.read_csv(
        data_path("continuous", "r_test_dispersions.csv"), index_col=0
    ).squeeze()

    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        design="~group + condition + measurement",
        quiet=True,
    )
    dds.deseq2()
    contrast_vector = np.zeros(dds.obsm["design_matrix"].shape[1])
    contrast_vector[-1] = 1

    dds.obs["size_factors"] = r_size_factors.values
    dds.var["dispersions"] = r_dispersions.values
    dds.varm["LFC"].iloc[:, 1] = r_res.log2FoldChange.values * np.log(2)

    res = DeseqStats(dds, contrast=contrast_vector, quiet=True)
    res.summary()
    res.SE = r_res.lfcSE * np.log(2)
    res.lfc_shrink(coeff="measurement")
    shrunk_res = res.results_df
    assert (
        abs(r_shrunk_res.log2FoldChange - shrunk_res.log2FoldChange)
        / abs(r_shrunk_res.log2FoldChange)
    ).max() < tol
