"""Multi-device gene-sharding tests on a simulated 8-device CPU mesh.

The reference has no multi-device story to replicate (its parallelism is a
joblib pool, reference pydeseq2/default_inference.py:38-124); these tests
validate the TPU-native equivalent: identical results with and without a
1-D gene mesh, correct output shardings, and the fused single-program
pipeline under SPMD. Device count is forced to 8 in conftest via
xla_force_host_platform_device_count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pydeseq2_tpu.fused import wald_pipeline
from pydeseq2_tpu.jax_inference import JaxInference
from pydeseq2_tpu.parallel.mesh import make_gene_mesh, pad_to_multiple


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"
    return make_gene_mesh(8)


def _make_data(G=64, N=20, seed=0):
    rng = np.random.default_rng(seed)
    X = np.column_stack([np.ones(N), rng.integers(0, 2, N)]).astype(float)
    sf = np.exp(rng.normal(0, 0.1, N))
    mu = sf[:, None] * np.exp(rng.normal(2, 1, G))[None, :]
    disp = np.abs(rng.normal(0.1, 0.05, G)) + 0.01
    counts = rng.negative_binomial(1 / disp, 1 / (1 + disp * mu)).astype(float)
    return counts, sf, X, disp


def test_irls_sharded_matches_unsharded(mesh):
    counts, sf, X, disp = _make_data()
    inf_plain = JaxInference()
    inf_mesh = JaxInference(mesh=mesh)
    b1, m1, h1, c1 = inf_plain.irls(counts, sf, X, disp, min_mu=0.5, beta_tol=1e-8)
    b2, m2, h2, c2 = inf_mesh.irls(counts, sf, X, disp, min_mu=0.5, beta_tol=1e-8)
    np.testing.assert_allclose(b1, b2, rtol=1e-10)
    np.testing.assert_allclose(m1, m2, rtol=1e-10)
    np.testing.assert_allclose(h1, h2, rtol=1e-10)


def test_alpha_mle_sharded_matches_unsharded(mesh):
    counts, sf, X, disp = _make_data(seed=1)
    inf_plain = JaxInference()
    inf_mesh = JaxInference(mesh=mesh)
    mu = inf_plain.lin_reg_mu(counts, sf, X, min_mu=0.5)
    a1, _ = inf_plain.alpha_mle(counts, X, mu, disp, 1e-8, 20.0)
    a2, _ = inf_mesh.alpha_mle(counts, X, mu, disp, 1e-8, 20.0)
    # SPMD reduction order can flip the Newton polish by one ulp-level step
    np.testing.assert_allclose(a1, a2, rtol=1e-5)


def test_fused_pipeline_sharded(mesh):
    counts, sf, X, _ = _make_data(G=64, N=16, seed=2)
    counts_gm = counts.T  # gene-major
    counts_gm[0, :] = 0  # all-zero lane
    counts_padded, g_orig = pad_to_multiple(counts_gm, 8, fill=1)

    contrast = np.array([0.0, 1.0])
    gene_sh = NamedSharding(mesh, P("genes", None))
    repl = NamedSharding(mesh, P())
    c_d = jax.device_put(jnp.asarray(counts_padded), gene_sh)
    X_d = jax.device_put(jnp.asarray(X), repl)
    cv_d = jax.device_put(jnp.asarray(contrast), repl)

    out_sharded = wald_pipeline(
        c_d, X_d, cv_d, jnp.asarray(0.0), max_disp=float(max(10, X.shape[0]))
    )
    out_plain = wald_pipeline(
        jnp.asarray(counts_padded),
        jnp.asarray(X),
        jnp.asarray(contrast),
        jnp.asarray(0.0),
        max_disp=float(max(10, X.shape[0])),
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded["p_values"])[:g_orig],
        np.asarray(out_plain["p_values"])[:g_orig],
        rtol=1e-4,
        equal_nan=True,
    )
    # gene-major outputs stay sharded over the mesh
    assert out_sharded["lfc"].sharding.is_equivalent_to(gene_sh, 2)


def test_gene_batching_matches_single_program():
    counts, sf, X, disp = _make_data(G=100, N=15, seed=3)
    inf_one = JaxInference()
    inf_chunked = JaxInference(gene_batch_size=32)
    b1, m1, h1, _ = inf_one.irls(counts, sf, X, disp, min_mu=0.5, beta_tol=1e-8)
    b2, m2, h2, _ = inf_chunked.irls(counts, sf, X, disp, min_mu=0.5, beta_tol=1e-8)
    np.testing.assert_allclose(b1, b2, rtol=1e-10)
    a1, _ = inf_one.alpha_mle(counts, X, m1, disp, 1e-8, 20.0)
    a2, _ = inf_chunked.alpha_mle(counts, X, m1, disp, 1e-8, 20.0)
    np.testing.assert_allclose(a1, a2, rtol=1e-10)


def test_fused_pipeline_matches_model_layer(counts_df, metadata):
    """The fused single-program pipeline reproduces the stage-by-stage driver
    (and hence the R golden results) on the synthetic dataset."""
    from pydeseq2_tpu import DeseqDataSet, DeseqStats

    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        design="~condition",
        refit_cooks=False,
        quiet=True,
    )
    dds.deseq2()
    ds = DeseqStats(
        dds,
        contrast=["condition", "B", "A"],
        cooks_filter=False,
        independent_filter=False,
        quiet=True,
    )
    ds.summary()

    out = wald_pipeline(
        jnp.asarray(counts_df.values.T.astype(float)),
        jnp.asarray(dds.obsm["design_matrix"].values),
        jnp.asarray(np.array([0.0, 1.0])),
        jnp.asarray(0.0),
        max_disp=float(max(10, counts_df.shape[0])),
        trend_type="parametric",
    )
    np.testing.assert_allclose(
        np.asarray(out["p_values"]), ds.p_values.values, rtol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["lfc"])[:, 1],
        dds.varm["LFC"].values[:, 1],
        rtol=1e-4,
    )


def test_fused_pipeline_multifactor_irls_mu_init(counts_df, metadata):
    """Multifactor design: the fused path with mu_init='irls' (the stage
    driver's choice when design groups are not 1:1 with columns, reference
    pydeseq2/dds.py:743-765) reproduces the stage-by-stage driver."""
    from pydeseq2_tpu import DeseqDataSet, DeseqStats

    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        design="~group + condition",
        refit_cooks=False,
        quiet=True,
    )
    dds.deseq2()
    ds = DeseqStats(
        dds,
        contrast=["condition", "B", "A"],
        cooks_filter=False,
        independent_filter=False,
        quiet=True,
    )
    ds.summary()

    contrast = dds.contrast(
        column="condition", baseline="A", group_to_compare="B"
    )
    out = wald_pipeline(
        jnp.asarray(counts_df.values.T.astype(float)),
        jnp.asarray(dds.obsm["design_matrix"].values),
        jnp.asarray(np.asarray(contrast, float)),
        jnp.asarray(0.0),
        max_disp=float(max(10, counts_df.shape[0])),
        trend_type="parametric",
        mu_init="irls",
    )
    np.testing.assert_allclose(
        np.asarray(out["p_values"]), ds.p_values.values, rtol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["lfc"]), dds.varm["LFC"].values, rtol=5e-3, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out["genewise_dispersions"]),
        dds.var["genewise_dispersions"].values,
        rtol=5e-3,
    )


def test_streamed_pipeline_sharded(mesh):
    """The gene-streamed program runs sharded over the mesh == unsharded.

    This is the real pod deployment shape (atlas scale: gene-sharded across
    devices AND block-streamed within each); only SPMD reduction-order noise
    (~1e-8 relative) may differ.
    """
    from pydeseq2_tpu.fused import summary_host_inputs
    from pydeseq2_tpu.fused_stream import summary_pipeline_streamed

    counts, sf, X, _ = _make_data(G=64, N=16, seed=4)
    counts_gm = counts.T
    counts_gm[0, :] = 0
    host = summary_host_inputs(X)
    args = dict(
        gene_block=8,
        cohort_ids=host["cohort_ids"],
        use_for_max=host["use_for_max"],
        mu_init=host["mu_init"],
        max_disp=float(max(10, X.shape[0])),
    )

    gene_sh = NamedSharding(mesh, P("genes", None))
    repl = NamedSharding(mesh, P())
    c_sh = jax.device_put(jnp.asarray(counts_gm), gene_sh)
    out_sh = summary_pipeline_streamed(
        c_sh,
        jax.device_put(jnp.asarray(X), repl),
        jax.device_put(jnp.asarray([0.0, 1.0]), repl),
        jnp.asarray(0.0),
        jnp.asarray(host["cooks_cutoff"]),
        **args,
    )
    out = summary_pipeline_streamed(
        jnp.asarray(counts_gm),
        jnp.asarray(X),
        jnp.asarray([0.0, 1.0]),
        jnp.asarray(0.0),
        jnp.asarray(host["cooks_cutoff"]),
        **args,
    )
    for key in ("padj", "p_values", "dispersions"):
        np.testing.assert_allclose(
            np.asarray(out_sh[key]), np.asarray(out[key]), rtol=1e-5,
            equal_nan=True, err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(out_sh["lfc"]), np.asarray(out["lfc"]), rtol=1e-5,
        equal_nan=True,
    )


def test_streamed_refit_sharded_at_scale_matches_unsharded(mesh):
    """Streamed summary + Cook's refit over the 8-device mesh at a size
    where blocks and refit compaction are non-trivial: G=32768 genes in
    gene_block=4096 tiles with injected outliers spread across shards, so
    the compacted refit tile is REAL (replacement + re-fit actually run).
    The sharded run must reproduce the single-device run (reference
    semantics: pydeseq2/dds.py:1042-1064,1301-1458).
    """
    from pydeseq2_tpu.fused_stream import run_summary_streamed

    rng = np.random.default_rng(7)
    G, N = 32768, 16
    cond = np.repeat([0.0, 1.0], N // 2)  # two 8-replicate cohorts (>= 7)
    X = np.column_stack([np.ones(N), cond])
    mu = np.exp(rng.normal(3, 1, (G, 1))) * np.exp(cond[None, :] * rng.normal(0, 0.5, (G, 1)))
    disp = np.clip(rng.lognormal(-2, 1, (G, 1)), 1e-3, 2.0)
    counts = rng.negative_binomial(1 / disp, 1 / (1 + disp * mu)).astype(float)
    counts[0, :] = 0  # all-zero lane
    # inject Cook's outliers in lanes spread across all 8 shards
    outlier_lanes = np.arange(16) * (G // 16) + 5
    counts[outlier_lanes, 3] = 1e6

    args = dict(
        gene_block=4096,
        refit_cooks=True,
        max_disp=float(max(10, N)),
    )
    base = run_summary_streamed(counts, X, [0.0, 1.0], **args)
    assert base["replaced"].sum() >= len(outlier_lanes)
    assert base["refitted"].sum() > 0

    gene_sh = NamedSharding(mesh, P("genes", None))
    counts_sh = jax.device_put(jnp.asarray(counts), gene_sh)
    shard = run_summary_streamed(counts_sh, X, [0.0, 1.0], **args)

    np.testing.assert_array_equal(shard["replaced"], base["replaced"])
    np.testing.assert_array_equal(shard["refitted"], base["refitted"])
    for key in ("p_values", "padj", "dispersions", "se", "base_mean"):
        np.testing.assert_allclose(
            np.asarray(shard[key]), np.asarray(base[key]), rtol=1e-12,
            atol=0, equal_nan=True, err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(shard["lfc"]), np.asarray(base["lfc"]), rtol=1e-12,
        equal_nan=True,
    )
