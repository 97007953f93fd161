"""Float32 (TPU-speed path) accuracy guarantees vs float64.

The conformance path is f64 (golden tests); f32 is the TPU-native dtype used
by bench.py. Per-gene dispersion MLEs on likelihood plateaus (alpha << 1/mu,
where the NB likelihood is flat to below f32 resolution) are not comparable
across precisions - these tests pin the guarantees that ARE made:

- the stable/centered NB objective evaluates identically across precisions
  (no catastrophic cancellation at small alpha),
- end-to-end significance calls agree,
- test statistics of significant genes agree at the few-percent level.
"""

import jax.numpy as jnp
import numpy as np

from pydeseq2_tpu.fused import wald_pipeline
from pydeseq2_tpu.ops.nb import nb_nll, nb_nll_centered


def _make_data(G=768, N=60, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.lognormal(3.0, 1.5, size=G)
    lfc = rng.normal(0, 0.5, size=G)
    cond = rng.integers(0, 2, N)
    X = np.column_stack([np.ones(N), cond]).astype(float)
    mu = base[None, :] * np.exp(cond[:, None] * lfc[None, :])
    disp = np.clip(rng.lognormal(-2.0, 1.0, size=G), 1e-3, 5.0)
    counts = rng.negative_binomial(1 / disp[None, :], 1 / (1 + disp[None, :] * mu))
    return counts.T.astype(float), X


def test_nb_nll_f32_no_cancellation():
    """The raw NLL stays accurate in f32 down to alpha = min_disp."""
    rng = np.random.default_rng(0)
    y = rng.poisson(5000, (8, 100)).astype(float)
    mu = rng.uniform(3000, 8000, (8, 100))
    for a in [1e-8, 1e-4, 0.01, 0.5]:
        v64 = np.asarray(nb_nll(jnp.asarray(y), jnp.asarray(mu), jnp.full((8,), a)))
        v32 = np.asarray(
            nb_nll(
                jnp.asarray(y, jnp.float32),
                jnp.asarray(mu, jnp.float32),
                jnp.full((8,), a, jnp.float32),
            )
        )
        # Ordinary f32 summation rounding allows ~1e-4; the failure mode this
        # guards against (pre-fix) was errors of order 1e0-1e2.
        assert np.abs(v32 / v64 - 1).max() < 1e-3, a


def test_nb_nll_centered_absolute_accuracy():
    """The centered objective's f32 ABSOLUTE error is small enough to resolve
    dispersion optima (the property the dispersion solver relies on)."""
    rng = np.random.default_rng(1)
    y = rng.poisson(5000, (8, 100)).astype(float)
    mu = rng.uniform(3000, 8000, (8, 100))
    for a in [1e-8, 1e-4, 0.01, 0.5]:
        v64 = np.asarray(
            nb_nll_centered(jnp.asarray(y), jnp.asarray(mu), jnp.full((8,), a))
        )
        v32 = np.asarray(
            nb_nll_centered(
                jnp.asarray(y, jnp.float32),
                jnp.asarray(mu, jnp.float32),
                jnp.full((8,), a, jnp.float32),
            )
        )
        assert np.abs(v32 - v64).max() < 0.2, a


def test_f32_pipeline_significance_concordance():
    counts, X = _make_data()
    out64 = wald_pipeline(
        jnp.asarray(counts),
        jnp.asarray(X),
        jnp.asarray([0.0, 1.0]),
        jnp.asarray(0.0),
        max_disp=100.0,
        beta_tol=1e-8,
    )
    out32 = wald_pipeline(
        jnp.asarray(counts, jnp.float32),
        jnp.asarray(X, jnp.float32),
        jnp.asarray([0.0, 1.0], jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        max_disp=100.0,
        beta_tol=1e-6,
    )
    pv64 = np.asarray(out64["p_values"])
    pv32 = np.asarray(out32["p_values"])
    st64 = np.asarray(out64["statistics"])
    st32 = np.asarray(out32["statistics"])
    m = np.isfinite(pv64)
    concordance = ((pv32[m] < 0.05) == (pv64[m] < 0.05)).mean()
    assert concordance > 0.98, concordance

    sig = m & (np.abs(st64) > 2)
    rel = np.abs(st32[sig] - st64[sig]) / np.abs(st64[sig])
    assert np.median(rel) < 0.02, np.median(rel)


def test_f32_irls_step_tol_stops_stalled_lanes():
    """f32 IRLS lanes whose iterates stop moving must count as converged.

    In f32 the deviance difference carries O(eps*|dev|) roundoff, so a lane
    can oscillate around the ratio threshold for all 250 iterations even
    though the same lane converges immediately in f64 (such lanes used to be
    flagged for the expensive Newton rescue AND kept the while_loop at full
    width). The step_tol secondary stop (ops/irls.py) must (a) not change
    the fitted betas beyond iterate noise, (b) leave no maxiter stragglers
    on well-behaved data.
    """
    from pydeseq2_tpu.fused import _size_factors
    from pydeseq2_tpu.ops.dispersion import alpha_mle_batch
    from pydeseq2_tpu.ops.irls import irls_beta_init, irls_core
    from pydeseq2_tpu.ops.linreg import (
        fit_lin_mu_batch,
        fit_moments_dispersions_batch,
        fit_rough_dispersions_batch,
    )

    counts, X = _make_data(G=512, N=100, seed=11)
    cnt = jnp.asarray(counts, jnp.float32)
    Xd = jnp.asarray(X, jnp.float32)
    sf, _ = _size_factors(cnt, jnp.ones((cnt.shape[0],), bool))
    normed = cnt / sf[None, :]
    mom = jnp.clip(
        jnp.minimum(
            fit_rough_dispersions_batch(normed, Xd),
            fit_moments_dispersions_batch(normed, sf),
        ),
        1e-8,
        100.0,
    )
    mu = fit_lin_mu_batch(cnt, sf, Xd, 0.5)
    disp, _ = alpha_mle_batch(cnt, Xd, mu, mom, 1e-8, 100.0)
    bi = irls_beta_init(cnt, sf, Xd)

    beta, needs_fb, conv = irls_core(cnt, sf, Xd, disp, bi, min_mu=0.5, beta_tol=1e-6)
    assert not bool(np.asarray(needs_fb).any())

    # Betas match the no-step-tol run to iterate noise plus the bounded
    # post-loop Newton polish (capped at 100x step_tol per step).
    beta0, _, _ = irls_core(
        cnt, sf, Xd, disp, bi, min_mu=0.5, beta_tol=1e-6, step_tol=0.0
    )
    assert np.abs(np.asarray(beta) - np.asarray(beta0)).max() < 3e-3

    # The polished solution stays within the f32 gradient-resolution bound
    # of the f64 optimum. (Per lane the polish converges to the root of the
    # f32-evaluated gradient; for large-count lanes that root sits up to
    # ~1e-4 in log-units from the f64 root — a dtype limit, not a solver
    # property. On the small-count golden fixtures the same polish lands
    # ~1e-7 from the R solution; tests/test_pipeline.py pins those.)
    cnt64 = jnp.asarray(counts, jnp.float64)
    X64 = jnp.asarray(X, jnp.float64)
    beta64, _, _ = irls_core(
        cnt64,
        sf.astype(jnp.float64),
        X64,
        disp.astype(jnp.float64),
        bi.astype(jnp.float64),
        min_mu=0.5,
        beta_tol=1e-8,
        step_tol=0.0,
    )
    err_polished = np.abs(np.asarray(beta) - np.asarray(beta64)).max()
    assert err_polished < 1e-3


def test_f32_golden_scheme_single_factor():
    """The f32 staged pipeline passes the reference tolerance scheme vs R.

    This is the criterion the on-device conformance artifact reports
    (benchmarks/tpu_conformance.py): rel. err < 2% on log2FoldChange /
    pvalue / padj with identical NaN masks, in float32 with the f32 stopping
    rules. The LFC bar is only reachable because of the gradient-guarded
    post-IRLS Newton polish (ops/irls.py): without it the near-zero-LFC gene
    carries ~3e-5 absolute log2 error, 2.2% relative.
    """
    import pandas as pd

    from conftest import data_path
    from pydeseq2_tpu import DeseqDataSet, DeseqStats
    from pydeseq2_tpu.utils import load_example_data

    counts_df = load_example_data("raw_counts")
    metadata = load_example_data("metadata")
    r_res = pd.read_csv(data_path("single_factor", "r_test_res.csv"), index_col=0)

    import jax

    with jax.enable_x64(False):
        dds = DeseqDataSet(
            counts=counts_df,
            metadata=metadata,
            design="~condition",
            beta_tol=1e-6,
            quiet=True,
        )
        dds.deseq2()
        ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
        ds.summary()

    res = ds.results_df
    assert (res.pvalue.isna() == r_res.pvalue.isna()).all()
    assert (res.padj.isna() == r_res.padj.isna()).all()
    for col in ("log2FoldChange", "pvalue", "padj"):
        rel = (abs(r_res[col] - res[col]) / abs(r_res[col])).max()
        assert rel < 0.02, (col, rel)


def test_f32_stirling_lgamma_accuracy():
    """The shifted-Stirling lgamma (the f32 dispersion-Newton hot path,
    ops/nb.py) stays within f32 rounding of scipy's gammaln across the
    whole argument domain the NB objective uses (z = counts + r, counts up
    to ~1e6, r down to min_disp scales).

    Guarantee: relative error <= 1e-5 for z >= 1 (values O(1)..O(1e7)) and
    absolute error <= 5e-5 for z < 1 (values O(1); the f32 product chain's
    rounding). The library's own f32 evaluation carries comparable error —
    this bounds the swap's contribution, not just matches it.
    """
    import numpy as np
    from scipy.special import gammaln as scipy_gammaln

    from pydeseq2_tpu.ops.nb import _lgamma_stirling8

    z = np.concatenate(
        [
            np.geomspace(1e-3, 1.0, 200, endpoint=False),
            np.geomspace(1.0, 8.0, 200, endpoint=False),
            np.geomspace(8.0, 2e6, 400),
        ]
    )
    got = np.asarray(_lgamma_stirling8(jnp.asarray(z, jnp.float32)), float)
    want = scipy_gammaln(z)
    small = z < 1.0
    assert np.abs(got[small] - want[small]).max() <= 5e-5
    big = ~small
    rel = np.abs(got[big] - want[big]) / np.maximum(np.abs(want[big]), 1.0)
    assert rel.max() <= 1e-5

    # f64 stays on the library call (bit-identical CPU goldens).
    import jax

    if jax.config.jax_enable_x64:
        from jax.scipy.special import gammaln as jax_gammaln

        from pydeseq2_tpu.ops.nb import _lgamma_fast

        z64 = jnp.asarray(z, jnp.float64)
        np.testing.assert_array_equal(
            np.asarray(_lgamma_fast(z64)), np.asarray(jax_gammaln(z64))
        )
