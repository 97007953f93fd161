"""Numerical property tests for the core device kernels.

Mirrors reference tests/test_utils.py:11-33 (nb_nll is a proper probability
distribution) and adds kernel-level checks with no reference counterpart
(batched-vs-scalar consistency, BH against a direct implementation).
"""

import numpy as np
import jax.numpy as jnp

from pydeseq2_tpu.ops.nb import nb_nll, dnb_nll
from pydeseq2_tpu.ops.stats import bh_adjust_masked, trimmed_mean, mean_absolute_deviation


def test_nb_nll_moments():
    """Probabilities sum to 1; Monte-Carlo moments match mu and mu(1+a*mu)."""
    np.random.seed(42)
    alpha = 0.5
    mu = 10.0
    # NB(mu, alpha) with r = 1/alpha, p = 1/(1+alpha*mu)
    r = 1 / alpha
    p = 1 / (1 + alpha * mu)
    samples = np.random.negative_binomial(r, p, size=100_000)
    assert abs(samples.mean() - mu) / mu < 0.02
    assert abs(samples.var() - mu * (1 + alpha * mu)) / (mu * (1 + alpha * mu)) < 0.05

    # Probability mass from nb_nll over a wide support sums to ~1.
    ks = np.arange(0, 500)
    nll = np.array(
        [float(nb_nll(jnp.array([float(k)]), jnp.array([mu]), alpha)) for k in ks[:200]]
    )
    probs = np.exp(-nll)
    assert abs(probs.sum() - 1.0) < 1e-6


def test_dnb_nll_matches_finite_difference():
    rng = np.random.default_rng(0)
    counts = jnp.asarray(rng.poisson(15.0, 30).astype(float))
    mu = jnp.asarray(rng.uniform(5, 25, 30))
    alpha = 0.3
    eps = 1e-6
    fd = (
        float(nb_nll(counts, mu, alpha + eps)) - float(nb_nll(counts, mu, alpha - eps))
    ) / (2 * eps)
    an = float(dnb_nll(counts, mu, alpha))
    assert abs(fd - an) / abs(fd) < 1e-5


def test_nb_nll_batched_consistency():
    rng = np.random.default_rng(1)
    counts = rng.poisson(10.0, (7, 20)).astype(float)
    mu = rng.uniform(5, 15, (7, 20))
    alpha = rng.uniform(0.05, 1.0, 7)
    batched = np.asarray(nb_nll(jnp.asarray(counts), jnp.asarray(mu), jnp.asarray(alpha)))
    singles = np.array(
        [
            float(nb_nll(jnp.asarray(counts[i]), jnp.asarray(mu[i]), float(alpha[i])))
            for i in range(7)
        ]
    )
    np.testing.assert_allclose(batched, singles, rtol=1e-12)


def test_bh_matches_direct():
    from scipy.stats import false_discovery_control

    rng = np.random.default_rng(2)
    p = rng.uniform(0, 1, 200)
    mask = rng.uniform(0, 1, 200) > 0.3
    adj = np.asarray(bh_adjust_masked(jnp.asarray(p), jnp.asarray(mask)))
    expected = false_discovery_control(p[mask], method="bh")
    np.testing.assert_allclose(adj[mask], expected, rtol=1e-12)
    assert np.isnan(adj[~mask]).all()


def test_trimmed_mean_matches_reference_semantics():
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (25, 4))
    ours = np.asarray(trimmed_mean(jnp.asarray(x), trim=0.2, axis=0))
    # floor(25*0.2)=5 trimmed each side
    s = np.sort(x, axis=0)
    expected = s[5:20].mean(0)
    np.testing.assert_allclose(ours, expected, rtol=1e-12)


def test_mad():
    x = np.array([1.0, 2.0, 3.0, 4.0, 100.0])
    got = float(mean_absolute_deviation(jnp.asarray(x)))
    from scipy.stats import norm

    expected = np.median(np.abs(x - np.median(x))) / norm.ppf(0.75)
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_fused_rescue_compaction_scatter():
    """The in-program rescue gathers flagged lanes and scatters back cleanly.

    The fused rescue runs on an argsort-compacted (K, N) lane block; this
    pins the two properties the compaction must preserve on a lane that
    exercises the FULL cascade (a perfectly-separated gene whose NLL optimum
    lies outside the |beta| <= 30 box, so IRLS diverges, the Newton box
    solver reports failure, and the P == 2 grid tier fires): (a) the flagged
    lane ends up with exactly the direct single-lane grid solution, and
    (b) every unflagged lane's coefficients are bit-identical to the plain
    irls_core result (the scatter touches nothing else).
    """
    from pydeseq2_tpu.fused import _irls_with_rescue
    from pydeseq2_tpu.ops.irls import grid_fit_beta_batch, irls_beta_init, irls_core

    rng = np.random.default_rng(0)
    N, G = 8, 8
    X = jnp.asarray(
        np.column_stack([np.ones(N), [0, 0, 0, 0, 1, 1, 1, 1]]).astype(float)
    )
    sf = jnp.ones(N, jnp.float64)
    counts = rng.poisson(50, (G, N)).astype(float)
    counts[3, :4] = 0.0
    counts[3, 4:] = 2e15  # true LFC ~ log(4e15) > 30: diverges in IRLS
    counts = jnp.asarray(counts)
    disp = jnp.full(G, 0.1, jnp.float64)
    bi = irls_beta_init(counts, sf, X)

    beta_plain, needs_fb, _ = irls_core(counts, sf, X, disp, bi)
    assert bool(needs_fb[3]) and int(needs_fb.sum()) == 1

    beta, converged, overflow = _irls_with_rescue(
        counts, sf, X, disp, bi, min_mu=0.5, beta_tol=1e-8
    )
    # One flagged lane, budget K >= 512: nothing overflows the rescue tile.
    assert int(overflow) == 0
    # The Newton tier must have reported failure for this lane (its box has
    # no interior optimum), handing it to the grid tier:
    assert not bool(converged[3])
    # (a) flagged lane == the direct single-lane grid solve
    b_grid = grid_fit_beta_batch(counts[3:4], sf, X, disp[3:4], min_mu=0.5)
    np.testing.assert_allclose(
        np.asarray(beta)[3], np.asarray(b_grid)[0], rtol=1e-12
    )
    # (b) unflagged lanes untouched by the scatter
    keep = ~np.asarray(needs_fb)
    np.testing.assert_array_equal(
        np.asarray(beta)[keep], np.asarray(beta_plain)[keep]
    )


def test_bh_shared_order_matches_per_row():
    """The shared-argsort BH path == the per-row-sort path, ties included.

    The independent-filtering sweep passes one p-vector with 50 nested
    masks; the shared path does a single global sort. BH is invariant to
    how a sort permutes a tie run (every element of the run gets the same
    adjusted value), which this pins with heavily tied p-values.
    """
    rng = np.random.default_rng(5)
    G, M = 400, 13
    p = rng.uniform(0, 1, G)
    p[rng.choice(G, 120, replace=False)] = np.round(
        rng.uniform(0, 1, 120), 1
    )  # force many exact ties
    base = rng.lognormal(2, 1, G)
    cutoffs = np.quantile(base, np.linspace(0, 0.9, M))
    masks = base[None, :] >= cutoffs[:, None]

    shared = np.asarray(bh_adjust_masked(jnp.asarray(p), jnp.asarray(masks)))
    per_row = np.asarray(
        bh_adjust_masked(
            jnp.asarray(np.broadcast_to(p, (M, G)).copy()), jnp.asarray(masks)
        )
    )
    np.testing.assert_allclose(shared, per_row, rtol=1e-12, equal_nan=True)


def test_bh_mid_ndim_p_falls_through_to_per_row():
    """1 < p.ndim < mask.ndim must NOT take the shared-argsort branch.

    The shared branch's jnp.take fancy-indexing would silently mis-shape a
    2-D p against a 3-D mask; the guard routes it to the per-row path,
    which broadcasts. Pinned against explicitly-broadcast per-row calls.
    """
    rng = np.random.default_rng(7)
    B, M, G = 3, 4, 50
    p = rng.uniform(0, 1, (M, G))  # shared across the leading B axis
    masks = rng.uniform(0, 1, (B, M, G)) > 0.3

    got = np.asarray(bh_adjust_masked(jnp.asarray(p), jnp.asarray(masks)))
    assert got.shape == (B, M, G)
    want = np.asarray(
        bh_adjust_masked(
            jnp.asarray(np.broadcast_to(p, (B, M, G)).copy()),
            jnp.asarray(masks),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)


def test_bh_nan_inside_mask_is_isolated():
    """A NaN p inside the mask gets NaN out without poisoning the row.

    (Defensive: callers pre-mask NaNs, but a NaN reaching the
    right-to-left cummin sweep would corrupt every other entry.)
    """
    p = np.array([0.01, np.nan, 0.2, 0.03, 0.5])
    mask = np.ones(5, dtype=bool)

    got = np.asarray(bh_adjust_masked(jnp.asarray(p), jnp.asarray(mask)))
    assert np.isnan(got[1])
    clean = np.asarray(
        bh_adjust_masked(
            jnp.asarray(p), jnp.asarray([True, False, True, True, True])
        )
    )
    np.testing.assert_allclose(got, clean, rtol=1e-12, equal_nan=True)

    # Same isolation on the per-row (2-D) path.
    got2 = np.asarray(
        bh_adjust_masked(
            jnp.asarray(np.stack([p, p])), jnp.asarray(np.stack([mask, mask]))
        )
    )
    np.testing.assert_allclose(got2[0], clean, rtol=1e-12, equal_nan=True)


def test_fused_rescue_full_width_fallback_on_overflow():
    """When > K lanes are unfinished after phase 1, the continuation falls
    back to the full-width while_loop instead of freezing beyond-K lanes at
    their phase-1 iterate (ADVICE r3: robustness in the >1.5%-unfinished
    regime). With the full remaining budget every lane here converges to
    the same solution as a single full-width IRLS, and overflow stays 0.
    """
    from pydeseq2_tpu.fused import _irls_with_rescue
    from pydeseq2_tpu.ops.irls import irls_beta_init, irls_core

    rng = np.random.default_rng(1)
    N, G = 12, 1024  # K = max(512, G//64) = 512 < G
    cond = np.repeat([0.0, 1.0], N // 2)
    X = jnp.asarray(np.column_stack([np.ones(N), cond]))
    sf = jnp.ones(N, jnp.float64)
    mu = rng.lognormal(3, 1, (G, 1)) * np.exp(cond[None, :] * rng.normal(0, 1, (G, 1)))
    disp_np = np.clip(rng.lognormal(-1, 1, G), 1e-3, 5.0)
    counts = jnp.asarray(
        rng.negative_binomial(
            1 / disp_np[:, None], 1 / (1 + disp_np[:, None] * mu)
        ).astype(float)
    )
    disp = jnp.asarray(disp_np)
    bi = irls_beta_init(counts, sf, X)

    # phase1_iters=1 leaves (nearly) every lane unfinished -> n_unfinished
    # > K -> the full-width continuation branch.
    _, unfinished_after_1, _ = irls_core(counts, sf, X, disp, bi, maxiter=1)
    assert int(unfinished_after_1.sum()) > 512

    beta, converged, overflow = _irls_with_rescue(
        counts, sf, X, disp, bi, min_mu=0.5, beta_tol=1e-8, phase1_iters=1
    )
    beta_ref, needs_fb_ref, conv_ref = irls_core(
        counts, sf, X, disp, bi, maxiter=250
    )
    assert int(overflow) == 0
    assert bool(converged.all())
    assert bool(conv_ref.all())
    np.testing.assert_allclose(
        np.asarray(beta), np.asarray(beta_ref), rtol=1e-6, atol=1e-8
    )


def test_order_stats_select_bit_identical_to_sort():
    """Radix-bisection order statistics == sort-gather, bit for bit.

    The size-factor medians (ops/select.py) replace per-sample sorts; the
    selector must return the exact element a sort would — ties, +inf
    exclusion markers and ragged per-column ranks included — in both
    dtypes (f32 TPU path, f64 CPU golden path).
    """
    from pydeseq2_tpu.ops.select import masked_median_select, order_stats_select

    rng = np.random.default_rng(3)
    for dtype in (np.float32, np.float64):
        G, N = 513, 11
        x = rng.normal(0, 3, (G, N)).astype(dtype)
        tie_mask = rng.uniform(size=(G, N)) < 0.3
        x[tie_mask] = np.round(rng.normal(0, 1), 1)  # heavy exact ties
        valid = rng.uniform(size=(G, N)) < 0.8
        xv = np.where(valid, x, np.inf).astype(dtype)
        nv = valid.sum(0)

        med = np.asarray(masked_median_select(jnp.asarray(xv), jnp.asarray(nv)))
        s = np.sort(xv, axis=0)
        cols = np.arange(N)
        want = (s[(nv - 1) // 2, cols] + s[nv // 2, cols]) / 2.0
        np.testing.assert_array_equal(med, want)

        lo, hi = order_stats_select(
            jnp.asarray(xv), (jnp.asarray(np.full(N, 3)), jnp.asarray(nv - 1))
        )
        np.testing.assert_array_equal(np.asarray(lo), s[3, cols])
        np.testing.assert_array_equal(np.asarray(hi), s[nv - 1, cols])

    # empty columns give NaN
    m = np.asarray(
        masked_median_select(
            jnp.asarray(np.full((5, 2), np.inf)), jnp.asarray([0, 0])
        )
    )
    assert np.isnan(m).all()


def test_trimmed_mean_select_matches_sort_kernel():
    """Selection-based trimmed mean == sort-slice-mean up to fp summation
    order (same kept multiset, boundary ties counted exactly).

    The long-axis gate in ops/stats.trimmed_mean routes atlas-scale trim
    axes here — the sorted kernel's per-column bitonic sorts dominated the
    Cook's stage at 10k samples.
    """
    import math

    from pydeseq2_tpu.ops.select import trimmed_mean_select

    rng = np.random.default_rng(0)
    for dtype, rtol, atol in (
        (np.float32, 1e-5, 5e-6),
        (np.float64, 1e-12, 1e-13),
    ):
        for (n, m, trim) in ((2000, 37, 1 / 8), (1024, 5, 1 / 3), (4096, 11, 0.2)):
            x = rng.normal(0, 3, (n, m)).astype(dtype)
            tie = rng.uniform(size=(n, m)) < 0.4
            x[tie] = np.round(rng.normal(0, 1, tie.sum()), 1).astype(dtype)
            k = math.floor(n * trim)
            s = np.sort(x, axis=0)
            want = s[k : n - k].mean(0)
            got = np.asarray(trimmed_mean_select(jnp.asarray(x), trim, axis=0))
            np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
        # constant columns hit the v_lo == v_hi branch
        x2 = np.full((2048, 3), 2.5, dtype)
        x2[:5, 1] = 99.0
        got2 = np.asarray(trimmed_mean_select(jnp.asarray(x2), 1 / 8, axis=0))
        s2 = np.sort(x2, axis=0)
        np.testing.assert_allclose(got2, s2[256:-256].mean(0), rtol=1e-6)


def test_closed_form_fgh_matches_autodiff():
    """ops/nb.py::nb_nll_centered_fgh (+ the Cox-Reid/prior closed-form
    pieces in the dispersion Newton) must equal jax autodiff of the same
    objective: f64 to 1e-9 relative, f32 near-exact too (same approximation
    chains, different evaluation order)."""
    import jax
    import jax.numpy as jnp

    from pydeseq2_tpu.ops.dispersion import _alpha_objective
    from pydeseq2_tpu.ops.nb import nb_nll_centered_fgh
    from pydeseq2_tpu.ops.smalllinalg import sym_inv, sym_logdet

    rng = np.random.default_rng(3)
    G, N, P = 64, 37, 2
    base = rng.lognormal(2.0, 1.5, size=G)
    mu = np.maximum(
        base[:, None] * rng.lognormal(0.0, 0.3, size=(G, N)), 0.5
    )
    disp = np.clip(rng.lognormal(-2.0, 1.5, size=G), 1e-6, 20.0)
    counts = rng.negative_binomial(
        1 / disp[:, None], 1 / (1 + disp[:, None] * mu)
    ).astype(float)
    X = np.column_stack([np.ones(N), rng.integers(0, 2, N)]).astype(float)
    # spread la over BOTH branches incl. near the r=8 switch
    la = rng.uniform(np.log(1e-7), np.log(20.0), size=G)

    for dtype, rtol in ((jnp.float64, 1e-9), (jnp.float32, 2e-4)):
        c = jnp.asarray(counts, dtype)
        m = jnp.asarray(mu, dtype)
        Xd = jnp.asarray(X, dtype)
        lad = jnp.asarray(la, dtype)
        lah = jnp.asarray(np.log(np.clip(disp, 1e-8, 10.0)), dtype)
        for cr_reg, prior_reg in ((False, False), (True, False), (True, True)):

            def obj(la_):
                return _alpha_objective(
                    la_, c, Xd, m, lah, jnp.asarray(0.7, dtype), cr_reg,
                    prior_reg,
                )

            def obj_and_grad(la_):
                f, vjp_fn = jax.vjp(obj, la_)
                (g,) = vjp_fn(jnp.ones_like(f))
                return f, g

            (f_ad, g_ad), (_, h_ad) = jax.jvp(
                obj_and_grad, (lad,), (jnp.ones_like(lad),)
            )

            f, g, h = nb_nll_centered_fgh(c, m, lad)
            if cr_reg:
                a = jnp.exp(lad)[:, None]
                W = m / (1.0 + m * a)
                Wd1 = -a * W * W
                Wd2 = Wd1 * (1.0 - 2.0 * a * W)
                M = jnp.einsum("gn,np,nq->gpq", W, Xd, Xd)
                M1 = jnp.einsum("gn,np,nq->gpq", Wd1, Xd, Xd)
                M2 = jnp.einsum("gn,np,nq->gpq", Wd2, Xd, Xd)
                Minv = sym_inv(M)
                A = jnp.einsum("gpq,gqr->gpr", Minv, M1)
                f = f + 0.5 * sym_logdet(M)
                g = g + 0.5 * jnp.einsum("gpp->g", A)
                h = h + 0.5 * (
                    jnp.einsum("gpq,gqp->g", Minv, M2)
                    - jnp.einsum("gpq,gqp->g", A, A)
                )
            if prior_reg:
                d = lad - lah
                f = f + d * d / (2.0 * jnp.asarray(0.7, dtype))
                g = g + d / jnp.asarray(0.7, dtype)
                h = h + 1.0 / jnp.asarray(0.7, dtype)

            scale_f = np.abs(np.asarray(f_ad)) + 1.0
            np.testing.assert_allclose(
                np.asarray(f), np.asarray(f_ad), rtol=rtol, atol=rtol,
                err_msg=f"f {dtype} cr={cr_reg} prior={prior_reg}",
            )
            for name, got, want in (("g", g, g_ad), ("h", h, h_ad)):
                np.testing.assert_allclose(
                    np.asarray(got) / scale_f,
                    np.asarray(want) / scale_f,
                    rtol=rtol,
                    atol=10 * rtol,
                    err_msg=f"{name} {dtype} cr={cr_reg} prior={prior_reg}",
                )
