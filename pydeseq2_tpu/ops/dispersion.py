"""Batched NB dispersion estimation in log-alpha (MLE / MAP).

Parity target (reference, owkin/PyDESeq2): pydeseq2/utils.py:441-564
(``fit_alpha_mle``: scipy L-BFGS-B on nll + Cox-Reid + prior, per gene in a
joblib pool) and pydeseq2/grid_search.py:54-142 (``grid_fit_alpha`` fallback).

TPU design: the objective is 1-D and bounded, so instead of translating the
scipy optimizer + fallback cascade we run, for EVERY gene at once:

  1. a coarse scan of the objective over ``grid_length`` points spanning
     [log(min_disp), log(max_disp)] (lax.scan, one (G,N) tile per step),
  2. (optionally, ``fine_length > 0``) a fine scan centered on each gene's
     coarse argmin,
  3. a few safeguarded Newton steps (autodiff gradient/curvature of the
     masked objective, step-clipped to the coarse spacing) to polish to
     machine-precision optimum — by default Newton starts directly at the
     coarse argmin (fine_length=0): the per-lane fine evals run the
     dual-branch objective (~5x a static coarse step on TPU) and the
     polish recovers the identical optimum (validated on the goldens).

This is deterministic, has no per-gene control flow, and subsumes both the
optimizer and the grid fallback of the reference (the grid *is* the primary
path). Gene lanes are independent -> shards trivially over a gene mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pydeseq2_tpu.ops.nb import _R_SWITCH, nb_nll_centered, nb_nll_centered_fgh
from pydeseq2_tpu.ops.smalllinalg import sym_inv, sym_logdet


def _alpha_objective(
    log_alpha: jnp.ndarray,
    counts: jnp.ndarray,
    design_matrix: jnp.ndarray,
    mu: jnp.ndarray,
    log_alpha_hat: jnp.ndarray,
    prior_disp_var,
    cr_reg: bool,
    prior_reg: bool,
    branch: str = "auto",
) -> jnp.ndarray:
    """Per-lane objective: nb_nll + Cox-Reid + optional log-normal prior.

    Parity: reference pydeseq2/utils.py:509-520.

    log_alpha: (G,). counts/mu: (G, N). Returns (G,).
    """
    alpha = jnp.exp(log_alpha)
    obj = nb_nll_centered(counts, mu, alpha, branch=branch)
    if cr_reg:
        W = mu / (1.0 + mu * alpha[:, None])  # (G, N)
        M = jnp.einsum("gn,np,nq->gpq", W, design_matrix, design_matrix, optimize=True)
        obj = obj + 0.5 * sym_logdet(M)
    if prior_reg:
        obj = obj + (log_alpha - log_alpha_hat) ** 2 / (2.0 * prior_disp_var)
    return obj


@partial(
    jax.jit,
    static_argnames=(
        "min_disp",
        "max_disp",
        "cr_reg",
        "prior_reg",
        "grid_length",
        "fine_length",
        "newton_iters",
        "return_coarse",
    ),
)
def alpha_mle_batch(
    counts: jnp.ndarray,
    design_matrix: jnp.ndarray,
    mu: jnp.ndarray,
    alpha_hat: jnp.ndarray,
    min_disp: float,
    max_disp: float,
    prior_disp_var: float | None = None,
    cr_reg: bool = True,
    prior_reg: bool = False,
    grid_length: int = 32,
    fine_length: int = 0,
    newton_iters: int = 4,
    return_coarse: bool = False,
    coarse_cache: jnp.ndarray | None = None,
):
    """Estimate per-gene dispersions by coarse->fine grid + Newton polish.

    Parameters
    ----------
    counts, mu : (G, N) gene-major tiles.
    design_matrix : (N, P), replicated.
    alpha_hat : (G,) initial/prior dispersions (the prior mean under
        ``prior_reg``).

    Returns
    -------
    alpha : (G,) fitted dispersions, in [min_disp, max_disp].
    converged : (G,) bool - the polished point passes a projected-Newton
        stationarity test: the predicted objective decrease of one more
        step (Newton decrement g^2/2h where curvature is positive, else a
        fine-grid-step move |g|*step2), with bound-outward gradient
        components projected to zero, is below a dtype-scaled relative
        tolerance. This mirrors the intent of the reference's per-gene
        L-BFGS-B ``res.success`` (pydeseq2/utils.py:554-564); the f64
        tolerance is floored at 1e-9 relative so it is not dramatically
        stricter than scipy's default ftol (~2e-9 relative).
    coarse : (grid_length, G), only when ``return_coarse`` - the BASE
        objective (nll + Cox-Reid, no prior) at the static coarse grid
        points la_k = log(min_disp) + k*step. A later call on the SAME
        counts/mu/design (e.g. the MAP fit, whose objective only adds a
        per-lane quadratic prior) can pass it as ``coarse_cache`` to skip
        its coarse scan entirely.
    """
    import math

    # Materialize the operands once: without the barrier XLA is free to
    # rematerialize a computed `mu` (e.g. the OLS mu-init chain) into every
    # consumer inside the scan/Newton bodies of this solver — measured as a
    # ~3x inflation of the in-program dispersion stage vs the same solver on
    # parameter inputs. An optimization_barrier is the identity.
    counts, mu = jax.lax.optimization_barrier((counts, mu))
    dtype = mu.dtype
    lo_f = math.log(min_disp)
    hi_f = math.log(max_disp)
    lo = jnp.asarray(lo_f, dtype)
    hi = jnp.asarray(hi_f, dtype)
    G = counts.shape[0]
    la_hat = jnp.log(jnp.clip(alpha_hat, min_disp, max_disp)).astype(dtype)
    pdv_f = 1.0 if prior_disp_var is None else prior_disp_var
    pdv = jnp.asarray(pdv_f, dtype)

    def obj(la, branch="auto"):
        return _alpha_objective(
            la, counts, design_matrix, mu, la_hat, pdv, cr_reg, prior_reg,
            branch=branch,
        )

    hw0_f = (hi_f - lo_f) / 2.0
    step1_f = 2.0 * hw0_f / (grid_length - 1)
    # Fine scan: same halfwidth (one coarse step), few points - the basin is
    # already located and the Newton polish below converges quadratically
    # from anywhere inside the coarse cell (its step clip equals the coarse
    # spacing), so the fine pass only needs to hand Newton a descent-feasible
    # start; 8 points matches the 32-point scan to <1e-7 relative on the
    # golden fixtures while cutting the second-biggest block of objective
    # evaluations in the dispersion stage. ``fine_length=0`` skips the fine
    # scan entirely and starts Newton at the coarse argmin (error <=
    # step1/2): per-lane fine evals run the dual-branch objective + its
    # transcendentals and are ~5x a static coarse step on TPU (measured),
    # while the safeguarded Newton recovers the same optimum from the
    # coarse cell — validated against the 8-point path on the goldens.
    # step2 is the zero-curvature move / plateau-decrement scale: with the
    # fine scan on it is the fine-grid spacing; with fine_length=0 keep the
    # same effective resolution (step1/3.5, the 8-point fine spacing) so
    # the plateau-lane convergence diagnostic |g|*step2 is not 4x more
    # pessimistic than the fine-scan path's (the alpha itself is identical;
    # only the reported flag was affected).
    step2_f = step1_f / 3.5 if fine_length == 0 else 2.0 * step1_f / (fine_length - 1)

    coarse_vals = None

    def scan_grid(center, halfwidth, length):
        """Evaluate obj on per-lane grids center +/- halfwidth, argmin."""
        step = 2.0 * halfwidth / (length - 1)

        def body(carry, k):
            best_f, best_la = carry
            la = jnp.clip(center - halfwidth + k * step, lo, hi)
            f = obj(la)
            better = f < best_f
            return (
                (
                    jnp.where(better, f, best_f),
                    jnp.where(better, la, best_la),
                ),
                None,
            )

        init = (
            jnp.full((G,), jnp.inf, dtype=dtype),
            jnp.broadcast_to(center, (G,)) * 1.0,
        )
        (best_f, best_la), _ = jax.lax.scan(
            body, init, jnp.arange(length, dtype=dtype)
        )
        return best_f, best_la

    def scan_coarse():
        """Coarse scan over the static grid la_k = lo + k*step1.

        Every lane shares the same log-alpha at each step, so the
        nb_nll_centered branch (stable for r = e^{-la} >= 8, i.e.
        la <= -log 8; plain otherwise) is known STATICALLY per step -
        each step evaluates a single branch instead of both, halving
        the transcendental work of the scan. Steps are CHUNKED ``kpts``
        grid points per loop iteration so XLA streams the (G, N)
        counts/mu tiles from HBM once per chunk instead of once per
        point — a small win (~2% at 6000x10000 f32: the scan is
        VPU-compute-bound on the log1p evaluations, not bandwidth-bound)
        that also cuts the sequential loop-step latency at small shapes.
        The chunk straddling the branch threshold runs the dual-branch
        objective. Per-step values are also emitted so callers can cache
        them (see ``return_coarse``).
        """
        la_threshold = -math.log(_R_SWITCH)
        k_split = int(math.floor((la_threshold - lo_f) / step1_f)) + 1
        k_split = max(0, min(grid_length, k_split))
        kpts = 4 if grid_length % 4 == 0 else 1
        # chunk regions: [0, bnd_start) stable, [bnd_start, bnd_end) mixed
        # (auto branch), [bnd_end, grid_length) plain
        bnd_start = (k_split // kpts) * kpts
        bnd_end = -(-k_split // kpts) * kpts

        def make_body(branch):
            def body(carry, c):
                best_f, best_la = carry
                fs = []
                for j in range(kpts):
                    la = jnp.full(
                        (G,),
                        lo + (c + j) * jnp.asarray(step1_f, dtype),
                        dtype,
                    )
                    f = obj(la, branch=branch)
                    better = f < best_f
                    best_f = jnp.where(better, f, best_f)
                    best_la = jnp.where(better, la, best_la)
                    fs.append(f)
                return (best_f, best_la), jnp.stack(fs)  # (kpts, G)

            return body

        carry = (
            jnp.full((G,), jnp.inf, dtype=dtype),
            jnp.full((G,), (lo_f + hi_f) / 2.0, dtype=dtype),
        )
        ys = []
        for branch, start, stop in (
            ("stable", 0, bnd_start),
            ("auto", bnd_start, bnd_end),
            ("plain", bnd_end, grid_length),
        ):
            if start < stop:
                carry, y = jax.lax.scan(
                    make_body(branch),
                    carry,
                    jnp.arange(start, stop, kpts, dtype=dtype),
                )
                ys.append(y.reshape(-1, G))
        return carry, jnp.concatenate(ys, axis=0)  # (K, G)

    if coarse_cache is not None:
        # The base objective at the static grid points was already
        # computed by an earlier call on the same counts/mu; the only
        # objective difference is the additive per-lane prior, so the
        # coarse argmin is a pure elementwise pass over (K, G).
        la_grid = lo + jnp.arange(grid_length, dtype=dtype) * jnp.asarray(
            step1_f, dtype
        )
        f_all = coarse_cache
        if prior_reg:
            f_all = f_all + (la_grid[:, None] - la_hat[None, :]) ** 2 / (
                2.0 * pdv
            )
        la1 = la_grid[jnp.argmin(f_all, axis=0)]
    else:
        (f1, la1), coarse_emitted = scan_coarse()
        if return_coarse:
            if prior_reg:
                # Strip the prior so the cache holds the shared BASE.
                la_grid = lo + jnp.arange(
                    grid_length, dtype=dtype
                ) * jnp.asarray(step1_f, dtype)
                coarse_vals = coarse_emitted - (
                    la_grid[:, None] - la_hat[None, :]
                ) ** 2 / (2.0 * pdv)
            else:
                coarse_vals = coarse_emitted
    if fine_length == 0:
        la2 = la1
    else:
        _, la2 = scan_grid(la1, step1_f, fine_length)
    step2 = jnp.asarray(step2_f, dtype)  # fine-grid spacing bounds the polish step

    # 3) Newton polish with step clipping + objective safeguard
    # Clip Newton steps to the COARSE spacing: wide enough to recover when
    # the (approximate, f32) grid scan lands a few fine cells off, narrow
    # enough not to jump basins (acceptance still requires descent).
    clipw = jnp.asarray(step1_f, dtype)

    def fgh_autodiff(la):
        # (f, g, h) by one jvp-over-vjp call: faster than the closed form
        # in the SMALL-N (latency-bound) regime, where the closed form's
        # extra per-element intermediates cost more than the autodiff
        # chain (measured at 60000x100 f32: 34/29 ms genewise/MAP vs
        # 41/36 closed-form).
        def obj_and_grad(la_):
            f_, vjp_fn = jax.vjp(obj, la_)
            (g_,) = vjp_fn(jnp.ones_like(f_))
            return f_, g_

        (f, g), (_, h) = jax.jvp(obj_and_grad, (la,), (jnp.ones_like(la),))
        return f, g, h

    def fgh_closed(la):
        # Objective, gradient AND diagonal curvature of one point in ONE
        # closed-form pass (ops/nb.py::nb_nll_centered_fgh — the same
        # dual-branch forms and dtype-gated lgamma/digamma chains autodiff
        # would generate, with the transcendentals shared across f/g/h).
        # The jvp-over-vjp evaluation generates a chain costing ~8x a
        # plain objective pass on TPU when N is large (11.6 ms vs 1.5 ms
        # per (6000, 10000) f32 call); this is ~2.5x. Validated against
        # jax.jvp/vjp of the objective in tests/test_ops.py.
        f, g, h = nb_nll_centered_fgh(counts, mu, la)
        if cr_reg:
            # d logdet M = tr(M^-1 M'); d2 = tr(M^-1 M'') - tr((M^-1 M')^2)
            # with W = mu/(1 + mu a), dW/dla = -a W^2,
            # d2W/dla2 = dW * (1 - 2 a W).
            a = jnp.exp(la)[:, None]
            W = mu / (1.0 + mu * a)
            Wd1 = -a * W * W
            Wd2 = Wd1 * (1.0 - 2.0 * a * W)
            M = jnp.einsum(
                "gn,np,nq->gpq", W, design_matrix, design_matrix, optimize=True
            )
            M1 = jnp.einsum(
                "gn,np,nq->gpq", Wd1, design_matrix, design_matrix, optimize=True
            )
            M2 = jnp.einsum(
                "gn,np,nq->gpq", Wd2, design_matrix, design_matrix, optimize=True
            )
            Minv = sym_inv(M)
            A = jnp.einsum("gpq,gqr->gpr", Minv, M1)
            f = f + 0.5 * sym_logdet(M)
            g = g + 0.5 * jnp.einsum("gpp->g", A)
            h = h + 0.5 * (
                jnp.einsum("gpq,gqp->g", Minv, M2)
                - jnp.einsum("gpq,gqp->g", A, A)
            )
        if prior_reg:
            d = la - la_hat
            f = f + d * d / (2.0 * pdv)
            g = g + d / pdv
            h = h + 1.0 / pdv
        return f, g, h

    # Static shape dispatch: the closed form wins when the (G, N)
    # transcendental work dominates (large N); the autodiff chain wins in
    # the small-N regime (A/B on one chip: crossover ~N=512; both forms
    # compute the same values, pinned by test_closed_form_fgh_matches_autodiff).
    fgh = fgh_closed if counts.shape[1] >= 512 else fgh_autodiff

    def newton_body(i, state):
        la, f_best, g, h = state
        raw = jnp.where(h > 0, g / h, jnp.sign(g) * step2)
        step = jnp.clip(raw, -clipw, clipw)
        cand = jnp.clip(la - step, lo, hi)
        f_cand, g_cand, h_cand = fgh(cand)
        # Near the optimum the objective difference is below the f32 noise
        # floor while the GRADIENT still carries signal: a strict descent
        # gate there freezes lanes at fine-grid resolution (~step2 error in
        # log-alpha, i.e. ~10% dispersion error) — and so does ANY
        # objective-noise band, because the eval noise scales with the
        # magnitudes of the summed per-sample terms, not with |f|
        # (measured: a 1e3*eps*(|f|+1) band rejected genuine contractions
        # on the TPU's f32 transcendentals and shifted a continuous-fixture
        # MAP dispersion 2%, i.e. 26% in p-value). So gate the small
        # positive-curvature Newton step on GRADIENT contraction instead:
        # accept iff |g(cand)| <= |g(la)|. Inside the basin a Newton step
        # shrinks the gradient; a lane genuinely drifting uphill (positive
        # local curvature outside the optimum's basin — the failure mode
        # the gate exists for) has a growing gradient and is rejected.
        # Same acceptance pattern as the IRLS polish (ops/irls.py). Keep
        # the strict descent safeguard for large/clipped steps (in f64 the
        # descent gate accepts these anyway, so goldens agree).
        contraction = (
            (h > 0) & (jnp.abs(raw) <= clipw) & (jnp.abs(g_cand) <= jnp.abs(g))
        )
        better = contraction | (f_cand < f_best)
        return (
            jnp.where(better, cand, la),
            jnp.where(better, f_cand, f_best),
            jnp.where(better, g_cand, g),
            jnp.where(better, h_cand, h),
        )

    f2, g2, h2 = fgh(la2)
    la_fit, f_fit, g_fin, h_fin = jax.lax.fori_loop(
        0, newton_iters, newton_body, (la2, f2, g2, h2)
    )

    alpha = jnp.exp(la_fit)
    # Converged = the polished point is a (projected) stationary point: the
    # predicted objective decrease from one more step — the Newton decrement
    # g^2/2h where curvature is positive, else a fine-grid-step move |g|*step2
    # — is below a dtype-scaled relative tolerance. Gradient components that
    # push outward at an active bound are projected to zero first, so lanes
    # pinned at min/max_disp report converged like the reference's bounded
    # L-BFGS-B does (parity: per-gene ``res.success``, reference
    # pydeseq2/utils.py:554-564). The carried (g_fin, h_fin) are exactly the
    # fgh values of the accepted final point — no recomputation needed.
    at_lo = la_fit <= lo
    at_hi = la_fit >= hi
    pg = jnp.where(at_lo & (g_fin > 0), 0.0, g_fin)
    pg = jnp.where(at_hi & (pg < 0), 0.0, pg)
    decrement = jnp.where(
        h_fin > 0, pg * pg / (2.0 * jnp.abs(h_fin)), jnp.abs(pg) * step2
    )
    # Relative tolerance: dtype-scaled, but floored at 1e-9 so the f64
    # diagnostic is not far stricter than scipy L-BFGS-B's default relative
    # ftol (~2e-9) that the reference's res.success reflects (1e3*eps would
    # be ~2e-13 in f64; f32's 1.2e-4 is unaffected by the floor).
    ftol = max(1e3 * float(jnp.finfo(dtype).eps), 1e-9)
    converged = jnp.isfinite(f_fit) & (decrement <= ftol * (jnp.abs(f_fit) + 1.0))
    if return_coarse:
        return alpha, converged, coarse_vals
    return alpha, converged
