"""Batched NB-GLM coefficient fitting: IRLS with masked lanes + fallbacks.

Parity target (reference, owkin/PyDESeq2): pydeseq2/utils.py:273-438
(``irls_solver``) and pydeseq2/grid_search.py:145-221 (``grid_fit_beta``),
which the reference runs once per gene inside a joblib process pool
(pydeseq2/default_inference.py:83-124).

TPU design: one fixed-structure ``lax.while_loop`` advances ALL genes at once.
Each iteration is two MXU einsums ((G,N)x(N,P) weighted Gram matrices) and a
batched (P,P) solve; per-gene convergence is a lane mask, so converged lanes
freeze while stragglers keep iterating. Lanes that diverge (|beta| > 30) or
exhaust ``maxiter`` are reported to the host, which re-solves just those lanes
with a projected-Newton box solver (the batched analog of the reference's
L-BFGS-B fallback) and, for P <= 2, a vectorized 2-D grid search.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pydeseq2_tpu.ops.nb import nb_nll
from pydeseq2_tpu.ops.smalllinalg import sym_inv, sym_solve


def _weighted_gram(X: jnp.ndarray, W: jnp.ndarray) -> jnp.ndarray:
    """(G,P,P) Gram matrices X^T diag(W_g) X for every gene g."""
    return jnp.einsum("gn,np,nq->gpq", W, X, X, optimize=True)


@partial(
    jax.jit,
    static_argnames=(
        "min_mu",
        "beta_tol",
        "max_beta",
        "maxiter",
        "step_tol",
        "polish_iters",
        "return_iters",
    ),
)
def irls_core(
    counts: jnp.ndarray,
    size_factors: jnp.ndarray,
    design_matrix: jnp.ndarray,
    disp: jnp.ndarray,
    beta_init: jnp.ndarray,
    min_mu: float = 0.5,
    beta_tol: float = 1e-8,
    max_beta: float = 30.0,
    maxiter: int = 250,
    step_tol: float | None = None,
    polish_iters: int = 2,
    return_iters: bool = False,
):
    """Masked-lane batched IRLS.

    Parameters
    ----------
    counts : (G, N) gene-major counts.
    size_factors : (N,).
    design_matrix : (N, P).
    disp : (G,) fixed dispersions.
    beta_init : (G, P) initial coefficients.

    Returns
    -------
    beta : (G, P) fitted coefficients (IRLS value; fallback lanes hold the
        last non-diverged iterate and are flagged).
    needs_fallback : (G,) bool - lane diverged or hit maxiter.
    converged : (G,) bool - deviance ratio dropped below ``beta_tol``.
    n_iter : int32 scalar, only with ``return_iters=True`` — while-loop trip
        count (= the slowest lane's iteration count: every trip processes
        all G lanes, so total work is body_cost x n_iter). Measured for the
        trip-count-aware roofline (benchmarks/roofline.py).

    Parity: the update W = mu/(1+mu*alpha), z = log(mu/sf) + (y-mu)/mu,
    beta = (X^T W X + 1e-6 I)^{-1} X^T W z and the deviance stopping rule
    |dev-dev_old|/(|dev|+0.1) < beta_tol mirror reference
    pydeseq2/utils.py:359-421.

    ``step_tol`` adds a secondary stop on max|Delta beta|: in f32 the
    deviance difference carries O(eps*|dev|) roundoff, so lanes whose
    iterates have stopped moving can oscillate around the ratio threshold
    forever (250 full-width iterations + a pointless fallback flag) even
    though the same lane converges in one step in f64. Such lanes ARE
    converged. None = dtype default: 1e-5 absolute for f32 (iterate noise
    there is ~1e-6; dispersion/Wald results are insensitive at <1e-5),
    disabled for f64 (reference-exact stopping semantics). The stop fires
    only after TWO consecutive sub-tolerance steps, so a lane making slow
    monotone progress along a flat direction (single steps just under the
    tolerance but still descending) is not mistaken for f32 iterate noise
    and keeps iterating toward the maxiter/Newton-rescue path.
    """
    X = design_matrix
    G, N = counts.shape
    P = X.shape[1]
    dtype = beta_init.dtype
    if step_tol is None:
        step_tol = 1e-5 if dtype == jnp.float32 else 0.0
    ridge = (1e-6 * jnp.eye(P, dtype=dtype))[None]

    # The deviance -2*nb_nll splits into a (y, alpha)-only part (all the
    # lgamma terms - the expensive transcendentals) and a mu-dependent part
    # that is identical for both branches of nb_nll:
    #     nll(mu) = const + sum_i [(y_i + r) log1p(mu_i/r) - y_i log mu_i]
    # (plain branch: (y+r)log(mu+r) = (y+r)log r + (y+r)log1p(mu/r), the
    # first term is mu-free; stable branch uses log1p(mu/r) directly).
    # Hoisting const out of the loop removes every lgamma from the IRLS
    # iteration; the stopping rule compares deviance *differences*, in which
    # const cancels exactly, so this is not an approximation.
    r = 1.0 / disp[:, None]
    y_plus_r = counts + r
    log_sf = jnp.log(size_factors)[None, :]  # (1, N), loop-invariant
    log_min_mu = jnp.log(jnp.asarray(min_mu, dtype))

    def make_mu_xb(beta):
        """mu = max(sf e^{Xb}, min_mu) plus log(mu) and log(mu/sf), the
        latter two derived from the linear predictor instead of device logs
        (only the min_mu-clamped entries need the precomputed constants)."""
        xb = beta @ X.T
        raw = size_factors[None, :] * jnp.exp(xb)
        clamped = raw < min_mu
        mu = jnp.where(clamped, min_mu, raw)
        log_mu = jnp.where(clamped, log_min_mu, xb + log_sf)
        log_mu_sf = jnp.where(clamped, log_min_mu - log_sf, xb)
        return mu, log_mu, log_mu_sf

    def mu_part(mu, log_mu):
        ylogmu = jnp.where(counts > 0, counts * log_mu, 0.0)
        return (y_plus_r * jnp.log1p(mu / r) - ylogmu).sum(-1)

    mu0, log_mu0, log_mu_sf0 = make_mu_xb(beta_init)
    nll_const = nb_nll(counts, mu0, disp) - mu_part(mu0, log_mu0)

    def body(state):
        beta, mu, log_mu_sf, dev, active, needs_fb, prev_small, it = state
        W = mu / (1.0 + mu * disp[:, None])
        z = log_mu_sf + (counts - mu) / mu
        M = _weighted_gram(X, W) + ridge
        rhs = jnp.einsum("gn,np->gp", W * z, X, optimize=True)
        beta_hat = sym_solve(M, rhs)

        it = it + 1
        diverged = (jnp.abs(beta_hat) > max_beta).any(axis=1)
        hit_max = jnp.full((G,), it >= maxiter)
        new_fb = active & (diverged | hit_max)
        step_ok = active & ~new_fb

        new_beta = jnp.where(step_ok[:, None], beta_hat, beta)
        new_mu, new_log_mu, new_log_mu_sf = make_mu_xb(new_beta)
        new_dev = -2.0 * (nll_const + mu_part(new_mu, new_log_mu))
        dev_ratio = jnp.abs(new_dev - dev) / (jnp.abs(new_dev) + 0.1)
        still_active = step_ok & (dev_ratio > beta_tol)
        step_small = jnp.zeros((G,), dtype=bool)
        if step_tol > 0.0:
            step_small = jnp.abs(beta_hat - beta).max(axis=1) <= step_tol
            still_active = still_active & ~(step_small & prev_small)

        dev = jnp.where(step_ok, new_dev, dev)
        return (
            new_beta,
            new_mu,
            new_log_mu_sf,
            dev,
            still_active,
            needs_fb | new_fb,
            step_small,
            it,
        )

    def cond(state):
        _, _, _, _, active, _, _, it = state
        return active.any() & (it < maxiter)

    dev0 = jnp.full((G,), 1000.0, dtype=dtype)
    active0 = jnp.ones((G,), dtype=bool)
    fb0 = jnp.zeros((G,), dtype=bool)
    beta, _, _, dev, active, needs_fb, _, it = jax.lax.while_loop(
        cond,
        body,
        (
            beta_init,
            mu0,
            log_mu_sf0,
            dev0,
            active0,
            fb0,
            jnp.zeros((G,), dtype=bool),
            jnp.array(0, dtype=jnp.int32),
        ),
    )
    # Lanes still active after the loop ran out hit maxiter.
    needs_fb = needs_fb | active
    converged = ~needs_fb

    if step_tol > 0.0 and polish_iters > 0:
        # f32 refinement: the IRLS stop leaves iterates ~step_tol away from
        # the ridged-NLL optimum (the IRLS fixed point solves nll +
        # 0.5e-6||b||^2 exactly); exact-Newton steps contract that toward the
        # f32 gradient noise floor. Near the fixed point objective
        # comparisons sit below the f32 noise floor, so acceptance is gated
        # on (a) LOCALITY — a step is kept only if small (<= 100x step_tol;
        # a genuinely converged lane proposes ~step_tol), finite, and inside
        # the divergence box — and (b) a final per-lane GRADIENT-NORM check:
        # the polished point replaces the IRLS iterate only where it
        # strictly reduces the ridged-NLL gradient sup-norm, so the polish
        # can only move lanes toward the optimum (measured on the fixtures:
        # max |log2FC| error vs the f64/R solution drops ~100x; lanes at the
        # noise floor keep their IRLS iterate).
        inv_disp = 1.0 / disp
        ridge_diag = jnp.asarray(1e-6, dtype)
        polish_cap = 100.0 * step_tol

        def ridged_grad(b):
            mu = jnp.maximum(size_factors[None, :] * jnp.exp(b @ X.T), min_mu)
            t = (inv_disp[:, None] + counts) * mu / (inv_disp[:, None] + mu)
            return (t - counts) @ X + ridge_diag * b, mu

        def polish_body(i, b):
            g, mu = ridged_grad(b)
            w = mu * (1.0 + disp[:, None] * counts) / (1.0 + disp[:, None] * mu) ** 2
            H = _weighted_gram(X, w) + ridge
            cand = b - sym_solve(H, g)
            ok = (
                jnp.isfinite(cand).all(axis=1)
                & (jnp.abs(cand) <= max_beta).all(axis=1)
                & (jnp.abs(cand - b).max(axis=1) <= polish_cap)
            )
            return jnp.where(ok[:, None], cand, b)

        polished = jax.lax.fori_loop(0, polish_iters, polish_body, beta)
        g_new = jnp.abs(ridged_grad(polished)[0]).max(axis=1)
        g_old = jnp.abs(ridged_grad(beta)[0]).max(axis=1)
        beta = jnp.where((g_new < g_old)[:, None], polished, beta)

    if return_iters:
        return beta, needs_fb, converged, it
    return beta, needs_fb, converged


def irls_beta_init(
    counts: jnp.ndarray,
    size_factors: jnp.ndarray,
    design_matrix: jnp.ndarray,
    full_rank: bool = True,
) -> jnp.ndarray:
    """Initial coefficients: QR least-squares on log(y/sf + 0.1).

    Falls back to a log-mean intercept when the design is rank-deficient.
    Parity: reference pydeseq2/utils.py:348-357. ``full_rank`` is a
    host-static property of the design (checked once by the caller, not
    inside the traced program).
    """
    X = design_matrix
    P = X.shape[1]
    y = jnp.log(counts / size_factors[None, :] + 0.1)  # (G, N)
    if full_rank:
        Q, R = jnp.linalg.qr(X)
        rhs = y @ Q  # (G, P)
        beta = jax.scipy.linalg.solve_triangular(R, rhs.T, lower=False).T
        return beta
    beta = jnp.zeros((counts.shape[0], P), dtype=y.dtype)
    intercept = jnp.log(counts / size_factors[None, :]).mean(axis=1)
    return beta.at[:, 0].set(intercept)


@partial(jax.jit, static_argnames=("min_mu", "max_beta", "maxiter"))
def newton_box_nbglm(
    counts: jnp.ndarray,
    size_factors: jnp.ndarray,
    design_matrix: jnp.ndarray,
    disp: jnp.ndarray,
    beta_init: jnp.ndarray,
    min_mu: float = 0.5,
    max_beta: float = 30.0,
    maxiter: int = 60,
):
    """Projected-Newton minimization of the ridge-regularized NB NLL in a box.

    The batched analog of the reference's scipy L-BFGS-B fallback
    (pydeseq2/utils.py:374-403): objective nb_nll(y, max(sf*e^{Xb}, min_mu), a)
    + 0.5*1e-6*||b||^2, bounds [-30, 30]^P. Newton direction from the exact
    NB Hessian, backtracking line search, projection onto the box.

    The line search only ever COMPARES objective values at fixed (counts,
    disp), so the mu-independent lgamma bulk of the NLL cancels exactly and
    is dropped from the loop (the same hoisting as ``irls_core``) — the
    backtracking objective is sum (y+r) log1p(mu/r) - y log mu + ridge.

    Returns (beta, success) with success = projected-gradient sup-norm < 1e-5.
    """
    X = design_matrix
    G, N = counts.shape
    P = X.shape[1]
    dtype = beta_init.dtype
    ridge_diag = jnp.asarray(1e-6, dtype)

    inv_disp = 1.0 / disp  # (G,)
    r = inv_disp[:, None]
    y_plus_r = counts + r
    log_sf = jnp.log(size_factors)[None, :]
    log_min_mu = jnp.log(jnp.asarray(min_mu, dtype))

    def objective(beta):
        xb = beta @ X.T
        raw = size_factors[None, :] * jnp.exp(xb)
        clamped = raw < min_mu
        mu = jnp.where(clamped, min_mu, raw)
        log_mu = jnp.where(clamped, log_min_mu, xb + log_sf)
        ylogmu = jnp.where(counts > 0, counts * log_mu, 0.0)
        return (y_plus_r * jnp.log1p(mu / r) - ylogmu).sum(-1) + (
            0.5 * ridge_diag * (beta**2).sum(-1)
        )

    def grad_fn(beta):
        # Parity: reference pydeseq2/utils.py:381-387.
        mu = jnp.maximum(size_factors[None, :] * jnp.exp(beta @ X.T), min_mu)
        t = (inv_disp[:, None] + counts) * mu / (inv_disp[:, None] + mu)
        return (t - counts) @ X + ridge_diag * beta

    def hess_fn(beta):
        mu = jnp.maximum(size_factors[None, :] * jnp.exp(beta @ X.T), min_mu)
        # d2 nll / dbeta2 = X^T diag(mu (1 + alpha y) / (1 + alpha mu)^2) X
        w = mu * (1.0 + disp[:, None] * counts) / (1.0 + disp[:, None] * mu) ** 2
        H = _weighted_gram(X, w)
        return H + ridge_diag * jnp.eye(P, dtype=dtype)[None]

    def body(i, state):
        beta, f_val = state
        g = grad_fn(beta)
        H = hess_fn(beta)
        # Damped solve for robustness.
        Hd = H + 1e-8 * jnp.eye(P, dtype=dtype)[None]
        step = sym_solve(Hd, g)

        def try_step(t):
            cand = jnp.clip(beta - t[:, None] * step, -max_beta, max_beta)
            return cand, objective(cand)

        # Backtracking: t in {1, 1/2, ..., 2^-12}; pick first improving step.
        t = jnp.ones((G,), dtype=dtype)
        best_beta, best_f = beta, f_val

        def bt_body(j, carry):
            t, best_beta, best_f, done = carry
            cand, f_cand = try_step(t)
            improve = (f_cand < best_f) & ~done
            best_beta = jnp.where(improve[:, None], cand, best_beta)
            best_f = jnp.where(improve, f_cand, best_f)
            done = done | improve
            return t * 0.5, best_beta, best_f, done

        _, best_beta, best_f, _ = jax.lax.fori_loop(
            0, 13, bt_body, (t, best_beta, best_f, jnp.zeros((G,), dtype=bool))
        )
        return best_beta, best_f

    f0 = objective(beta_init)
    beta, f_val = jax.lax.fori_loop(0, maxiter, body, (beta_init, f0))

    # Projected gradient: zero where pressing against an active bound.
    g = grad_fn(beta)
    at_lo = (beta <= -max_beta + 1e-12) & (g > 0)
    at_hi = (beta >= max_beta - 1e-12) & (g < 0)
    pg = jnp.where(at_lo | at_hi, 0.0, g)
    success = jnp.abs(pg).max(axis=1) < 1e-5
    return beta, success


@partial(jax.jit, static_argnames=("min_mu", "grid_length", "min_beta", "max_beta"))
def grid_fit_beta_batch(
    counts: jnp.ndarray,
    size_factors: jnp.ndarray,
    design_matrix: jnp.ndarray,
    disp: jnp.ndarray,
    min_mu: float = 0.5,
    grid_length: int = 60,
    min_beta: float = -30.0,
    max_beta: float = 30.0,
):
    """Vectorized coarse->fine 2-D grid search for P == 2 designs.

    Parity: reference pydeseq2/grid_search.py:145-221. Scans x rows of the
    grid with ``lax.map`` so peak memory stays at (grid, G, N).
    """
    X = design_matrix  # (N, 2)
    dtype = counts.dtype

    def loss_row(x_val, y_grid):
        # beta candidates (K, 2) for a fixed x; evaluate all genes.
        betas = jnp.stack([jnp.broadcast_to(x_val, y_grid.shape), y_grid], axis=1)
        xb = betas @ X.T  # (K, N)
        mu = jnp.maximum(size_factors[None, None, :] * jnp.exp(xb)[None], min_mu)
        # nll over (G, K): counts (G,1,N), mu (1,K,N) -> (G,K)
        nll = nb_nll(counts[:, None, :], mu, disp[:, None])
        reg = 0.5 * (1e-6 * betas**2).sum(1)[None, :]
        return nll + reg  # (G, K)

    def search(x_grid, y_grid):
        # (Gx, G, Ky) objective, scanning over x to bound memory.
        ll = jax.lax.map(lambda xv: loss_row(xv, y_grid), x_grid)  # (Kx, G, Ky)
        ll = jnp.moveaxis(ll, 1, 0)  # (G, Kx, Ky)
        flat_idx = jnp.argmin(ll.reshape(ll.shape[0], -1), axis=1)
        ix, iy = flat_idx // y_grid.shape[0], flat_idx % y_grid.shape[0]
        return x_grid[ix], y_grid[iy]

    base = jnp.linspace(min_beta, max_beta, grid_length, dtype=dtype)
    bx, by = search(base, base)
    delta = base[1] - base[0]

    # Fine pass: per-gene grids; scan over the x offsets.
    offs = jnp.linspace(-delta, delta, grid_length, dtype=dtype)

    def fine_loss(i, carry):
        best_f, best_x, best_y = carry
        x_val = bx + offs[i]  # (G,)
        y_vals = by[:, None] + offs[None, :]  # (G, K)
        betas_x = x_val[:, None]  # (G, 1)
        xb = betas_x[..., None] * X[None, None, :, 0] + y_vals[..., None] * X[None, None, :, 1]
        mu = jnp.maximum(size_factors[None, None, :] * jnp.exp(xb), min_mu)
        nll = nb_nll(counts[:, None, :], mu, disp[:, None])
        reg = 0.5e-6 * (betas_x**2 + y_vals**2)
        f = nll + reg  # (G, K)
        j = jnp.argmin(f, axis=1)
        f_best = jnp.take_along_axis(f, j[:, None], axis=1)[:, 0]
        better = f_best < best_f
        return (
            jnp.where(better, f_best, best_f),
            jnp.where(better, x_val, best_x),
            jnp.where(better, jnp.take_along_axis(y_vals, j[:, None], axis=1)[:, 0], best_y),
        )

    G = counts.shape[0]
    init = (jnp.full((G,), jnp.inf, dtype=dtype), bx, by)
    best_f, fx, fy = jax.lax.fori_loop(0, grid_length, fine_loss, init)
    return jnp.stack([fx, fy], axis=1)


@partial(jax.jit, static_argnames=("min_mu",))
def hat_diagonals(
    counts: jnp.ndarray,
    size_factors: jnp.ndarray,
    design_matrix: jnp.ndarray,
    disp: jnp.ndarray,
    beta: jnp.ndarray,
    min_mu: float = 0.5,
):
    """Hat-matrix diagonals H = W^{1/2} X (X^T W X + eps I)^{-1} X^T W^{1/2}.

    Also returns the UNthresholded mu. Parity: reference
    pydeseq2/utils.py:423-437 (einsum diagonal-only form).
    """
    X = design_matrix
    P = X.shape[1]
    mu_thr = jnp.maximum(size_factors[None, :] * jnp.exp(beta @ X.T), min_mu)
    W = mu_thr / (1.0 + mu_thr * disp[:, None])
    M = _weighted_gram(X, W) + 1e-6 * jnp.eye(P, dtype=beta.dtype)[None]
    Minv = sym_inv(M)
    xmx = jnp.einsum("np,gpq,nq->gn", X, Minv, X, optimize=True)
    H = W * xmx
    mu = size_factors[None, :] * jnp.exp(beta @ X.T)
    return H, mu
