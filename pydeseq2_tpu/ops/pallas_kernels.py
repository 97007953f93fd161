"""Pallas TPU kernels for the dispersion-objective grid scan.

The dispersion stage evaluates the NB objective (nb_nll + Cox-Reid logdet +
optional prior) at K grid points per gene (reference scipy path:
pydeseq2/utils.py:441-564; our XLA path: ops/dispersion.py). In XLA the scan
re-reads the (G, N) counts/mu tiles from HBM at every step, so the stage is
HBM-bandwidth-bound: ~K x the traffic actually needed. This kernel keeps a
(BG, N) gene-block tile resident in VMEM and runs the whole K-point scan over
it - one HBM read per tile instead of K - with all K-invariant terms
(lgamma(y+1), y log mu) hoisted out of the loop.

The Cox-Reid term needs M = X^T diag(W) X per gene per grid point. The design
matrix enters only through the C = P(P+1)/2 pairwise column products, passed
as a (C, N) array with padding samples zeroed, so each M entry is a single
VPU multiply-reduce and the log-determinant is the closed form from
ops/smalllinalg.py (P <= 3).

Only f32 (TPU-native dtype) and P <= 3 are supported; callers fall back to
the XLA scan otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_HALF_LOG_2PI = 0.9189385332046727


def _lgamma(x: jnp.ndarray) -> jnp.ndarray:
    """log Gamma(x) for x > 0, implemented from scratch for Mosaic.

    ``lax.lgamma`` has no Pallas TPU lowering, so: shift the argument above 8
    with the recurrence lgamma(x) = lgamma(x+1) - log(x) (8 statically
    unrolled masked steps - inputs here are >= 1/max_disp > 0), then apply
    the Stirling series with three correction terms. Max error ~1e-8
    relative for x >= 8, well inside f32 precision.
    """
    z = x
    shift = jnp.zeros_like(x)
    for _ in range(8):
        small = z < 8.0
        shift = shift + jnp.where(small, jnp.log(z), 0.0)
        z = jnp.where(small, z + 1.0, z)
    zinv = 1.0 / z
    zinv2 = zinv * zinv
    series = zinv * (1.0 / 12.0 + zinv2 * (-1.0 / 360.0 + zinv2 * (1.0 / 1260.0)))
    return (z - 0.5) * jnp.log(z) - z + _HALF_LOG_2PI + series - shift


def _logdet_from_entries(m_entries: list, P: int, dtype) -> jnp.ndarray:
    """Closed-form log|det| from the unique entries of symmetric M.

    ``m_entries`` is ordered [(0,0), (0,1), ..., upper triangle row-major].
    Shapes (BG, 1).
    """
    tiny = jnp.finfo(dtype).tiny
    if P == 1:
        (a,) = m_entries
        return jnp.log(jnp.maximum(a, tiny))
    if P == 2:
        a, c, d = m_entries  # M = [[a, c], [c, d]]
        det = a * d - c * c
        return jnp.log(jnp.maximum(det, tiny))
    if P == 3:
        a, b, c, d, e, f = m_entries  # [[a,b,c],[b,d,e],[c,e,f]]
        det = a * (d * f - e * e) + b * (c * e - b * f) + c * (b * e - c * d)
        return jnp.log(jnp.maximum(det, tiny))
    raise NotImplementedError(P)


def _alpha_scan_kernel(
    pdv_ref,
    counts_ref,
    mu_ref,
    center_ref,
    la_hat_ref,
    xx_ref,
    best_f_ref,
    best_la_ref,
    *,
    K: int,
    halfwidth: float,
    lo: float,
    hi: float,
    n_valid: int,
    P: int,
    cr_reg: bool,
    prior_reg: bool,
):
    dtype = counts_ref.dtype
    y = counts_ref[:]  # (BG, Npad)
    m = mu_ref[:]
    center = center_ref[:]  # (BG, 1)
    la_hat = la_hat_ref[:]

    npad = y.shape[1]
    valid = jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1) < n_valid

    step = jnp.asarray(2.0 * halfwidth / (K - 1), dtype)
    C = P * (P + 1) // 2

    def body(k, carry):
        best_f, best_la = carry
        la = jnp.clip(center - halfwidth + k.astype(dtype) * step, lo, hi)
        a = jnp.exp(la)  # (BG, 1)
        r = jnp.exp(-la)
        # CENTERED objective (nb_nll minus its alpha-independent Poisson
        # constant, see ops/nb.py nb_nll_centered): argmin-invariant, and in
        # f32 the absolute error drops from O(1) to O(1e-2) because the huge
        # Poisson bulk never enters the arithmetic.
        plain = (
            -r * jnp.log(r)
            - _lgamma(y + r)
            + _lgamma(r)
            + (y + r) * jnp.log(m + r)
            - m
        )
        u = y / r
        v = m / r
        l1p_u = jnp.log1p(u)
        l1p_v = jnp.log1p(v)
        yr = y + r
        stable = (
            -r * (l1p_u - u)
            - (y - 0.5) * l1p_u
            + r * (l1p_v - v)
            + y * l1p_v
            + y / (12.0 * r * yr)
            + (1.0 / (yr * yr * yr) - 1.0 / (r * r * r)) / 360.0
        )
        per = jnp.where(r < 8.0, plain, stable)
        nll = jnp.sum(jnp.where(valid, per, 0.0), axis=1, keepdims=True)
        f = nll
        if cr_reg:
            W = m / (1.0 + m * a)
            m_entries = [
                jnp.sum(W * xx_ref[c, :][None, :], axis=1, keepdims=True)
                for c in range(C)
            ]
            f = f + 0.5 * _logdet_from_entries(m_entries, P, dtype)
        if prior_reg:
            f = f + (la - la_hat) ** 2 / (2.0 * pdv_ref[0, 0])
        better = f < best_f
        return jnp.where(better, f, best_f), jnp.where(better, la, best_la)

    init = (
        jnp.full(center.shape, jnp.inf, dtype),
        center,
    )
    best_f, best_la = jax.lax.fori_loop(0, K, body, init)
    best_f_ref[:] = best_f
    best_la_ref[:] = best_la


@functools.partial(
    jax.jit,
    static_argnames=(
        "K",
        "halfwidth",
        "lo",
        "hi",
        "cr_reg",
        "prior_reg",
        "block_g",
    ),
)
def alpha_grid_scan(
    counts: jnp.ndarray,
    mu: jnp.ndarray,
    center: jnp.ndarray,
    la_hat: jnp.ndarray,
    design_matrix: jnp.ndarray,
    K: int,
    halfwidth: float,
    lo: float,
    hi: float,
    cr_reg: bool = True,
    prior_reg: bool = False,
    prior_disp_var=1.0,
    block_g: int = 512,
):
    """VMEM-resident K-point scan of the dispersion objective per gene.

    Parameters
    ----------
    counts, mu : (G, N) f32 gene-major tiles.
    center : (G,) per-lane scan centers (log-alpha).
    la_hat : (G,) prior means (log-alpha), used when ``prior_reg``.
    design_matrix : (N, P) with P <= 3.

    Returns
    -------
    (best_f, best_la) : two (G,) arrays.
    """
    G, N = counts.shape
    P = design_matrix.shape[1]
    dtype = counts.dtype
    npad = _round_up(N, 128)
    gpad = _round_up(G, block_g)

    def pad(arr, fill):
        return jnp.pad(
            arr,
            ((0, gpad - G), (0, npad - N)),
            constant_values=fill,
        )

    counts_p = pad(counts, 0.0)
    mu_p = pad(mu, 1.0)
    center_p = jnp.pad(center[:, None], ((0, gpad - G), (0, 0)))
    la_hat_p = jnp.pad(la_hat[:, None], ((0, gpad - G), (0, 0)))

    # Pairwise design-column products, padding samples zeroed: the Cox-Reid
    # Gram entries become plain weighted reductions.
    C = P * (P + 1) // 2
    cols = []
    for i in range(P):
        for j in range(i, P):
            cols.append(design_matrix[:, i] * design_matrix[:, j])
    xx = jnp.stack(cols, axis=0).astype(dtype)  # (C, N)
    xx = jnp.pad(xx, ((0, 0), (0, npad - N)))

    kernel = functools.partial(
        _alpha_scan_kernel,
        K=K,
        halfwidth=halfwidth,
        lo=lo,
        hi=hi,
        n_valid=N,
        P=P,
        cr_reg=cr_reg,
        prior_reg=prior_reg,
    )
    pdv_arr = jnp.asarray(prior_disp_var, dtype).reshape(1, 1)
    grid = (gpad // block_g,)
    best_f, best_la = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_g, npad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_g, npad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_g, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_g, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_g, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_g, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gpad, 1), dtype),
            jax.ShapeDtypeStruct((gpad, 1), dtype),
        ],
    )(pdv_arr, counts_p, mu_p, center_p, la_hat_p, xx)
    return best_f[:G, 0], best_la[:G, 0]


def pallas_alpha_supported(design_matrix, dtype) -> bool:
    """Whether the Pallas scan path applies (TPU, f32, P <= 3)."""
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return (
        platform == "tpu"
        and dtype == jnp.float32
        and design_matrix.shape[1] <= 3
    )
