"""JAX/TPU inference backend: batched device kernels behind the Inference ABC.

This is the TPU-native replacement for the reference's joblib process pool
(reference pydeseq2/default_inference.py:14-264). Every per-gene fan-out
becomes one jit-compiled gene-batched program; genes are chunked to bound HBM
(chunks padded to a fixed bucket so each stage compiles once) and optionally
sharded over a 1-D device mesh (pure gene-axis data parallelism - the per-gene
solvers need no cross-gene communication, see SURVEY.md section 2.3).

Fallback orchestration mirrors the reference's optimizer cascade
(IRLS -> L-BFGS-B -> grid, reference pydeseq2/utils.py:374-413) but is
host-gated: the main batched solver reports which lanes need rescue, the host
gathers just those lanes into a padded bucket and re-solves them with the
batched Newton / vectorized-grid kernels.
"""

from __future__ import annotations

import math
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from pydeseq2_tpu.inference import Inference
from pydeseq2_tpu.ops import dispersion as disp_ops
from pydeseq2_tpu.ops import irls as irls_ops
from pydeseq2_tpu.ops import linreg as linreg_ops
from pydeseq2_tpu.ops import shrink as shrink_ops
from pydeseq2_tpu.ops import trend as trend_ops
from pydeseq2_tpu.ops import wald as wald_ops


def _bucket(n: int, sizes=(64, 256, 1024, 4096)) -> int:
    """Pad count for rescue batches: next bucket size (bounds recompiles)."""
    for s in sizes:
        if n <= s:
            return s
    return ((n + 4095) // 4096) * 4096


class JaxInference(Inference):
    """Batched JAX inference backend.

    Parameters
    ----------
    dtype : jnp dtype
        Compute dtype for the solvers. float64 (default when x64 is enabled)
        reproduces the reference's numerics; float32 is faster on TPU and
        passes the golden-file tolerance on the repo fixtures.
    gene_batch_size : int, optional
        Maximum genes per device program. ``None`` (default) derives the
        batch from an HBM budget (~4 GB of live (block, N) solver
        temporaries, the same sizing rule as the gene-streamed pipeline) so
        atlas-scale inputs run out of the box instead of building one
        full-G program; the budget covers the whole gene axis for the
        common N <= ~1k cohorts, keeping the one-program fast path. Chunks
        are padded to equal size so each kernel compiles once.
    mesh : jax.sharding.Mesh, optional
        1-D mesh with a ``"genes"`` axis; gene-major arrays are sharded over
        it, the design matrix and size factors are replicated.
    """

    #: HBM budget for live solver temporaries; ~20 (block, N) buffers are
    #: alive in the worst stage (matches fused_stream's auto gene_block).
    _HBM_BUDGET_BYTES = 4_000_000_000
    _LIVE_BUFFERS = 20

    def __init__(
        self,
        dtype=None,
        gene_batch_size: int | None = None,
        mesh: "jax.sharding.Mesh | None" = None,
    ):
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype
        self.gene_batch_size = gene_batch_size
        self.mesh = mesh

    # ------------------------------------------------------------------ utils
    def _device_put_gene_major(self, arr: jnp.ndarray) -> jnp.ndarray:
        """Shard a gene-leading array over the mesh (if any)."""
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P("genes", *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def _replicate(self, arr: jnp.ndarray) -> jnp.ndarray:
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(arr, NamedSharding(self.mesh, P()))

    def _auto_batch(self, G: int, N: int) -> int:
        """Genes per program under the HBM budget (even split, tile-rounded)."""
        itemsize = jnp.dtype(self.dtype).itemsize
        raw = int(
            max(
                1024,
                min(G, self._HBM_BUDGET_BYTES // (self._LIVE_BUFFERS * N * itemsize)),
            )
        )
        # Even split: ceil(G/raw) blocks of near-equal size so padding never
        # exceeds one block's rounding.
        n_blocks = -(-G // raw)
        bs = -(-G // n_blocks)
        return ((bs + 7) // 8) * 8

    def _chunks(self, G: int, N: int | None = None):
        """Yield (start, stop, padded_size) gene ranges."""
        if self.gene_batch_size is not None:
            bs = self.gene_batch_size
        elif N is not None:
            bs = self._auto_batch(G, N)
        else:
            bs = G
        if self.mesh is not None:
            # Keep chunk size divisible by the mesh so shards stay equal.
            n_dev = math.prod(self.mesh.devices.shape)
            bs = max(n_dev, (bs // n_dev) * n_dev)
        for start in range(0, G, bs):
            stop = min(start + bs, G)
            yield start, stop, bs

    def _pad_g(self, arr: np.ndarray, padded: int, fill) -> np.ndarray:
        """Pad the leading (gene) axis to ``padded`` with ``fill``."""
        g = arr.shape[0]
        if g == padded:
            return arr
        pad_width = [(0, padded - g)] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, pad_width, constant_values=fill)

    # ------------------------------------------------------- Inference methods
    def lin_reg_mu(self, counts, size_factors, design_matrix, min_mu):
        """Parity: reference pydeseq2/default_inference.py:58-81."""
        cnt = jnp.asarray(np.asarray(counts).T, dtype=self.dtype)  # (G, N)
        sf = jnp.asarray(np.asarray(size_factors), dtype=self.dtype)
        X = jnp.asarray(np.asarray(design_matrix), dtype=self.dtype)
        mu = linreg_ops.fit_lin_mu_batch(
            self._device_put_gene_major(cnt), self._replicate(sf), self._replicate(X), min_mu
        )
        return np.asarray(mu).T

    def fit_rough_dispersions(self, normed_counts, design_matrix):
        """Parity: reference pydeseq2/utils.py:814-853 (incl. the n==p guard)."""
        X = np.asarray(design_matrix, dtype=float)
        num_samples, num_vars = X.shape
        if num_samples == num_vars:
            raise ValueError(
                "The number of samples and the number of design variables are "
                "equal, i.e., there are no replicates to estimate the "
                "dispersion. Please use a design with fewer variables."
            )
        nc = jnp.asarray(np.asarray(normed_counts).T, dtype=self.dtype)
        out = linreg_ops.fit_rough_dispersions_batch(
            self._device_put_gene_major(nc), self._replicate(jnp.asarray(X, dtype=self.dtype))
        )
        return np.asarray(out)

    def fit_moments_dispersions(self, normed_counts, size_factors):
        """Parity: reference pydeseq2/utils.py:856-885."""
        nc_np = np.asarray(normed_counts)
        # The reference drops all-zero genes before computing (they are
        # already excluded by the caller, but keep the guard equivalent).
        nc = jnp.asarray(nc_np.T, dtype=self.dtype)
        sf = jnp.asarray(np.asarray(size_factors), dtype=self.dtype)
        out = linreg_ops.fit_moments_dispersions_batch(
            self._device_put_gene_major(nc), self._replicate(sf)
        )
        return np.asarray(out)

    def irls(
        self,
        counts,
        size_factors,
        design_matrix,
        disp,
        min_mu,
        beta_tol,
        min_beta: float = -30,
        max_beta: float = 30,
        optimizer: Literal["BFGS", "L-BFGS-B"] = "L-BFGS-B",
        maxiter: int = 250,
    ):
        """Batched IRLS with host-gated Newton/grid rescue.

        Parity: reference pydeseq2/utils.py:273-438 +
        pydeseq2/default_inference.py:83-124.
        """
        cnt_np = np.asarray(counts).T  # (G, N)
        G, N = cnt_np.shape
        sf = self._replicate(jnp.asarray(np.asarray(size_factors), dtype=self.dtype))
        X = self._replicate(jnp.asarray(np.asarray(design_matrix), dtype=self.dtype))
        P = X.shape[1]
        full_rank = bool(
            np.linalg.matrix_rank(np.asarray(design_matrix, dtype=float)) == P
        )
        disp_np = np.asarray(disp)

        beta_out = np.empty((G, P), dtype=np.float64)
        # The two big (G, N) buffers stay in the compute dtype: at atlas
        # scale a float64 export doubles host memory for no information
        # (the device solved in self.dtype anyway).
        mu_out = np.empty((G, N), dtype=self.dtype)
        hat_out = np.empty((G, N), dtype=self.dtype)
        conv_out = np.empty((G,), dtype=bool)

        for start, stop, padded in self._chunks(G, N):
            cnt_c = self._pad_g(cnt_np[start:stop], padded, 1.0)
            disp_c = self._pad_g(disp_np[start:stop], padded, 0.5)
            cnt_d = self._device_put_gene_major(jnp.asarray(cnt_c, dtype=self.dtype))
            disp_d = self._device_put_gene_major(jnp.asarray(disp_c, dtype=self.dtype))

            beta_init = irls_ops.irls_beta_init(cnt_d, sf, X, full_rank=full_rank)
            beta, needs_fb, conv = irls_ops.irls_core(
                cnt_d, sf, X, disp_d, beta_init,
                min_mu=min_mu, beta_tol=beta_tol, max_beta=max_beta, maxiter=maxiter,
            )
            needs_fb_np = np.asarray(needs_fb)

            if needs_fb_np.any():
                beta_np = np.array(beta)
                conv_np = np.array(conv)
                idx = np.where(needs_fb_np)[0]
                nb = _bucket(len(idx))
                sel = np.resize(idx, nb)  # pad by repeating lanes
                c_fb = jnp.asarray(cnt_c[sel], dtype=self.dtype)
                d_fb = jnp.asarray(disp_c[sel], dtype=self.dtype)
                b_init_fb = jnp.asarray(np.asarray(beta_init)[sel], dtype=self.dtype)
                b_fb, ok_fb = irls_ops.newton_box_nbglm(
                    c_fb, sf, X, d_fb, b_init_fb,
                    min_mu=min_mu, max_beta=max_beta,
                )
                # np.array: device exports are read-only views and the grid
                # tier below writes into this buffer.
                b_fb_np = np.array(b_fb)[: len(idx)]
                ok_fb_np = np.asarray(ok_fb)[: len(idx)]
                if (~ok_fb_np).any() and P <= 2:
                    gidx = idx[~ok_fb_np]
                    ngb = _bucket(len(gidx))
                    gsel = np.resize(gidx, ngb)
                    b_grid = irls_ops.grid_fit_beta_batch(
                        jnp.asarray(cnt_c[gsel], dtype=self.dtype),
                        sf,
                        X,
                        jnp.asarray(disp_c[gsel], dtype=self.dtype),
                        min_mu=min_mu,
                    )
                    b_fb_np[~ok_fb_np] = np.asarray(b_grid)[: len(gidx)]
                beta_np[idx] = b_fb_np
                conv_np[idx] = ok_fb_np
                beta = jnp.asarray(beta_np, dtype=self.dtype)
                conv = jnp.asarray(conv_np)

            H, mu = irls_ops.hat_diagonals(cnt_d, sf, X, disp_d, beta, min_mu=min_mu)
            n_real = stop - start
            beta_out[start:stop] = np.asarray(beta)[:n_real]
            mu_out[start:stop] = np.asarray(mu)[:n_real]
            hat_out[start:stop] = np.asarray(H)[:n_real]
            conv_out[start:stop] = np.asarray(conv)[:n_real]

        return beta_out, mu_out.T, hat_out.T, conv_out

    def alpha_mle(
        self,
        counts,
        design_matrix,
        mu,
        alpha_hat,
        min_disp,
        max_disp,
        prior_disp_var=None,
        cr_reg: bool = True,
        prior_reg: bool = False,
        optimizer: Literal["BFGS", "L-BFGS-B"] = "L-BFGS-B",
    ):
        """Batched dispersion fit (coarse->fine grid + Newton polish).

        Parity: reference pydeseq2/utils.py:441-564 +
        pydeseq2/grid_search.py:54-142.
        """
        cnt_np = np.asarray(counts).T
        mu_np = np.asarray(mu).T
        G, N = cnt_np.shape
        X = self._replicate(jnp.asarray(np.asarray(design_matrix), dtype=self.dtype))
        ah_np = np.asarray(alpha_hat, dtype=float)

        alpha_out = np.empty((G,), dtype=np.float64)
        conv_out = np.empty((G,), dtype=bool)
        for start, stop, padded in self._chunks(G, N):
            cnt_c = self._pad_g(cnt_np[start:stop], padded, 1.0)
            mu_c = self._pad_g(mu_np[start:stop], padded, 1.0)
            ah_c = self._pad_g(ah_np[start:stop], padded, 0.5)
            alpha, conv = disp_ops.alpha_mle_batch(
                self._device_put_gene_major(jnp.asarray(cnt_c, dtype=self.dtype)),
                X,
                self._device_put_gene_major(jnp.asarray(mu_c, dtype=self.dtype)),
                self._device_put_gene_major(jnp.asarray(ah_c, dtype=self.dtype)),
                float(min_disp),
                float(max_disp),
                prior_disp_var=prior_disp_var,
                cr_reg=cr_reg,
                prior_reg=prior_reg,
            )
            n_real = stop - start
            alpha_out[start:stop] = np.asarray(alpha)[:n_real]
            conv_out[start:stop] = np.asarray(conv)[:n_real]
        return alpha_out, conv_out

    def wald_test(
        self,
        design_matrix,
        disp,
        lfc,
        mu,
        ridge_factor,
        contrast,
        lfc_null,
        alt_hypothesis=None,
    ):
        """Parity: reference pydeseq2/utils.py:718-811 +
        pydeseq2/default_inference.py:163-198."""
        mu_np = np.asarray(mu).T  # (G, N)
        G, N = mu_np.shape
        X = self._replicate(jnp.asarray(np.asarray(design_matrix), dtype=self.dtype))
        ridge = self._replicate(jnp.asarray(np.asarray(ridge_factor), dtype=self.dtype))
        cvec = self._replicate(jnp.asarray(np.asarray(contrast), dtype=self.dtype))
        disp_np = np.asarray(disp)
        lfc_np = np.asarray(lfc)

        p_out = np.empty((G,), dtype=np.float64)
        s_out = np.empty((G,), dtype=np.float64)
        se_out = np.empty((G,), dtype=np.float64)
        for start, stop, padded in self._chunks(G, N):
            mu_c = self._pad_g(mu_np[start:stop], padded, 1.0)
            d_c = self._pad_g(disp_np[start:stop], padded, 0.5)
            l_c = self._pad_g(lfc_np[start:stop], padded, 0.0)
            pv, st, se = wald_ops.wald_test_batch(
                X,
                self._device_put_gene_major(jnp.asarray(d_c, dtype=self.dtype)),
                self._device_put_gene_major(jnp.asarray(l_c, dtype=self.dtype)),
                self._device_put_gene_major(jnp.asarray(mu_c, dtype=self.dtype)),
                ridge,
                cvec,
                float(lfc_null),
                alt_hypothesis,
            )
            n_real = stop - start
            p_out[start:stop] = np.asarray(pv)[:n_real]
            s_out[start:stop] = np.asarray(st)[:n_real]
            se_out[start:stop] = np.asarray(se)[:n_real]
        return p_out, s_out, se_out

    def dispersion_trend_gamma_glm(self, covariates, targets):
        """Parity: reference pydeseq2/default_inference.py:200-230."""
        cov = np.asarray(covariates, dtype=float)
        tar = np.asarray(targets, dtype=float)
        valid = np.isfinite(cov) & np.isfinite(tar)
        coeffs, preds, ok = trend_ops.gamma_glm_trend_fit(
            jnp.asarray(cov, dtype=self.dtype),
            jnp.asarray(tar, dtype=self.dtype),
            jnp.asarray(valid),
        )
        return np.asarray(coeffs), np.asarray(preds), bool(ok)

    def lfc_shrink_nbinom_glm(
        self,
        design_matrix,
        counts,
        size,
        offset,
        prior_no_shrink_scale,
        prior_scale,
        optimizer,
        shrink_index,
    ):
        """Parity: reference pydeseq2/utils.py:990-1144 +
        pydeseq2/default_inference.py:232-264."""
        cnt_np = np.asarray(counts).T  # (G, N)
        G, N = cnt_np.shape
        X = self._replicate(jnp.asarray(np.asarray(design_matrix), dtype=self.dtype))
        P = X.shape[1]
        size_np = np.asarray(size, dtype=float)
        off = self._replicate(jnp.asarray(np.asarray(offset), dtype=self.dtype))

        beta_out = np.empty((G, P), dtype=np.float64)
        ih_out = np.empty((G, P, P), dtype=np.float64)
        conv_out = np.empty((G,), dtype=bool)
        for start, stop, padded in self._chunks(G, N):
            cnt_c = self._pad_g(cnt_np[start:stop], padded, 1.0)
            size_c = self._pad_g(size_np[start:stop], padded, 1.0)
            cnt_d = self._device_put_gene_major(jnp.asarray(cnt_c, dtype=self.dtype))
            size_d = self._device_put_gene_major(jnp.asarray(size_c, dtype=self.dtype))
            beta, ih, conv = shrink_ops.nbinom_glm_batch(
                X, cnt_d, size_d, off,
                float(prior_no_shrink_scale), float(prior_scale),
                shrink_index=int(shrink_index),
            )
            conv_np = np.array(conv)
            beta_np = np.array(beta)
            ih_np = np.array(ih)
            if (~conv_np).any() and P == 2:
                idx = np.where(~conv_np)[0]
                nb = _bucket(len(idx))
                sel = np.resize(idx, nb)
                cnst = jnp.maximum(
                    shrink_ops.nbinom_fn_batch(
                        jnp.zeros((nb, P), self.dtype),
                        X,
                        jnp.asarray(cnt_c[sel], dtype=self.dtype),
                        jnp.asarray(size_c[sel], dtype=self.dtype),
                        off,
                        jnp.asarray(prior_no_shrink_scale, self.dtype),
                        jnp.asarray(prior_scale, self.dtype),
                        int(shrink_index),
                    ),
                    1.0,
                )
                b_grid = shrink_ops.grid_fit_shrink_beta_batch(
                    jnp.asarray(cnt_c[sel], dtype=self.dtype),
                    off,
                    X,
                    jnp.asarray(size_c[sel], dtype=self.dtype),
                    float(prior_no_shrink_scale),
                    float(prior_scale),
                    cnst,
                    shrink_index=int(shrink_index),
                )
                beta_np[idx] = np.asarray(b_grid)[: len(idx)]
                # Recompute inverse Hessians at the grid betas.
                ih_grid = np.asarray(
                    jnp.linalg.inv(
                        shrink_ops._hess(
                            jnp.asarray(beta_np[sel], dtype=self.dtype),
                            X,
                            jnp.asarray(cnt_c[sel], dtype=self.dtype),
                            jnp.asarray(size_c[sel], dtype=self.dtype),
                            off,
                            jnp.asarray(prior_no_shrink_scale, self.dtype),
                            jnp.asarray(prior_scale, self.dtype),
                            int(shrink_index),
                        )
                    )
                )
                ih_np[idx] = ih_grid[: len(idx)]
            n_real = stop - start
            beta_out[start:stop] = beta_np[:n_real]
            ih_out[start:stop] = ih_np[:n_real]
            conv_out[start:stop] = conv_np[:n_real]
        return beta_out, ih_out, conv_out
