"""DeseqDataSet: the 8-stage DESeq2 pipeline driver over device kernels.

Parity target (reference, owkin/PyDESeq2): pydeseq2/dds.py:33-1563. The class
owns all pipeline state in AnnData-style slots on a
:class:`~pydeseq2_tpu.container.DeseqDataContainer` and drives

    size factors -> genewise dispersions -> dispersion trend -> dispersion
    prior -> MAP dispersions -> LFCs -> Cook's distances -> outlier refit

where every per-gene stage executes as one batched device program through
:class:`~pydeseq2_tpu.jax_inference.JaxInference` (genes sharded over the
mesh, design replicated). Host code here only does label bookkeeping, tiny
scalar statistics (F/polygamma cutoffs), and the data-dependent refit
orchestration.
"""

from __future__ import annotations

import sys
import time
import warnings
from contextlib import contextmanager
from typing import Literal

import numpy as np
import pandas as pd

from pydeseq2_tpu.container import DeseqDataContainer
from pydeseq2_tpu.formula import DesignMatrix
from pydeseq2_tpu.inference import Inference
from pydeseq2_tpu.jax_inference import JaxInference
from pydeseq2_tpu.preprocessing import (
    deseq2_norm_fit,
    deseq2_norm_transform,
    poscounts_norm_fit,
    poscounts_size_factors,
)
from pydeseq2_tpu.ops import stats as stats_ops
from pydeseq2_tpu.utils import (
    dispersion_trend,
    n_or_more_replicates,
    nb_nll_numpy,
    test_valid_counts,
    trimmed_mean_numpy,
)


class DeseqDataSet(DeseqDataContainer):
    r"""Dispersion and log fold-change estimation (TPU-native DESeq2).

    Parameters mirror the reference class (pydeseq2/dds.py:206-229); see that
    docstring for statistical background. Differences: ``inference`` defaults
    to :class:`JaxInference` (batched JAX kernels) instead of a joblib pool,
    and ``n_cpus`` is accepted for API compatibility but only forwarded to
    inference objects that care about it.
    """

    def __init__(
        self,
        *,
        adata=None,
        counts: pd.DataFrame | np.ndarray | None = None,
        metadata: pd.DataFrame | None = None,
        design: str | pd.DataFrame = "~condition",
        design_factors: str | list[str] | None = None,
        continuous_factors: list[str] | None = None,
        ref_level: list[str] | None = None,
        fit_type: Literal["parametric", "mean"] = "parametric",
        size_factors_fit_type: Literal["ratio", "poscounts", "iterative"] = "ratio",
        control_genes=None,
        min_mu: float = 0.5,
        min_disp: float = 1e-8,
        max_disp: float = 10.0,
        refit_cooks: bool = True,
        min_replicates: int = 7,
        beta_tol: float = 1e-8,
        n_cpus: int | None = None,
        inference: Inference | None = None,
        quiet: bool = False,
        low_memory: bool = False,
    ) -> None:
        if adata is not None:
            if counts is not None:
                warnings.warn(
                    "adata was provided; ignoring counts.", UserWarning, stacklevel=2
                )
            if metadata is not None:
                warnings.warn(
                    "adata was provided; ignoring metadata.", UserWarning, stacklevel=2
                )
            test_valid_counts(adata.X)
            super().__init__(
                np.asarray(adata.X).astype(int), obs=adata.obs, var=adata.var
            )
        elif counts is not None and metadata is not None:
            test_valid_counts(counts)
            if isinstance(counts, pd.DataFrame):
                x = counts.to_numpy().astype(int)
                var = pd.DataFrame(index=counts.columns)
                obs_index = counts.index
            else:
                x = np.asarray(counts).astype(int)
                var = None
                obs_index = metadata.index
            if not metadata.index.equals(obs_index):
                raise ValueError(
                    "The count matrix and metadata indexes do not match."
                )
            super().__init__(x, obs=metadata, var=var)
        else:
            raise ValueError(
                "Either adata or both counts and metadata arguments must be provided."
            )

        self.fit_type = fit_type
        self.design = design

        if continuous_factors is not None:
            warnings.warn(
                "continuous_factors is deprecated; continuous factors are "
                "detected from dtypes or cast with the C() operator.",
                DeprecationWarning,
                stacklevel=2,
            )
        if ref_level is not None:
            warnings.warn(
                "ref_level is deprecated and has no effect.",
                DeprecationWarning,
                stacklevel=2,
            )
        if design_factors is not None:
            warnings.warn(
                "design_factors is deprecated; provide a formula via the "
                "design argument instead.",
                DeprecationWarning,
                stacklevel=2,
            )
            design_factors = (
                design_factors if isinstance(design_factors, list) else [design_factors]
            )
            self.design = "~" + " + ".join(design_factors)

        if not isinstance(self.design, (str, pd.DataFrame)):
            raise ValueError(
                "design must be a string representing a formula, or a pandas "
                "DataFrame."
            )

        if isinstance(self.design, str):
            self._design_obj: DesignMatrix | None = DesignMatrix(self.obs, self.design)
            self.obsm["design_matrix"] = self._design_obj.matrix
        else:
            self._design_obj = None
            if not self.design.index.equals(self.obs_names):
                raise ValueError(
                    "Design matrix and metadata indexes do not match."
                )
            self.obsm["design_matrix"] = self.design

        if self.obsm["design_matrix"].isna().any().any():
            raise ValueError("NaNs are not allowed in the design.")

        self._check_full_rank_design()

        self.min_mu = min_mu
        self.min_disp = min_disp
        self.max_disp = np.maximum(max_disp, self.n_obs)
        self.refit_cooks = refit_cooks
        self.min_replicates = min_replicates
        self.beta_tol = beta_tol
        self.quiet = quiet
        self.low_memory = low_memory
        self.size_factors_fit_type = size_factors_fit_type
        self.control_genes = control_genes
        self.logmeans: np.ndarray | None = None
        self.filtered_genes: np.ndarray | None = None

        self.inference = inference or JaxInference()

    # ------------------------------------------------------------ properties
    @property
    def variables(self):
        """Names of the variables in the model definition."""
        if self._design_obj is None:
            raise ValueError(
                "Retrieving variables is only possible if the model was "
                "initialized using a formula."
            )
        return self._design_obj.variables

    def cond(self, **kwargs):
        """Contrast-style model-matrix row for a condition.

        Parity: reference pydeseq2/dds.py:564-578.
        """
        if self._design_obj is None:
            raise ValueError(
                "cond() requires the model to be initialized with a formula."
            )
        return self._design_obj.cond(**kwargs)

    def contrast(self, *args, **kwargs):
        """Contrast vector for a simple pairwise comparison.

        Parity: reference pydeseq2/dds.py:580-582.
        """
        if self._design_obj is None:
            raise ValueError(
                "contrast() requires the model to be initialized with a formula."
            )
        return self._design_obj.contrast(*args, **kwargs)

    # -------------------------------------------------------------- pipeline
    def deseq2(self, fit_type: Literal["parametric", "mean"] | None = None) -> None:
        """Run the full dispersion + LFC estimation pipeline.

        Parity: reference pydeseq2/dds.py:516-562.
        """
        if fit_type is not None:
            self.fit_type = fit_type
            if not self.quiet:
                print(f"Using {self.fit_type} fit type.")

        self.fit_size_factors(
            fit_type=self.size_factors_fit_type, control_genes=self.control_genes
        )
        self.fit_genewise_dispersions()
        self.fit_dispersion_trend()
        self.fit_dispersion_prior()
        self.fit_MAP_dispersions()
        self.fit_LFC()
        self.calculate_cooks()
        if self.refit_cooks:
            self.refit()
        self.cooks_outlier()

    def _control_gene_mask(self, control_genes) -> np.ndarray:
        """Boolean gene mask from any valid gene indexer (or all-True)."""
        if control_genes is None:
            control_genes = self.control_genes
            if control_genes is not None and not self.quiet:
                print(
                    f"Using {control_genes} as control genes, passed at "
                    "DeseqDataSet initialization"
                )
        mask = np.zeros(self.n_vars, dtype=bool)
        if control_genes is None:
            mask[:] = True
        else:
            mask[self.normalize_gene_indexer(control_genes)] = True
        return mask

    def fit_size_factors(
        self,
        fit_type: Literal["ratio", "poscounts", "iterative"] | None = None,
        control_genes=None,
    ) -> None:
        """Fit sample-wise normalization (size) factors.

        Dispatches to one of three estimators — ``ratio`` (median of
        ratios), ``poscounts`` (positive-count geometric means, for
        zero-rich data) or ``iterative`` (trimmed-likelihood MLE) — with the
        reference's automatic ratio->iterative switch when every gene has a
        zero. Behavior parity: reference pydeseq2/dds.py:584-711.
        """
        fit_type = fit_type or self.size_factors_fit_type
        if not self.quiet:
            print("Fitting size factors...", file=sys.stderr)
        start = time.time()

        if fit_type == "iterative":
            self._fit_iterate_size_factors()
        elif fit_type == "poscounts":
            self._size_factors_poscounts(self._control_gene_mask(control_genes))
        elif not (self.X > 0).all(0).any():
            # ratio requested but no gene is zero-free: log-geometric means
            # are undefined, so fall through to the iterative estimator.
            warnings.warn(
                "Every gene contains at least one zero, cannot compute log "
                "geometric means. Switching to iterative mode.",
                UserWarning,
                stacklevel=2,
            )
            self._fit_iterate_size_factors()
        else:
            self._size_factors_ratio(self._control_gene_mask(control_genes))

        self.var["_normed_means"] = self.layers["normed_counts"].mean(0)
        if not self.quiet:
            print(f"... done in {time.time() - start:.2f} seconds.\n", file=sys.stderr)

    def _size_factors_ratio(self, control_mask: np.ndarray) -> None:
        """Median-of-ratios estimator (device reductions)."""
        self.logmeans, self.filtered_genes = deseq2_norm_fit(self.X)
        normed, sf = deseq2_norm_transform(
            self.X, self.logmeans, control_mask & self.filtered_genes
        )
        self.layers["normed_counts"] = normed
        self.obs["size_factors"] = sf

    def _size_factors_poscounts(self, control_mask: np.ndarray) -> None:
        """Positive-counts estimator, fully batched on device.

        Unlike the reference's per-sample Python loop
        (pydeseq2/dds.py:668-676), the ragged per-sample medians run as one
        (N, G) sort+gather kernel (:func:`poscounts_size_factors`), so this
        stays device-resident at 10k+ samples.
        """
        self.logmeans, self.filtered_genes = poscounts_norm_fit(self.X)
        sf = poscounts_size_factors(
            self.X, self.logmeans, control_mask & self.filtered_genes
        )
        self.obs["size_factors"] = sf
        self.layers["normed_counts"] = self.X / sf[:, None]

    def fit_genewise_dispersions(self, vst: bool = False) -> None:
        """Per-gene NB dispersion MLE (one batched device program).

        Parity: reference pydeseq2/dds.py:713-797.
        """
        if "size_factors" not in self.obs:
            self.fit_size_factors(fit_type=self.size_factors_fit_type)

        self.var["non_zero"] = ~(self.X == 0).all(axis=0)
        self.non_zero_idx = np.arange(self.n_vars)[self.var["non_zero"]]
        self.non_zero_genes = self.var_names[self.var["non_zero"]]

        self._fit_MoM_dispersions()

        design_matrix = self.obsm["design_matrix"].values
        size_factors = self.obs["size_factors"].values

        # mu init: linear regression when design groups <-> columns are 1:1,
        # else one IRLS pass with MoM dispersions
        # (reference pydeseq2/dds.py:743-765).
        if (
            len(self.obsm["design_matrix"].value_counts())
            == self.obsm["design_matrix"].shape[-1]
        ):
            mu_hat_ = self.inference.lin_reg_mu(
                counts=self.X[:, self.non_zero_idx],
                size_factors=size_factors,
                design_matrix=design_matrix,
                min_mu=self.min_mu,
            )
        else:
            _, mu_hat_, _, _ = self.inference.irls(
                counts=self.X[:, self.non_zero_idx],
                size_factors=size_factors,
                design_matrix=design_matrix,
                disp=self.var.loc[self.var["non_zero"], "_MoM_dispersions"].values,
                min_mu=self.min_mu,
                beta_tol=self.beta_tol,
            )

        mu_param_name = "_vst_mu_hat" if vst else "_mu_hat"
        disp_param_name = "vst_genewise_dispersions" if vst else "genewise_dispersions"

        self.layers[mu_param_name] = np.full((self.n_obs, self.n_vars), np.nan)
        self.layers[mu_param_name][:, self.var["non_zero"]] = mu_hat_

        if not self.quiet:
            print("Fitting dispersions...", file=sys.stderr)
        start = time.time()
        dispersions_, converged_ = self.inference.alpha_mle(
            counts=self.X[:, self.non_zero_idx],
            design_matrix=design_matrix,
            mu=self.layers[mu_param_name][:, self.non_zero_idx],
            alpha_hat=self.var.loc[self.var["non_zero"], "_MoM_dispersions"].values,
            min_disp=self.min_disp,
            max_disp=self.max_disp,
        )
        if not self.quiet:
            print(f"... done in {time.time() - start:.2f} seconds.\n", file=sys.stderr)

        self.var[disp_param_name] = np.full(self.n_vars, np.nan)
        self.var.loc[self.var["non_zero"], disp_param_name] = np.clip(
            dispersions_, self.min_disp, self.max_disp
        )
        self.var["_genewise_converged"] = np.full(self.n_vars, np.nan)
        self.var.loc[self.var["non_zero"], "_genewise_converged"] = converged_.astype(float)

    def fit_dispersion_trend(self, vst: bool = False) -> None:
        """Fit the dispersion trend curve (parametric or mean).

        Parity: reference pydeseq2/dds.py:799-831.
        """
        disp_param_name = "vst_genewise_dispersions" if vst else "genewise_dispersions"
        fit_type = self.vst_fit_type if vst else self.fit_type

        if disp_param_name not in self.var:
            self.fit_genewise_dispersions(vst)

        if not self.quiet:
            print("Fitting dispersion trend curve...", file=sys.stderr)
        start = time.time()
        if fit_type == "parametric":
            self._fit_parametric_dispersion_trend(vst)
        elif fit_type == "mean":
            self._fit_mean_dispersion_trend(vst)
        else:
            raise NotImplementedError(
                f"Expected 'parametric' or 'mean' trend curve fit types, "
                f"received {fit_type}"
            )
        if not self.quiet:
            print(f"... done in {time.time() - start:.2f} seconds.\n", file=sys.stderr)

    def disp_function(self, x):
        """Dispersion trend function evaluated at x."""
        if self.uns["disp_function_type"] == "parametric":
            return dispersion_trend(x, self.uns["trend_coeffs"])
        elif self.uns["disp_function_type"] == "mean":
            return np.full_like(np.asarray(x, dtype=float), self.uns["mean_disp"])

    def fit_dispersion_prior(self) -> None:
        """Fit the dispersion prior variance (empirical Bayes hyperparameter).

        Parity: reference pydeseq2/dds.py:840-884.
        """
        from scipy.special import polygamma  # host scalar only

        if "fitted_dispersions" not in self.var:
            self.fit_dispersion_trend()

        num_samples = self.n_obs
        num_vars = self.obsm["design_matrix"].shape[-1]

        if (num_samples - num_vars) <= 3:
            warnings.warn(
                "As the residual degrees of freedom is less than 3, the "
                "distribution of log dispersions is especially asymmetric and "
                "likely to be poorly estimated by the MAD.",
                UserWarning,
                stacklevel=2,
            )

        gw = self.var.loc[self.var["non_zero"], "genewise_dispersions"]
        fitted = self.var.loc[self.var["non_zero"], "fitted_dispersions"]
        disp_residuals = np.log(gw.values) - np.log(fitted.values)
        above_min_disp = gw.values >= (100 * self.min_disp)

        mad = float(
            stats_ops.mean_absolute_deviation(
                np.asarray(disp_residuals[above_min_disp])
            )
        )
        self.uns["_squared_logres"] = mad**2
        self.uns["prior_disp_var"] = np.maximum(
            self.uns["_squared_logres"] - polygamma(1, (num_samples - num_vars) / 2),
            0.25,
        ).item()

    def fit_MAP_dispersions(self) -> None:
        """MAP dispersion shrinkage toward the trend curve.

        Parity: reference pydeseq2/dds.py:886-935.
        """
        if "prior_disp_var" not in self.uns:
            self.fit_dispersion_prior()

        design_matrix = self.obsm["design_matrix"].values
        if not self.quiet:
            print("Fitting MAP dispersions...", file=sys.stderr)
        start = time.time()
        dispersions_, converged_ = self.inference.alpha_mle(
            counts=self.X[:, self.non_zero_idx],
            design_matrix=design_matrix,
            mu=self.layers["_mu_hat"][:, self.non_zero_idx],
            alpha_hat=self.var.loc[self.var["non_zero"], "fitted_dispersions"].values,
            min_disp=self.min_disp,
            max_disp=self.max_disp,
            prior_disp_var=float(self.uns["prior_disp_var"]),
            cr_reg=True,
            prior_reg=True,
        )
        if not self.quiet:
            print(f"... done in {time.time() - start:.2f} seconds.\n", file=sys.stderr)

        self.var["MAP_dispersions"] = np.full(self.n_vars, np.nan)
        self.var.loc[self.var["non_zero"], "MAP_dispersions"] = np.clip(
            dispersions_, self.min_disp, self.max_disp
        )
        self.var["_MAP_converged"] = np.full(self.n_vars, np.nan)
        self.var.loc[self.var["non_zero"], "_MAP_converged"] = converged_.astype(float)

        # Shrinkage outliers keep their genewise estimates
        # (reference pydeseq2/dds.py:925-932).
        self.var["dispersions"] = self.var["MAP_dispersions"].copy()
        with np.errstate(invalid="ignore"):
            self.var["_outlier_genes"] = np.log(
                self.var["genewise_dispersions"]
            ) > np.log(self.var["fitted_dispersions"]) + 2 * np.sqrt(
                self.uns["_squared_logres"]
            )
        self.var.loc[self.var["_outlier_genes"], "dispersions"] = self.var.loc[
            self.var["_outlier_genes"], "genewise_dispersions"
        ]

        if self.low_memory:
            del self.layers["_mu_hat"]

    def fit_LFC(self) -> None:
        """Fit LFC coefficients (batched IRLS, natural log scale).

        Parity: reference pydeseq2/dds.py:937-984.
        """
        if "dispersions" not in self.var:
            self.fit_MAP_dispersions()

        design_matrix = self.obsm["design_matrix"].values
        if not self.quiet:
            print("Fitting LFCs...", file=sys.stderr)
        start = time.time()
        mle_lfcs_, mu_, hat_diagonals_, converged_ = self.inference.irls(
            counts=self.X[:, self.non_zero_idx],
            size_factors=self.obs["size_factors"].values,
            design_matrix=design_matrix,
            disp=self.var.loc[self.var["non_zero"], "dispersions"].values,
            min_mu=self.min_mu,
            beta_tol=self.beta_tol,
        )
        if not self.quiet:
            print(f"... done in {time.time() - start:.2f} seconds.\n", file=sys.stderr)

        self.varm["LFC"] = pd.DataFrame(
            np.nan,
            index=self.var_names,
            columns=self.obsm["design_matrix"].columns,
        )
        self.varm["LFC"].update(
            pd.DataFrame(
                mle_lfcs_,
                index=self.non_zero_genes,
                columns=self.obsm["design_matrix"].columns,
            )
        )
        self.obsm["_mu_LFC"] = mu_
        self.obsm["_hat_diagonals"] = hat_diagonals_
        self.var["_LFC_converged"] = np.full(self.n_vars, np.nan)
        self.var.loc[self.var["non_zero"], "_LFC_converged"] = converged_.astype(float)

    def calculate_cooks(self) -> None:
        """Cook's distances for outlier detection (vectorized).

        Parity: reference pydeseq2/dds.py:986-1040.
        """
        if "dispersions" not in self.var:
            self.fit_MAP_dispersions()

        if not self.quiet:
            print("Calculating cook's distance...", file=sys.stderr)
        start = time.time()
        num_vars = self.obsm["design_matrix"].shape[-1]
        dispersions = self._robust_mom_dispersions(
            self.layers["normed_counts"][:, self.var["non_zero"]]
        )

        mu = self.obsm["_mu_LFC"]
        squared_pearson_res = (self.X[:, self.var["non_zero"]] - mu) ** 2
        V = mu + dispersions[None, :] * mu**2
        squared_pearson_res = squared_pearson_res / V / num_vars

        H = self.obsm["_hat_diagonals"]
        diag_mul = H / (1 - H) ** 2
        cooks = squared_pearson_res * diag_mul

        if self.low_memory:
            del self.obsm["_mu_LFC"]
            del self.obsm["_hat_diagonals"]

        self.layers["cooks"] = np.full((self.n_obs, self.n_vars), np.nan)
        self.layers["cooks"][:, self.var["non_zero"]] = cooks
        if not self.quiet:
            print(f"... done in {time.time() - start:.2f} seconds.\n", file=sys.stderr)

    def _robust_mom_dispersions(self, normed_counts: np.ndarray) -> np.ndarray:
        """Trimmed method-of-moments dispersions for Cook's distances.

        Parity: reference pydeseq2/utils.py:914-960.
        """
        design_df = self.obsm["design_matrix"]
        three_or_more = n_or_more_replicates(design_df, 3)
        if three_or_more.any():
            filtered_counts = normed_counts[three_or_more.to_numpy(), :]
            filtered_design = design_df.loc[three_or_more, :]
            cell_id = filtered_design.groupby(
                filtered_design.columns.values.tolist()
            ).ngroup()
            v = np.asarray(
                stats_ops.trimmed_cell_variance(
                    np.asarray(filtered_counts), cell_id.to_numpy()
                )
            )
        else:
            v = np.asarray(stats_ops.trimmed_variance(np.asarray(normed_counts)))
        m = normed_counts.mean(0)
        alpha = (v - m) / m**2
        return np.maximum(alpha, 0.04)

    # ----------------------------------------------------------- refit logic
    def refit(self) -> None:
        """Replace Cook outliers and refit affected genes.

        Parity: reference pydeseq2/dds.py:1042-1064.
        """
        self._replace_outliers()
        if not self.quiet:
            print(
                f"Replacing {sum(self.var['replaced'])} outlier genes.\n",
                file=sys.stderr,
            )
        if sum(self.var["replaced"]) > 0:
            self._refit_without_outliers()
        else:
            self.var["refitted"] = np.full(self.n_vars, False)

    def _cooks_cutoff(self) -> float:
        """99th-percentile F cutoff for Cook's distances (host scalar)."""
        from scipy.stats import f

        p = self.obsm["design_matrix"].shape[-1]
        return float(f.ppf(0.99, p, self.n_obs - p))

    def cooks_outlier(self):
        """Boolean gene mask of Cook's outliers for p-value masking.

        Behavior parity: reference pydeseq2/dds.py:1066-1110. A gene is
        flagged when any well-replicated sample (cohort >= 3) exceeds the F
        cutoff — unless at least 3 samples have higher counts than the
        worst-Cook's sample, in which case the extreme value is considered
        representative rather than an outlier. The veto is evaluated for all
        genes at once (the reference gathers per flagged gene).
        """
        if "_pvalue_cooks_outlier" in self.var.keys():
            return self.var["_pvalue_cooks_outlier"]

        cutoff = self._cooks_cutoff()
        well_replicated = n_or_more_replicates(
            self.obsm["design_matrix"], 3
        ).values

        refit_ran = (
            self.refit_cooks
            and self.var["refitted"].sum() > 0
            and "replace_cooks" in self.layers.keys()
        )
        distances = self.layers["replace_cooks" if refit_ran else "cooks"]
        flagged = (distances[well_replicated, :] > cutoff).any(axis=0)

        # Count-based veto, computed on the pre-replacement distances.
        worst_sample = self.layers["cooks"].argmax(axis=0)
        worst_counts = self.X[worst_sample, np.arange(self.n_vars)]
        n_above_worst = (self.X > worst_counts[None, :]).sum(axis=0)
        outliers = flagged & (n_above_worst < 3)

        if self.low_memory:
            del self.layers["cooks"]
            if "replace_cooks" in self.layers.keys():
                del self.layers["replace_cooks"]

        self.var["_pvalue_cooks_outlier"] = outliers
        return self.var["_pvalue_cooks_outlier"]

    def _replace_outliers(self) -> None:
        """Impute counts whose Cook's distance exceeds the F(0.99) cutoff.

        Behavior parity: reference pydeseq2/dds.py:1301-1358. Flagged
        entries in well-replicated cohorts (>= ``min_replicates``) are
        replaced by trimmed-mean(0.2) baselines rescaled per sample;
        the affected genes are split off into ``counts_to_refit``.
        """
        if "cooks" not in self.layers:
            self.calculate_cooks()

        replaceable = n_or_more_replicates(
            self.obsm["design_matrix"], self.min_replicates
        ).values
        self.obs["replaceable"] = replaceable
        if not replaceable.any():
            self.var["replaced"] = np.zeros(self.n_vars, dtype=bool)
            return

        exceeds = self.layers["cooks"] > self._cooks_cutoff()
        replaced = exceeds.any(axis=0)
        self.var["replaced"] = replaced
        if not replaced.any():
            return

        sub = self.subset_genes(replaced)
        sf_col = self.obs["size_factors"].values[:, None]
        robust_base = trimmed_mean_numpy(sub.X / sf_col, trim=0.2, axis=0)
        imputed = (robust_base[None, :] * sf_col).astype(int)
        swap = replaceable[:, None] & exceeds[:, replaced]
        sub.X = np.where(swap, imputed, sub.X)
        self.counts_to_refit = sub

    # Slots the refit sub-pipeline inherits from the parent fit instead of
    # recomputing (trend curve and dispersion prior: reference
    # pydeseq2/dds.py:1421-1438).
    _REFIT_INHERITED_UNS = (
        "disp_function_type",
        "trend_coeffs",
        "mean_disp",
        "_squared_logres",
        "prior_disp_var",
    )
    # Per-gene results copied back from the sub-fit into the parent.
    _REFIT_RESULT_COLUMNS = (
        "_normed_means",
        "genewise_dispersions",
        "fitted_dispersions",
        "dispersions",
    )

    def _refit_without_outliers(self) -> None:
        """Re-run the pipeline on replaced genes, reusing trend and prior.

        Behavior parity: reference pydeseq2/dds.py:1360-1458. Genes that
        became all-zero after replacement are dropped from the refit and get
        neutral results; the rest go through a sub-:class:`DeseqDataSet`
        running genewise -> MAP -> LFC with the parent's trend curve and
        dispersion prior injected.
        """
        assert self.refit_cooks, (
            "refit was requested but refit_cooks is disabled on this dataset."
        )
        if "replaced" not in self.var:
            self._replace_outliers()

        went_all_zero = (self.counts_to_refit.X == 0).all(axis=0)
        self.new_all_zeroes_genes = self.counts_to_refit.var_names[went_all_zero]

        refitted = self.var["replaced"].values.copy()
        refitted[refitted] = ~went_all_zero
        self.var["refitted"] = refitted

        if went_all_zero.any():
            self.var.loc[self.new_all_zeroes_genes, "_normed_means"] = 0
            self.varm["LFC"].loc[self.new_all_zeroes_genes, :] = 0

        if not refitted.any():
            return

        self.counts_to_refit = self.counts_to_refit.subset_genes(~went_all_zero)
        sub = self._spawn_refit_pipeline(self.counts_to_refit)

        # Merge the sub-fit results back into the parent slots.
        for col in self._REFIT_RESULT_COLUMNS:
            self.var.loc[refitted, col] = sub.var[col].values
        self.varm["LFC"].loc[refitted, :] = sub.varm["LFC"].values

        # Refitted genes no longer count as Cook's outliers in replaceable
        # samples: zero their distances in a dedicated layer.
        masked_cooks = self.layers["cooks"].copy()
        masked_cooks[np.ix_(self.obs["replaceable"].values, np.where(refitted)[0])] = 0.0
        self.layers["replace_cooks"] = masked_cooks

    def _spawn_refit_pipeline(self, subset) -> "DeseqDataSet":
        """Run genewise -> MAP -> LFC on a gene subset with inherited trend/prior."""
        sub = DeseqDataSet(
            counts=pd.DataFrame(
                subset.X, index=subset.obs_names, columns=subset.var_names
            ),
            metadata=self.obs,
            design=self.design,
            min_mu=self.min_mu,
            min_disp=self.min_disp,
            max_disp=self.max_disp,
            refit_cooks=self.refit_cooks,
            min_replicates=self.min_replicates,
            beta_tol=self.beta_tol,
            inference=self.inference,
            quiet=self.quiet,
        )
        sub.obs["size_factors"] = self.obs["size_factors"].values
        sub.layers["normed_counts"] = sub.X / sub.obs["size_factors"].values[:, None]

        sub.fit_genewise_dispersions()

        for key in self._REFIT_INHERITED_UNS:
            if key in self.uns:
                sub.uns[key] = self.uns[key]
        sub.var["_normed_means"] = sub.layers["normed_counts"].mean(0)
        sub.var["fitted_dispersions"] = sub.disp_function(sub.var["_normed_means"])

        sub.fit_MAP_dispersions()
        sub.fit_LFC()
        return sub

    # ------------------------------------------------------------------- VST
    def vst(
        self,
        use_design: bool = False,
        fit_type: Literal["parametric", "mean"] | None = None,
    ) -> None:
        """Variance-stabilizing transform -> ``layers["vst_counts"]``.

        Parity: reference pydeseq2/dds.py:349-382.
        """
        self.vst_fit_type = fit_type if fit_type is not None else self.fit_type
        if not self.quiet:
            print(f"Fit type used for VST : {self.vst_fit_type}")
        self.vst_fit(use_design=use_design)
        self.layers["vst_counts"] = self.vst_transform()

    def vst_fit(self, use_design: bool = False) -> None:
        """Fit the VST (size factors, dispersions, trend).

        Parity: reference pydeseq2/dds.py:384-436 (intercept-design swap when
        ``use_design=False``).
        """
        if "size_factors" not in self.obs or self.logmeans is None:
            self.fit_size_factors(fit_type=self.size_factors_fit_type)

        if not hasattr(self, "vst_fit_type"):
            self.vst_fit_type = self.fit_type

        if use_design:
            if self.vst_fit_type == "parametric":
                self._fit_parametric_dispersion_trend(vst=True)
            else:
                warnings.warn(
                    "use_design=True is only useful when fit_type='parametric'. ",
                    UserWarning,
                    stacklevel=2,
                )
                self.fit_genewise_dispersions(vst=True)
        else:
            with self._intercept_only_design():
                self.fit_genewise_dispersions(vst=True)
                if self.vst_fit_type == "parametric":
                    self._fit_parametric_dispersion_trend(vst=True)

    def vst_transform(self, counts: np.ndarray | None = None) -> np.ndarray:
        """Apply the fitted VST to counts.

        Parity: reference pydeseq2/dds.py:438-514 (parametric closed form /
        mean arcsinh form; external counts use train-fitted logmeans).
        """
        if "size_factors" not in self.obs:
            raise RuntimeError(
                "The vst_fit method should be called prior to vst_transform."
            )
        if counts is None:
            normed_counts = self.layers["normed_counts"]
        else:
            if self.logmeans is None:
                warnings.warn(
                    "The size factors were fitted iteratively. They will be "
                    "re-computed with the counts to be transformed. In a "
                    "train/test setting with a downstream task, this would "
                    "result in a leak of data from test to train set.",
                    UserWarning,
                    stacklevel=2,
                )
                logmeans, filtered_genes = deseq2_norm_fit(counts)
            else:
                logmeans, filtered_genes = self.logmeans, self.filtered_genes
            normed_counts, _ = deseq2_norm_transform(counts, logmeans, filtered_genes)

        if self.vst_fit_type == "parametric":
            if "vst_trend_coeffs" not in self.uns:
                raise RuntimeError("Fit the dispersion curve prior to applying VST.")
            a0, a1 = self.uns["vst_trend_coeffs"]
            return np.log2(
                (
                    1
                    + a1
                    + 2 * a0 * normed_counts
                    + 2 * np.sqrt(a0 * normed_counts * (1 + a1 + a0 * normed_counts))
                )
                / (4 * a0)
            )
        elif self.vst_fit_type == "mean":
            gene_dispersions = self.var["vst_genewise_dispersions"]
            use_for_mean = gene_dispersions > 10 * self.min_disp
            mean_disp = float(
                stats_ops.scipy_style_trim_mean(
                    np.asarray(gene_dispersions[use_for_mean].values),
                    proportiontocut=0.001,
                )
            )
            return (
                2 * np.arcsinh(np.sqrt(mean_disp * normed_counts))
                - np.log(mean_disp)
                - np.log(4)
            ) / np.log(2)
        else:
            raise NotImplementedError(
                f"Found fit_type '{self.vst_fit_type}'. "
                "Expected 'parametric' or 'mean'."
            )

    # -------------------------------------------------------------- internals
    def _fit_MoM_dispersions(self) -> None:
        """Initial dispersions: min(rough OLS, method of moments), clipped.

        Parity: reference pydeseq2/dds.py:1140-1162.
        """
        if "normed_counts" not in self.layers:
            self.fit_size_factors(fit_type=self.size_factors_fit_type)
        normed_counts = self.layers["normed_counts"][:, self.non_zero_idx]
        rde = self.inference.fit_rough_dispersions(
            normed_counts, self.obsm["design_matrix"].values
        )
        mde = self.inference.fit_moments_dispersions(
            normed_counts, self.obs["size_factors"].values
        )
        alpha_hat = np.minimum(rde, mde)
        self.var["_MoM_dispersions"] = np.full(self.n_vars, np.nan)
        self.var.loc[self.var["non_zero"], "_MoM_dispersions"] = np.clip(
            alpha_hat, self.min_disp, self.max_disp
        )

    def _fit_parametric_dispersion_trend(self, vst: bool = False):
        """Iterated gamma-GLM fit of alpha(mu) = a1/mu + a0.

        Behavior parity: reference pydeseq2/dds.py:1199-1275. Alternates
        gamma-GLM fits with exclusion of genes whose dispersion is far off
        the fitted curve (ratio < 1e-4 or >= 15) until successive
        coefficient vectors agree to 1e-6 in squared log-distance; falls
        back to the mean trend when a fit fails or degenerates.
        """
        disp_col = "vst_genewise_dispersions" if vst else "genewise_dispersions"
        if disp_col not in self.var:
            self.fit_genewise_dispersions(vst)

        alphas = self.var.loc[self.non_zero_genes, disp_col].values
        means = self.var.loc[self.non_zero_genes, "_normed_means"].values
        with np.errstate(divide="ignore"):
            inv_means = 1.0 / means
        usable = np.isfinite(inv_means) & ~np.isnan(alphas)
        alphas, inv_means = alphas[usable], inv_means[usable]

        coeffs = np.array([1.0, 1.0])  # drift sentinel, matching the reference
        while True:
            fitted, predictions, glm_ok = self.inference.dispersion_trend_gamma_glm(
                pd.Series(inv_means), pd.Series(alphas)
            )
            fitted = np.asarray(fitted, dtype=float)
            if not glm_ok or (fitted <= 1e-10).any():
                warnings.warn(
                    "The dispersion trend curve fitting did not converge. "
                    "Switching to a mean-based dispersion trend.",
                    UserWarning,
                    stacklevel=2,
                )
                self._fit_mean_dispersion_trend(vst)
                return
            drift = float(np.sum(np.log(np.abs(fitted / coeffs)) ** 2))
            coeffs = fitted

            ratio = alphas / np.asarray(predictions)
            on_curve = (ratio >= 1e-4) & (ratio < 15)
            alphas, inv_means = alphas[on_curve], inv_means[on_curve]
            if drift < 1e-6:
                break

        key = "vst_trend_coeffs" if vst else "trend_coeffs"
        self.uns[key] = pd.Series(coeffs, index=["a0", "a1"])
        if not vst:
            self.uns["disp_function_type"] = "parametric"
            self.var["fitted_dispersions"] = np.full(self.n_vars, np.nan)
            self.var.loc[self.var["non_zero"], "fitted_dispersions"] = (
                self.disp_function(
                    self.var.loc[self.var["non_zero"], "_normed_means"]
                )
            )

    def _fit_mean_dispersion_trend(self, vst: bool = False):
        """Trimmed-mean trend curve. Parity: reference pydeseq2/dds.py:1277-1299."""
        disp_param_name = "vst_genewise_dispersions" if vst else "genewise_dispersions"
        sel = self.var[disp_param_name] > 10 * self.min_disp
        self.uns["mean_disp"] = float(
            stats_ops.scipy_style_trim_mean(
                self.var.loc[sel, disp_param_name].values, proportiontocut=0.001
            )
        )
        if vst:
            self.vst_fit_type = "mean"
        else:
            self.uns["disp_function_type"] = "mean"
        self.var["fitted_dispersions"] = np.full(self.n_vars, self.uns["mean_disp"])

    @contextmanager
    def _intercept_only_design(self):
        """Temporarily swap the design matrix for an intercept-only column.

        Used by blind VST and the iterative size-factor estimator (reference
        pydeseq2/dds.py:424-436,1478-1484 use an explicit buffer variable).
        """
        saved = self.obsm["design_matrix"]
        self.obsm["design_matrix"] = pd.DataFrame(
            1, index=self.obs_names, columns=["Intercept"]
        )
        try:
            yield
        finally:
            self.obsm["design_matrix"] = saved

    def _fit_iterate_size_factors(
        self,
        niter: int = 10,
        quant: float = 0.95,
        method: Literal["powell", "device"] | None = None,
    ) -> None:
        """Trimmed-likelihood MLE size factors for zero-rich datasets.

        Behavior parity: reference pydeseq2/dds.py:1460-1548. Alternates (a)
        an intercept-only dispersion fit at the current size factors with (b)
        a search over per-sample log size factors minimising the NB
        likelihood of the best ``quant``-fraction of genes, until the
        log-size-factor update is small.

        ``method`` selects the inner optimizer: ``"powell"`` is the
        reference's scipy Powell over the full N-dimensional log-size-factor
        vector (exact parity, but O(N^2) objective sweeps — it walls around
        a few hundred samples); ``"device"`` is the batched per-sample
        Newton solver (:func:`pydeseq2_tpu.ops.sizefactors.trimmed_sf_newton`)
        that exploits the per-sample separability of the trimmed objective —
        the scalable route for atlas-sized cohorts. Default (None): powell
        up to 500 samples, device beyond.
        """
        from scipy.optimize import minimize

        if method is None:
            method = "powell" if self.n_obs <= 500 else "device"

        self.obs["size_factors"] = np.ones(self.n_obs)
        self.layers["normed_counts"] = self.X.astype(float)

        with self._intercept_only_design():
            for it in range(niter):
                self.fit_genewise_dispersions()
                informative = (
                    self.var["genewise_dispersions"] > 10 * self.min_disp
                ) & self.var["non_zero"]
                if not informative.any():
                    print(
                        "No genes have a dispersion above 10 * min_disp in "
                        "_fit_iterate_size_factors.",
                        file=sys.stderr,
                    )
                    break
                self.var["fitted_dispersions"] = np.full(
                    self.n_vars,
                    float(
                        stats_ops.scipy_style_trim_mean(
                            self.var.loc[informative, "genewise_dispersions"].values,
                            proportiontocut=0.001,
                        )
                    ),
                )
                self.fit_dispersion_prior()
                self.fit_MAP_dispersions()

                # Size-factor-free baseline means: mu_hat was fitted under the
                # current size factors, so divide them back out once and let
                # the optimizer rescale per candidate.
                log_sf0 = np.log(self.obs["size_factors"].values)
                nz = self.var["non_zero"].values
                counts_nz = self.X[:, nz]
                base_mu = (
                    self.layers["_mu_hat"][:, nz] * np.exp(-log_sf0)[:, None]
                )
                disp_nz = self.var.loc[nz, "dispersions"].values

                if method == "device":
                    import jax.numpy as jnp

                    from pydeseq2_tpu.ops.sizefactors import trimmed_sf_newton

                    fitted = np.asarray(
                        trimmed_sf_newton(
                            jnp.asarray(counts_nz.T),
                            jnp.asarray(base_mu.T),
                            jnp.asarray(disp_nz),
                            jnp.asarray(log_sf0),
                            quant=quant,
                        )
                    )
                    log_sf = fitted - fitted.mean()
                    self.obs["size_factors"] = np.exp(log_sf)
                else:

                    def trimmed_nll(log_sf: np.ndarray) -> float:
                        sf = np.exp(log_sf - log_sf.mean())
                        per_gene = nb_nll_numpy(
                            counts_nz, base_mu * sf[:, None], disp_nz
                        )
                        keep = per_gene < np.quantile(per_gene, quant)
                        return float(per_gene[keep].sum())

                    best = minimize(trimmed_nll, log_sf0, method="Powell")
                    log_sf = best.x - best.x.mean()
                    self.obs["size_factors"] = np.exp(log_sf)

                    if not best.success:
                        print(
                            "A size factor fitting iteration failed.",
                            file=sys.stderr,
                        )
                        break
                if it > 1 and np.sum((log_sf0 - log_sf) ** 2) < 1e-4:
                    break
                if it == niter - 1:
                    print(
                        "Iterative size factor fitting did not converge.",
                        file=sys.stderr,
                    )

        self.layers["normed_counts"] = (
            self.X / self.obs["size_factors"].values[:, None]
        )

    def _check_full_rank_design(self):
        """Warn if the design matrix is rank-deficient.

        Parity: reference pydeseq2/dds.py:1550-1563.
        """
        rank = np.linalg.matrix_rank(self.obsm["design_matrix"].values)
        num_vars = self.obsm["design_matrix"].shape[1]
        if rank < num_vars:
            warnings.warn(
                "The design matrix is not full rank, so the model cannot be "
                "fitted, but some operations like design-free VST remain "
                "possible. To perform differential expression analysis, "
                "please remove the design variables that are linear "
                "combinations of others.",
                UserWarning,
                stacklevel=2,
            )

    # ---------------------------------------------------------------- export
    def to_picklable_anndata(self):
        """Export to a plain AnnData object (drops non-picklable state).

        Parity: reference pydeseq2/dds.py:1112-1138.
        """
        return self.to_anndata()

    def plot_dispersions(self, log: bool = True, save_path=None, **kwargs) -> None:
        """Scatter plot of genewise/final/fitted dispersions.

        Parity: reference pydeseq2/dds.py:1164-1197.
        """
        from pydeseq2_tpu.utils.plots import make_scatter

        disps = [
            self.var["genewise_dispersions"],
            self.var["dispersions"],
            self.var["fitted_dispersions"],
        ]
        make_scatter(
            disps,
            legend_labels=["Estimated", "Final", "Fitted"],
            x_val=self.var["_normed_means"],
            log=log,
            save_path=save_path,
            **kwargs,
        )
