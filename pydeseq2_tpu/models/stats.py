"""DeseqStats: Wald tests, filtering, BH adjustment, apeGLM shrinkage.

Parity target (reference, owkin/PyDESeq2): pydeseq2/ds.py:19-601. Heavy math
(Wald tests over all genes, the 50 BH passes of independent filtering, the
apeGLM MAP fits) runs as batched device kernels; pandas only labels results.
"""

from __future__ import annotations

import sys
import time
import warnings
from typing import Literal

import numpy as np
import pandas as pd

from pydeseq2_tpu.inference import Inference
from pydeseq2_tpu.jax_inference import JaxInference
from pydeseq2_tpu.models.dataset import DeseqDataSet
from pydeseq2_tpu.ops import stats as stats_ops


class DeseqStats:
    """Differential-expression statistics on a fitted :class:`DeseqDataSet`.

    Parameters mirror the reference class (pydeseq2/ds.py:131-146).
    """

    def __init__(
        self,
        dds: DeseqDataSet,
        contrast,
        alpha: float = 0.05,
        cooks_filter: bool = True,
        independent_filter: bool = True,
        prior_LFC_var: np.ndarray | None = None,
        lfc_null: float = 0.0,
        alt_hypothesis: (
            Literal["greaterAbs", "lessAbs", "greater", "less"] | None
        ) = None,
        inference: Inference | None = None,
        quiet: bool = False,
        n_cpus: int | None = None,
    ) -> None:
        assert "LFC" in dds.varm, (
            "Please provide a fitted DeseqDataSet by first running the "
            "`deseq2` method."
        )

        self.dds = dds
        self.alpha = alpha
        self.cooks_filter = cooks_filter
        self.independent_filter = independent_filter
        self.base_mean = self.dds.var["_normed_means"].copy()
        self.prior_LFC_var = prior_LFC_var

        if lfc_null < 0 and alt_hypothesis in {"greaterAbs", "lessAbs"}:
            raise ValueError(
                f"The alternative hypothesis being {alt_hypothesis}, please "
                f"provide a positive lfc_null value (got {lfc_null}).",
            )
        self.lfc_null = lfc_null
        self.alt_hypothesis = alt_hypothesis

        self.design_matrix = self.dds.obsm["design_matrix"].copy()
        self.LFC = self.dds.varm["LFC"].copy()

        if contrast is None:
            raise ValueError(
                'Default contrasts are no longer supported. The "contrast" '
                "argument must be provided."
            )
        elif isinstance(contrast, np.ndarray):
            if contrast.shape[0] != self.dds.obsm["design_matrix"].shape[1]:
                raise ValueError(
                    "The contrast vector must have the same length as the "
                    "design matrix."
                )
            self.contrast = contrast
            self.contrast_vector = contrast
        else:
            self.contrast = contrast
            self._build_contrast_vector()

        self.shrunk_LFCs = False
        self.quiet = quiet
        self.inference = inference or JaxInference()

        if self.dds.refit_cooks and "replaced" not in self.dds.var:
            raise AttributeError(
                "dds has 'refit_cooks' set to True but Cooks outliers have "
                "not been refitted. Please run 'dds.refit()' first or set "
                "'dds.refit_cooks' to False."
            )

    @property
    def variables(self):
        """Names of the variables in the model definition."""
        return self.dds.variables

    # ----------------------------------------------------------------- summary
    def summary(self, **kwargs) -> None:
        """Run the statistical analysis; results land in ``results_df``.

        Parity: reference pydeseq2/ds.py:223-301.
        """
        new_lfc_null = kwargs.get("lfc_null", "default")
        new_alt_hypothesis = kwargs.get("alt_hypothesis", "default")

        rerun_summary = False
        lfc_null = self.lfc_null if new_lfc_null == "default" else new_lfc_null
        alt_hypothesis = (
            self.alt_hypothesis
            if new_alt_hypothesis == "default"
            else new_alt_hypothesis
        )
        if lfc_null < 0 and alt_hypothesis in {"greaterAbs", "lessAbs"}:
            raise ValueError(
                f"The alternative hypothesis being {alt_hypothesis}, please "
                f"provide a positive lfc_null value (got {lfc_null}).",
            )

        if (
            not hasattr(self, "p_values")
            or self.lfc_null != lfc_null
            or self.alt_hypothesis != alt_hypothesis
        ):
            self.lfc_null = lfc_null
            self.alt_hypothesis = alt_hypothesis
            rerun_summary = True
            self.run_wald_test()

        if self.cooks_filter:
            self._cooks_filtering()

        if not hasattr(self, "padj") or rerun_summary:
            if self.independent_filter:
                self._independent_filtering()
            else:
                self._p_value_adjustment()

        self.results_df = pd.DataFrame(index=self.dds.var_names)
        self.results_df["baseMean"] = self.base_mean
        self.results_df["log2FoldChange"] = (
            self.LFC @ self.contrast_vector / np.log(2)
        )
        self.results_df["lfcSE"] = self.SE / np.log(2)
        self.results_df["stat"] = self.statistics
        self.results_df["pvalue"] = self.p_values
        self.results_df["padj"] = self.padj

        if not self.quiet:
            if isinstance(self.contrast, np.ndarray):
                print(
                    f"Log2 fold change & Wald test p-value, contrast vector: "
                    f"{self.contrast}"
                )
            else:
                print(
                    f"Log2 fold change & Wald test p-value: "
                    f"{self.contrast[0]} {self.contrast[1]} vs {self.contrast[2]}"
                )
            print(self.results_df)

    def run_wald_test(self) -> None:
        """Batched Wald tests for all genes.

        Parity: reference pydeseq2/ds.py:303-360.
        """
        num_vars = self.design_matrix.shape[1]
        if self.shrunk_LFCs and not self.quiet:
            print(
                "Note: running Wald test on shrunk LFCs. Some sequencing "
                "datasets show better performance with the testing separated "
                "from the use of the LFC prior.",
                file=sys.stderr,
            )

        mu = (
            np.exp(self.design_matrix @ self.LFC.T)
            .multiply(self.dds.obs["size_factors"], 0)
            .values
        )

        if self.prior_LFC_var is not None:
            ridge_factor = np.diag(1 / self.prior_LFC_var**2)
        else:
            ridge_factor = np.diag(np.repeat(1e-6, num_vars))

        if not self.quiet:
            print("Running Wald tests...", file=sys.stderr)
        start = time.time()
        pvals, stats, se = self.inference.wald_test(
            design_matrix=self.design_matrix.values,
            disp=self.dds.var["dispersions"].values,
            lfc=self.LFC.values,
            mu=mu,
            ridge_factor=ridge_factor,
            contrast=self.contrast_vector,
            lfc_null=np.log(2) * self.lfc_null,  # log2 -> natural log
            alt_hypothesis=self.alt_hypothesis,
        )
        if not self.quiet:
            print(f"... done in {time.time() - start:.2f} seconds.\n", file=sys.stderr)

        self.p_values = pd.Series(pvals, index=self.dds.var_names)
        self.statistics = pd.Series(stats, index=self.dds.var_names)
        self.SE = pd.Series(se, index=self.dds.var_names)

        # All-zero genes after outlier replacement get neutral statistics
        # (reference pydeseq2/ds.py:356-360).
        if self.dds.refit_cooks and self.dds.var["replaced"].sum() > 0:
            self.SE.loc[self.dds.new_all_zeroes_genes] = 0.0
            self.statistics.loc[self.dds.new_all_zeroes_genes] = 0.0
            self.p_values.loc[self.dds.new_all_zeroes_genes] = 1.0

    # ------------------------------------------------------------- shrinkage
    def lfc_shrink(self, coeff: str, adapt: bool = True) -> None:
        """apeGLM LFC shrinkage of one coefficient (batched MAP fits).

        Parity: reference pydeseq2/ds.py:363-447.
        """
        if coeff not in self.LFC.columns:
            raise KeyError(
                f"The coeff argument '{coeff}' should be one the LFC columns. "
                f"The available LFC coeffs are {self.LFC.columns[1:]}."
            )
        coeff_idx = self.LFC.columns.get_loc(coeff)

        size = 1.0 / self.dds.var["dispersions"].values
        offset = np.log(self.dds.obs["size_factors"].values)

        prior_no_shrink_scale = 15
        prior_scale = 1
        if adapt:
            prior_var = self._fit_prior_var(coeff_idx=coeff_idx)
            prior_scale = np.minimum(np.sqrt(prior_var), 1)

        if not self.quiet:
            print("Fitting MAP LFCs...", file=sys.stderr)
        start = time.time()
        lfcs, inv_hessians, converged = self.inference.lfc_shrink_nbinom_glm(
            design_matrix=self.design_matrix.values,
            counts=self.dds.X[:, self.dds.non_zero_idx],
            size=size[self.dds.non_zero_idx],
            offset=offset,
            prior_no_shrink_scale=prior_no_shrink_scale,
            prior_scale=prior_scale,
            optimizer="L-BFGS-B",
            shrink_index=coeff_idx,
        )
        if not self.quiet:
            print(f"... done in {time.time() - start:.2f} seconds.\n", file=sys.stderr)

        # Pandas copy-on-write makes chained .iloc[...].update() a no-op, so
        # rebuild the column explicitly.
        col = self.LFC.columns[coeff_idx]
        updated = self.LFC[col].copy()
        updated.update(
            pd.Series(np.array(lfcs)[:, coeff_idx], index=self.dds.non_zero_genes)
        )
        self.LFC[col] = updated
        se = self.SE.copy()
        se.update(
            pd.Series(
                np.sqrt(np.abs(inv_hessians[:, coeff_idx, coeff_idx])),
                index=self.dds.non_zero_genes,
            )
        )
        self.SE = se
        self._LFC_shrink_converged = pd.Series(np.nan, index=self.dds.var_names)
        self._LFC_shrink_converged.update(
            pd.Series(converged.astype(float), index=self.dds.non_zero_genes)
        )
        self.shrunk_LFCs = True

        if hasattr(self, "results_df"):
            self.results_df["log2FoldChange"] = (
                self.LFC.iloc[:, coeff_idx] / np.log(2)
            )
            self.results_df["lfcSE"] = self.SE / np.log(2)
            if not self.quiet:
                print(f"Shrunk log2 fold change & Wald test p-value: {coeff}")
                print(self.results_df)

    # ------------------------------------------------------------- filtering
    def _independent_filtering(self) -> None:
        """Adjusted p-values via independent filtering over 50 base-mean
        cutoffs, all BH passes in one batched device program.

        Parity: reference pydeseq2/ds.py:486-527.
        """
        if not hasattr(self, "p_values"):
            self.run_wald_test()

        lower_quantile = np.mean(self.base_mean == 0)
        upper_quantile = 0.95 if lower_quantile < 0.95 else 1
        theta = np.linspace(lower_quantile, upper_quantile, 50)
        cutoffs = np.quantile(self.base_mean, theta)

        p = self.p_values.values
        valid = ~np.isnan(p)
        base = self.base_mean.values
        masks = (base[None, :] >= cutoffs[:, None]) & valid[None, :]  # (50, G)

        adj = np.asarray(
            stats_ops.bh_adjust_masked(
                np.broadcast_to(np.nan_to_num(p, nan=1.0), masks.shape), masks
            )
        )  # (50, G), NaN outside masks

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            num_rej = np.nansum(adj < self.alpha, axis=1).astype(int)
        lowess_res = stats_ops.lowess(theta, num_rej, frac=1 / 5)

        if num_rej.max() <= 10:
            j = 0
        else:
            residual = num_rej[num_rej > 0] - lowess_res[num_rej > 0]
            thresh = lowess_res.max() - np.sqrt(np.mean(residual**2))
            if np.any(num_rej > thresh):
                j = np.where(num_rej > thresh)[0][0]
            else:
                j = 0

        self.padj = pd.Series(adj[j], index=self.dds.var_names)

    def _p_value_adjustment(self) -> None:
        """Plain BH adjustment (no independent filtering).

        Parity: reference pydeseq2/ds.py:529-542.
        """
        if not hasattr(self, "p_values"):
            self.run_wald_test()
        p = self.p_values.values
        valid = ~np.isnan(p)
        adj = np.asarray(
            stats_ops.bh_adjust_masked(np.nan_to_num(p, nan=1.0), valid)
        )
        self.padj = pd.Series(adj, index=self.dds.var_names)

    def _cooks_filtering(self) -> None:
        """NaN out p-values of Cook's outlier genes.

        Parity: reference pydeseq2/ds.py:544-550.
        """
        if not hasattr(self, "p_values"):
            self.run_wald_test()
        self.p_values[self.dds.cooks_outlier()] = np.nan

    def _fit_prior_var(
        self, coeff_idx, min_var: float = 1e-6, max_var: float = 400.0
    ) -> float:
        """apeGLM prior variance by root finding.

        Parity: reference pydeseq2/ds.py:552-588 (host scalar root_scalar).
        """
        from scipy.optimize import root_scalar

        keep = ~self.LFC.iloc[:, coeff_idx].isna()
        S = self.LFC[keep].iloc[:, coeff_idx] ** 2
        D = self.SE[keep] ** 2

        def objective(a: float) -> float:
            coeff = 1 / (2 * (a + D) ** 2)
            return ((S - D) * coeff).sum() / coeff.sum() - a

        if objective(min_var) < 0:
            return min_var
        return root_scalar(objective, bracket=(min_var, max_var)).root

    def _build_contrast_vector(self) -> None:
        """Contrast vector from ['variable', 'tested', 'ref'] triplets.

        Parity: reference pydeseq2/ds.py:590-601.
        """
        factor, alternative, ref = self.contrast
        self.contrast_vector = self.dds.contrast(
            column=factor, baseline=ref, group_to_compare=alternative
        )

    def plot_MA(self, log: bool = True, save_path: str | None = None, **kwargs):
        """MA plot of the results. Parity: reference pydeseq2/ds.py:449-484."""
        if not hasattr(self, "results_df"):
            raise AttributeError(
                "Trying to make an MA plot but p-values were not computed "
                "yet. Please run the summary() method first."
            )
        from pydeseq2_tpu.utils.plots import make_MA_plot

        make_MA_plot(
            self.results_df,
            padj_thresh=self.alpha,
            log=log,
            save_path=save_path,
            lfc_null=self.lfc_null,
            alt_hypothesis=self.alt_hypothesis,
            **kwargs,
        )
