"""Measure the reference PyDESeq2 CPU wall-clock on a synthetic config.

The reference's AnnData dependency is not installed in this image, so this
driver replays the reference's deseq2() stage sequence (see reference
pydeseq2/dds.py:516-562) directly on top of the reference's own
DefaultInference joblib pool and kernel functions - i.e. it measures the
reference's actual compute path (which dominates its runtime) without the
AnnData bookkeeping. This makes the baseline slightly FASTER than real
PyDESeq2, i.e. conservative for our speedup claims.

Usage: python benchmarks/reference_baseline.py [n_samples] [n_genes]
Writes/updates BASELINE_MEASURED.json at the repo root.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

# Make the read-only reference importable (it resolves its version via
# importlib.metadata): a minimal dist-info shim lives in .bench_shim, and
# PYTHONPATH propagates both paths into joblib's worker processes.
import os

_repo = str(Path(__file__).resolve().parent.parent)
_paths = ["/root/reference", os.path.join(_repo, ".bench_shim")]
for _p in _paths:
    if _p not in sys.path:
        sys.path.insert(0, _p)
os.environ["PYTHONPATH"] = os.pathsep.join(
    _paths + [os.environ.get("PYTHONPATH", "")]
).rstrip(os.pathsep)

from pydeseq2.default_inference import DefaultInference  # noqa: E402
from pydeseq2.preprocessing import deseq2_norm  # noqa: E402
from pydeseq2.utils import (  # noqa: E402
    fit_rough_dispersions,
    fit_moments_dispersions,
    mean_absolute_deviation,
)


def make_data(n_samples: int, n_genes: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    base = rng.lognormal(3.0, 1.5, size=n_genes)
    lfc = rng.normal(0, 0.5, size=n_genes)
    cond = rng.integers(0, 2, n_samples)
    X = np.column_stack([np.ones(n_samples), cond]).astype(float)
    mu = base[None, :] * np.exp(cond[:, None] * lfc[None, :])
    disp = np.clip(rng.lognormal(-2.0, 1.0, size=n_genes), 1e-3, 5.0)
    counts = rng.negative_binomial(1 / disp[None, :], 1 / (1 + disp[None, :] * mu))
    return counts.astype(float), X


def run_reference_pipeline(counts: np.ndarray, design: np.ndarray) -> dict:
    """Reference stage sequence on the joblib backend; returns timings."""
    import pandas as pd

    inference = DefaultInference()
    n, g = counts.shape
    t = {}

    t0 = time.perf_counter()
    normed, size_factors = deseq2_norm(counts)
    t["size_factors"] = time.perf_counter() - t0

    design_df = pd.DataFrame(design, columns=["Intercept", "condition"])

    t0 = time.perf_counter()
    rde = fit_rough_dispersions(normed, design_df)
    mde = fit_moments_dispersions(normed, size_factors)
    mom = np.clip(np.minimum(rde, mde), 1e-8, max(10, n))
    t["mom"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    mu_hat = inference.lin_reg_mu(
        counts=counts, size_factors=size_factors, design_matrix=design, min_mu=0.5
    )
    t["mu_init"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    genewise, _ = inference.alpha_mle(
        counts=counts,
        design_matrix=design,
        mu=mu_hat,
        alpha_hat=mom,
        min_disp=1e-8,
        max_disp=max(10, n),
    )
    t["genewise_disp"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    covariates = pd.Series(1 / normed.mean(0))
    targets = pd.Series(genewise)
    coeffs, preds, ok = inference.dispersion_trend_gamma_glm(covariates, targets)
    fitted = np.maximum(coeffs[0] + coeffs[1] / normed.mean(0), 1e-8)
    resid = np.log(genewise) - np.log(fitted)
    from scipy.special import polygamma

    sq_logres = mean_absolute_deviation(resid[genewise >= 1e-6]) ** 2
    prior_disp_var = max(sq_logres - polygamma(1, (n - 2) / 2), 0.25)
    t["trend_prior"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    map_disp, _ = inference.alpha_mle(
        counts=counts,
        design_matrix=design,
        mu=mu_hat,
        alpha_hat=fitted,
        min_disp=1e-8,
        max_disp=max(10, n),
        prior_disp_var=prior_disp_var,
        cr_reg=True,
        prior_reg=True,
    )
    t["map_disp"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    lfcs, mu_lfc, hat_diag, _ = inference.irls(
        counts=counts,
        size_factors=size_factors,
        design_matrix=design,
        disp=np.clip(map_disp, 1e-8, max(10, n)),
        min_mu=0.5,
        beta_tol=1e-8,
    )
    t["irls"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ridge = np.diag(np.repeat(1e-6, design.shape[1]))
    contrast = np.zeros(design.shape[1])
    contrast[-1] = 1
    pvals, stats, se = inference.wald_test(
        design_matrix=design,
        disp=np.clip(map_disp, 1e-8, max(10, n)),
        lfc=lfcs,
        mu=mu_lfc,
        ridge_factor=ridge,
        contrast=contrast,
        lfc_null=0.0,
        alt_hypothesis=None,
    )
    t["wald"] = time.perf_counter() - t0

    t["total"] = sum(t.values())
    return t


def main():
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_genes = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    counts, design = make_data(n_samples, n_genes)
    timings = run_reference_pipeline(counts, design)
    key = f"{n_samples}x{n_genes}"
    out_path = Path(__file__).resolve().parent.parent / "BASELINE_MEASURED.json"
    data = json.loads(out_path.read_text()) if out_path.exists() else {}
    data[key] = {
        "wall_s": timings["total"],
        "genes_per_s": n_genes / timings["total"],
        "stages": timings,
        "backend": "reference joblib (pydeseq2 DefaultInference, all cores)",
    }
    out_path.write_text(json.dumps(data, indent=2))
    print(json.dumps({key: timings}))


if __name__ == "__main__":
    main()
