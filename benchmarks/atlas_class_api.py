"""Atlas-scale class API demonstration: 10,000 x 60,000 with DEFAULT args.

The round-4 verdict flagged that the staged class API (`DeseqDataSet` /
`DeseqStats`) needed manual knobs (gene_batch_size, dtype) to survive atlas
scale. With the HBM-budgeted auto chunking in `JaxInference` and
compute-dtype mu/hat buffers, the DEFAULT construction must complete
`deseq2()` + `summary()` + `lfc_shrink()` at 10,000 samples x 60,000 genes
on one chip.

Writes ATLAS_CLASS_API.json with per-stage walls and sanity stats.

Usage: PYDESEQ2_TPU_NO_X64=1 python benchmarks/atlas_class_api.py [N] [G]
(plain `python` = axon TPU; defaults 10000 60000)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("PYDESEQ2_TPU_NO_X64", "1")

import numpy as np
import pandas as pd

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from benchmarks.scale_runs import make_data_chunked  # noqa: E402


def main() -> None:
    import jax

    from pydeseq2_tpu import DeseqDataSet, DeseqStats

    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_genes = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000

    t0 = time.perf_counter()
    counts_gm, X = make_data_chunked(n_samples, n_genes)
    gen_s = time.perf_counter() - t0
    counts = pd.DataFrame(
        counts_gm.T.astype(np.int32),
        index=[f"s{i}" for i in range(n_samples)],
        columns=[f"g{j}" for j in range(n_genes)],
    )
    del counts_gm
    metadata = pd.DataFrame(
        {"condition": np.where(X[:, 1] > 0, "B", "A")}, index=counts.index
    )

    out: dict = {
        "config": f"{n_samples}x{n_genes}",
        "device": str(jax.devices()[0]),
        "dtype": "float32",
        "data_gen_s": round(gen_s, 1),
        "defaults": "DeseqDataSet/DeseqStats with default arguments "
        "(refit_cooks default True; JaxInference auto gene batch)",
    }

    t0 = time.perf_counter()
    dds = DeseqDataSet(
        counts=counts, metadata=metadata, design="~condition", quiet=True
    )
    out["construct_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    dds.deseq2()
    out["deseq2_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    out["summary_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    ds.lfc_shrink(coeff="condition[T.B]")
    out["lfc_shrink_s"] = round(time.perf_counter() - t0, 1)

    res = ds.results_df
    out["pvalue_finite_frac"] = round(float(res.pvalue.notna().mean()), 5)
    out["padj_finite_frac"] = round(float(res.padj.notna().mean()), 5)
    out["shrunk_lfc_finite_frac"] = round(
        float(np.isfinite(res.log2FoldChange).mean()), 5
    )
    out["replaced_frac"] = round(float(dds.var["replaced"].mean()), 5)
    out["gene_batch_auto"] = dds.inference._auto_batch(n_genes, n_samples)
    out["total_s"] = round(
        out["construct_s"] + out["deseq2_s"] + out["summary_s"] + out["lfc_shrink_s"],
        1,
    )

    path = Path(os.environ.get("ATLAS_OUT", str(ROOT / "ATLAS_CLASS_API.json")))
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
