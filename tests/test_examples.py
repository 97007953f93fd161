"""Smoke-run the gallery examples (the de-facto API spec, SURVEY.md L5).

Mirrors the reference's sphinx-gallery scripts being executable docs:
examples must run end-to-end against the current API.
"""

import os
import runpy
import sys
from pathlib import Path

import matplotlib
import pytest

matplotlib.use("Agg")  # no display in CI

EXAMPLES = sorted(
    (Path(__file__).resolve().parent.parent / "examples").glob("*.py")
)


@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(script, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # any outputs land in tmp
    monkeypatch.setattr(sys, "argv", [str(script)])
    runpy.run_path(str(script), run_name="__main__")


def test_plot_dispersions_smoke(counts_df, metadata, tmp_path):
    """plot_dispersions writes a figure (reference pydeseq2/dds.py:1164-1197)."""
    from pydeseq2_tpu import DeseqDataSet

    dds = DeseqDataSet(
        counts=counts_df, metadata=metadata, design="~condition", quiet=True
    )
    dds.deseq2()
    out = tmp_path / "disp.png"
    dds.plot_dispersions(save_path=str(out))
    assert out.exists() and out.stat().st_size > 0
