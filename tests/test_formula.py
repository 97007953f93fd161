"""Design-formula materializer: columns, coding, contrasts, interactions.

Parity target: the formulaic/formulaic-contrasts behavior the reference
relies on (reference pydeseq2/dds.py:296-302, pydeseq2/ds.py:590-601).
"""

import numpy as np
import pandas as pd
import pytest

from pydeseq2_tpu.formula import DesignMatrix


@pytest.fixture
def meta():
    return pd.DataFrame(
        {
            "condition": ["A", "B", "A", "B", "A", "B"],
            "group": ["X", "X", "Y", "Y", "X", "Y"],
            "dose": [0.0, 1.0, 2.0, 3.0, 4.0, 5.0],
        },
        index=[f"s{i}" for i in range(6)],
    )


def test_single_factor_columns(meta):
    dm = DesignMatrix(meta, "~condition")
    assert list(dm.matrix.columns) == ["Intercept", "condition[T.B]"]
    np.testing.assert_array_equal(
        dm.matrix["condition[T.B]"].values, [0, 1, 0, 1, 0, 1]
    )


def test_two_factor_columns(meta):
    dm = DesignMatrix(meta, "~group + condition")
    assert list(dm.matrix.columns) == [
        "Intercept",
        "group[T.Y]",
        "condition[T.B]",
    ]


def test_continuous_passthrough(meta):
    dm = DesignMatrix(meta, "~condition + dose")
    assert "dose" in dm.matrix.columns
    np.testing.assert_array_equal(dm.matrix["dose"].values, meta["dose"].values)


def test_interaction_columns(meta):
    dm = DesignMatrix(meta, "~group + condition + group:condition")
    assert list(dm.matrix.columns) == [
        "Intercept",
        "group[T.Y]",
        "condition[T.B]",
        "group[T.Y]:condition[T.B]",
    ]
    expected = (meta["group"] == "Y") & (meta["condition"] == "B")
    np.testing.assert_array_equal(
        dm.matrix["group[T.Y]:condition[T.B]"].values,
        expected.to_numpy().astype(float),
    )


def test_star_expansion_matches_explicit(meta):
    a = DesignMatrix(meta, "~group * condition")
    b = DesignMatrix(meta, "~group + condition + group:condition")
    assert list(a.matrix.columns) == list(b.matrix.columns)
    np.testing.assert_array_equal(a.matrix.values, b.matrix.values)


def test_no_intercept(meta):
    dm = DesignMatrix(meta, "~0 + condition")
    assert "Intercept" not in dm.matrix.columns


def test_c_operator_casts_numeric(meta):
    dm = DesignMatrix(meta, "~C(dose)")
    # 6 distinct doses -> 5 treatment columns against the first level
    assert dm.matrix.shape[1] == 6  # Intercept + 5
    assert all(c.startswith("C(dose)[T.") for c in dm.matrix.columns[1:])


def test_contrast_vector_interaction_design(meta):
    dm = DesignMatrix(meta, "~group * condition")
    vec = dm.contrast("condition", "A", "B")
    # At the reference level of group (X), the interaction column stays 0:
    # contrast isolates condition[T.B].
    expected = np.zeros(dm.matrix.shape[1])
    expected[list(dm.matrix.columns).index("condition[T.B]")] = 1.0
    np.testing.assert_array_equal(vec, expected)


def test_cond_row(meta):
    dm = DesignMatrix(meta, "~group + condition")
    row = dm.cond(group="Y", condition="B")
    np.testing.assert_array_equal(row, [1.0, 1.0, 1.0])
    row = dm.cond()
    np.testing.assert_array_equal(row, [1.0, 0.0, 0.0])


def test_interaction_pipeline_runs(counts_df, metadata):
    """Full pipeline on an interaction design (reference: any formulaic
    formula is accepted, pydeseq2/dds.py:296-302)."""
    from pydeseq2_tpu import DeseqDataSet, DeseqStats

    dds = DeseqDataSet(
        counts=counts_df,
        metadata=metadata,
        design="~group * condition",
        refit_cooks=False,
        quiet=True,
    )
    dds.deseq2()
    ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
    ds.summary()
    res = ds.results_df
    assert res["pvalue"].notna().any()
    assert np.isfinite(res["log2FoldChange"].dropna()).all()
