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


@pytest.fixture
def meta3(meta):
    m = meta.copy()
    m["batch"] = ["u", "u", "u", "v", "v", "v"]
    return m


def test_three_way_star_expansion(meta3):
    """a*b*c must expand to ALL main effects + pairwise + triple interactions,
    ordered by degree — formulaic's column set for the reference's designs
    (reference pydeseq2/dds.py:296-302 delegates to formulaic)."""
    dm = DesignMatrix(meta3, "~group * condition * batch")
    assert list(dm.matrix.columns) == [
        "Intercept",
        "group[T.Y]",
        "condition[T.B]",
        "batch[T.v]",
        "group[T.Y]:condition[T.B]",
        "group[T.Y]:batch[T.v]",
        "condition[T.B]:batch[T.v]",
        "group[T.Y]:condition[T.B]:batch[T.v]",
    ]
    # triple interaction column is the product of the three indicators
    expected = (
        (meta3["group"] == "Y")
        & (meta3["condition"] == "B")
        & (meta3["batch"] == "v")
    )
    np.testing.assert_array_equal(
        dm.matrix["group[T.Y]:condition[T.B]:batch[T.v]"].values,
        expected.to_numpy().astype(float),
    )


def test_three_way_star_matches_explicit(meta3):
    a = DesignMatrix(meta3, "~group * condition * batch")
    b = DesignMatrix(
        meta3,
        "~group + condition + batch + group:condition + group:batch "
        "+ condition:batch + group:condition:batch",
    )
    assert list(a.matrix.columns) == list(b.matrix.columns)
    np.testing.assert_array_equal(a.matrix.values, b.matrix.values)


def test_parenthesised_group_and_removal(meta3):
    dm = DesignMatrix(meta3, "~(group + condition) * batch")
    assert list(dm.matrix.columns) == [
        "Intercept",
        "group[T.Y]",
        "condition[T.B]",
        "batch[T.v]",
        "group[T.Y]:batch[T.v]",
        "condition[T.B]:batch[T.v]",
    ]
    dm2 = DesignMatrix(meta3, "~group * condition - group:condition")
    assert list(dm2.matrix.columns) == [
        "Intercept",
        "group[T.Y]",
        "condition[T.B]",
    ]


def test_power_operator(meta3):
    a = DesignMatrix(meta3, "~(group + condition + batch) ** 2")
    b = DesignMatrix(
        meta3,
        "~group + condition + batch + group:condition + group:batch "
        "+ condition:batch",
    )
    assert list(a.matrix.columns) == list(b.matrix.columns)


def test_nesting_operator(meta3):
    dm = DesignMatrix(meta3, "~group / condition")
    assert list(dm.matrix.columns) == [
        "Intercept",
        "group[T.Y]",
        "group[X]:condition[T.B]",
        "group[Y]:condition[T.B]",
    ]


def test_no_intercept_full_coding(meta):
    """~0 + factor codes the factor full rank (one column per level), as
    formulaic/patsy do, so every group mean is representable."""
    dm = DesignMatrix(meta, "~0 + condition")
    assert list(dm.matrix.columns) == ["condition[A]", "condition[B]"]
    np.testing.assert_array_equal(
        dm.matrix.values.sum(axis=1), np.ones(len(meta))
    )
    dm2 = DesignMatrix(meta, "~condition - 1")
    assert list(dm2.matrix.columns) == ["condition[A]", "condition[B]"]


def test_c_reference_level_override(meta):
    for spelling in (
        "~C(condition, ref='B')",
        '~C(condition, ref="B")',
        "~C(condition, Treatment('B'))",
        "~C(condition, Treatment(reference='B'))",
        "~C(condition, contr.treatment('B'))",
        "~C(condition, contr.treatment(base='B'))",
        "~C(condition, levels=['B', 'A'])",
    ):
        dm = DesignMatrix(meta, spelling)
        col = dm.matrix.columns[1]
        assert col.endswith("[T.A]"), (spelling, col)
        np.testing.assert_array_equal(
            dm.matrix[col].values,
            (meta["condition"] == "A").to_numpy().astype(float),
        )
        assert dm.levels["condition"] == ["B", "A"]


def test_c_override_contrast_roundtrip(meta):
    dm = DesignMatrix(meta, "~C(condition, ref='B') + group")
    vec = dm.contrast("condition", "B", "A")
    idx = list(dm.matrix.columns).index("C(condition, ref='B')[T.A]")
    expected = np.zeros(dm.matrix.shape[1])
    expected[idx] = 1.0
    np.testing.assert_array_equal(vec, expected)
    # and the reverse contrast is its negation
    np.testing.assert_array_equal(dm.contrast("condition", "A", "B"), -expected)


def test_unsupported_syntax_raises(meta):
    for bad in (
        "~log(condition)",
        "~I(dose + 1)",
        "~condition ^ group",
        "~condition + 2",
        "~C(condition, contr.sum())",
        "~C(condition, ref='Z')",
        "~(condition + group",
        "~condition ** group",
    ):
        with pytest.raises((ValueError, KeyError)):
            DesignMatrix(meta, bad)


def test_c_levels_must_cover_observed(meta):
    with pytest.raises(ValueError, match="does not cover"):
        DesignMatrix(meta, "~C(condition, levels=['A'])")


def test_ref_override_pipeline_roundtrip(counts_df, metadata):
    """A non-default reference level must round-trip through the full
    pipeline, contrast() and lfc_shrink: C(condition, ref='B') flips the
    sign of the condition effect (reference delegates this to formulaic's
    treatment coding, pydeseq2/dds.py:296-302)."""
    from pydeseq2_tpu import DeseqDataSet, DeseqStats

    res = {}
    for design in ("~condition", "~C(condition, ref='B')"):
        dds = DeseqDataSet(
            counts=counts_df,
            metadata=metadata,
            design=design,
            refit_cooks=False,
            quiet=True,
        )
        dds.deseq2()
        ds = DeseqStats(dds, contrast=["condition", "B", "A"], quiet=True)
        ds.summary()
        res[design] = (dds, ds)

    base = res["~condition"][1].results_df
    flipped = res["~C(condition, ref='B')"][1].results_df
    # identical contrast -> identical statistics regardless of coding (up to
    # solver path-dependence under the reparametrized design)
    np.testing.assert_allclose(
        flipped["log2FoldChange"], base["log2FoldChange"], rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(flipped["pvalue"], base["pvalue"], rtol=1e-3)

    # shrink the flipped coefficient (condition A vs ref B): it must be the
    # negation-shaped counterpart of shrinking B vs A in the default coding
    ds_flip = res["~C(condition, ref='B')"][1]
    ds_flip.lfc_shrink(coeff="C(condition, ref='B')[T.A]")
    ds_base = res["~condition"][1]
    ds_base.lfc_shrink(coeff="condition[T.B]")
    np.testing.assert_allclose(
        ds_flip.results_df["log2FoldChange"].values,
        -ds_base.results_df["log2FoldChange"].values,
        rtol=5e-3,
        atol=5e-3,
    )


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
