"""Host-side Wilkinson-formula design matrices and contrast vectors.

Replaces the reference's ``formulaic`` + ``formulaic-contrasts`` dependency
(reference pydeseq2/dds.py:10,296-302 and pydeseq2/ds.py:590-601) with a small
self-contained materializer. Supported grammar (the subset the DESeq2 workflow
uses):

    ~ a + b + C(x) + cont + a:b  (and a*b expansion)

- categorical variables (object/category/bool dtype, or wrapped in ``C()``)
  are treatment-coded against the first level (sorted, or the pandas
  categorical order), producing columns named ``var[T.level]`` as formulaic
  does;
- numeric variables pass through as a single column named after the variable;
- ``a:b`` builds interaction columns (products, names joined with ``:``);
- the intercept column ``Intercept`` is always included unless the formula
  contains a ``0`` or ``-1`` term.

Everything here is host/NumPy code - design matrices are tiny (N x P with
P <= ~10) and are replicated across the device mesh.
"""

from __future__ import annotations

import itertools
import re
import warnings

import numpy as np
import pandas as pd

_C_RE = re.compile(r"^C\(\s*([^,)]+)\s*\)$")


class Factor:
    """One variable appearing in a term."""

    def __init__(self, name: str, categorical: bool | None, display: str):
        self.name = name  # metadata column name
        self.categorical = categorical  # None = decide from dtype
        self.display = display  # how it appears in column names (e.g. C(x))

    def __repr__(self):  # pragma: no cover
        return f"Factor({self.display}, cat={self.categorical})"


def _parse_formula(formula: str):
    """Parse ``~ a + b + a:b`` into (terms, intercept)."""
    rhs = formula.split("~", 1)[1] if "~" in formula else formula
    rhs = rhs.strip()
    if not rhs:
        raise ValueError(f"Empty design formula: {formula!r}")
    intercept = True
    expanded: list[str] = []
    for t in (s.strip() for s in rhs.split("+")):
        if not t:
            continue
        if t in ("0", "-1"):
            intercept = False
        elif t == "1":
            continue
        elif "*" in t and ":" not in t:
            parts = [p.strip() for p in t.split("*")]
            expanded.extend(parts)
            expanded.append(":".join(parts))
        else:
            expanded.append(t)
    expanded = list(dict.fromkeys(expanded))  # dedupe, keep order
    terms: list[list[Factor]] = []
    for t in expanded:
        factors = []
        for part in (p.strip() for p in t.split(":")):
            m = _C_RE.match(part)
            if m:
                factors.append(Factor(m.group(1).strip(), True, part))
            else:
                factors.append(Factor(part, None, part))
        terms.append(factors)
    return terms, intercept


class DesignMatrix:
    """A fitted design: formula -> (N, P) matrix + state for contrasts.

    Attributes
    ----------
    matrix : pandas.DataFrame
        The materialized design matrix (samples x columns).
    levels : dict
        Categorical variable -> ordered list of levels (first = reference).
    variables : list of str
        Variable names appearing in the formula.
    """

    def __init__(self, metadata: pd.DataFrame, formula: str):
        self.formula = formula
        self.terms, self.intercept = _parse_formula(formula)
        self.levels: dict[str, list] = {}

        for term in self.terms:
            for f in term:
                if f.name not in metadata.columns:
                    raise KeyError(
                        f"Variable '{f.name}' of the design formula is not a "
                        "column of the metadata."
                    )
                if f.categorical is None:
                    dtype = metadata[f.name].dtype
                    f.categorical = isinstance(
                        dtype, pd.CategoricalDtype
                    ) or not pd.api.types.is_numeric_dtype(dtype)
                if f.categorical and f.name not in self.levels:
                    col = metadata[f.name]
                    if isinstance(col.dtype, pd.CategoricalDtype):
                        levels = list(col.cat.categories)
                    else:
                        levels = sorted(pd.unique(col.dropna()).tolist(), key=str)
                    if len(levels) == 1:
                        warnings.warn(
                            f"Factor '{f.name}' has only one level; the design "
                            "matrix column it generates is constant.",
                            UserWarning,
                            stacklevel=3,
                        )
                    self.levels[f.name] = levels

        self.variables = list(
            dict.fromkeys(f.name for term in self.terms for f in term)
        )
        self.matrix = self._materialize(metadata)

    # -- materialization ---------------------------------------------------
    def _term_columns(self, term: list[Factor], data: pd.DataFrame):
        """Column (name, values) pairs contributed by one term."""
        per_factor: list[list[tuple[str, np.ndarray]]] = []
        for f in term:
            col = data[f.name]
            if f.categorical:
                levels = self.levels[f.name]
                per_factor.append(
                    [
                        (
                            f"{f.display}[T.{lvl}]",
                            (col == lvl).to_numpy().astype(float),
                        )
                        for lvl in levels[1:]
                    ]
                )
            else:
                per_factor.append([(f.display, col.to_numpy().astype(float))])
        cols = []
        for combo in itertools.product(*per_factor):
            name = ":".join(c[0] for c in combo)
            vals = np.prod(np.stack([c[1] for c in combo], axis=0), axis=0)
            cols.append((name, vals))
        return cols

    def _materialize(self, data: pd.DataFrame) -> pd.DataFrame:
        cols: dict[str, np.ndarray] = {}
        if self.intercept:
            cols["Intercept"] = np.ones(len(data))
        for term in self.terms:
            for name, vals in self._term_columns(term, data):
                cols[name] = vals
        return pd.DataFrame(cols, index=data.index)

    # -- contrasts ---------------------------------------------------------
    def cond(self, **kwargs) -> np.ndarray:
        """Model-matrix row for a condition; unspecified categorical variables
        sit at their reference level, unspecified numeric variables at 0.

        Parity: formulaic_contrasts.FormulaicContrasts.cond as used at
        reference pydeseq2/dds.py:564-578.
        """
        unknown = set(kwargs) - set(self.variables)
        if unknown:
            raise ValueError(
                f"Variables {sorted(unknown)} are not part of the design."
            )
        row: dict = {}
        for var in self.variables:
            if var in self.levels:
                val = kwargs.get(var, self.levels[var][0])
                if val not in self.levels[var]:
                    raise ValueError(
                        f"Value '{val}' is not a level of variable '{var}'. "
                        f"Available levels: {self.levels[var]}."
                    )
                row[var] = val
            else:
                row[var] = kwargs.get(var, 0.0)
        mat = self._materialize(pd.DataFrame([row]))
        vec = np.zeros(self.matrix.shape[1])
        for i, name in enumerate(self.matrix.columns):
            if name in mat.columns:
                vec[i] = mat[name].iloc[0]
        return vec

    def contrast(self, column: str, baseline, group_to_compare) -> np.ndarray:
        """Contrast vector for ``column``: ``group_to_compare`` vs ``baseline``.

        Parity: formulaic_contrasts.FormulaicContrasts.contrast as used at
        reference pydeseq2/dds.py:580-582, pydeseq2/ds.py:590-601.
        """
        return self.cond(**{column: group_to_compare}) - self.cond(
            **{column: baseline}
        )


def build_design_matrix(metadata: pd.DataFrame, formula: str) -> DesignMatrix:
    """Materialize a design matrix from a formula (convenience wrapper)."""
    return DesignMatrix(metadata, formula)
