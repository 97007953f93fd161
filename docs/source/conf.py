"""Sphinx configuration for pydeseq2_tpu.

Counterpart of the reference's docs system (reference
/root/reference/docs/source/conf.py + .readthedocs.yaml): API reference via
autodoc/napoleon plus the repo's markdown documentation via myst-parser.
Sphinx is not installed in the development image (no-network policy), so
this configuration is exercised by readthedocs / any host with
``pip install .[docs]`` rather than by local CI.
"""

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "pydeseq2_tpu"
author = "pydeseq2_tpu developers"
copyright = "2026, pydeseq2_tpu developers"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
    "myst_parser",
]

autosummary_generate = True
autodoc_default_options = {
    "members": True,
    "undoc-members": False,
    "show-inheritance": True,
}
napoleon_numpy_docstring = True

# Heavy/optional imports that must not break the docs build.
autodoc_mock_imports = ["jax", "jaxlib", "matplotlib", "scipy", "anndata"]

myst_enable_extensions = ["colon_fence"]
source_suffix = {".rst": "restructuredtext", ".md": "markdown"}

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
    "pandas": ("https://pandas.pydata.org/docs/", None),
}

html_theme = "furo"
templates_path = []
exclude_patterns = []
