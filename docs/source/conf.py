"""Sphinx configuration for pydeseq2_tpu.

Counterpart of the reference's docs system (reference
/root/reference/docs/source/conf.py + .readthedocs.yaml): API reference via
autodoc/napoleon plus the repo's markdown documentation via myst-parser.
Built by the CI ``docs`` job (``pip install .[docs]`` + ``sphinx-build``);
the development image has no network, so local runs need a host with the
docs extra installed.
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

# Optional imports that must not break the docs build. jax/scipy are hard
# package dependencies and stay REAL: module import executes jit decorators
# and jax.config calls, which mocks render into garbage signatures.
autodoc_mock_imports = ["matplotlib", "anndata"]

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
