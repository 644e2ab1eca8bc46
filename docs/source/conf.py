# Sphinx configuration for pyroved_tpu documentation.
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "pyroved_tpu"
author = "pyroved_tpu developers"
with open(os.path.join(os.path.dirname(__file__), "..", "..",
                       "pyroved_tpu", "__version__.py")) as f:
    exec(f.read())
version = release = __version__  # noqa: F821

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]
autodoc_member_order = "bysource"
html_theme = "sphinx_rtd_theme"
exclude_patterns = []
