# Sphinx configuration (reference docs/source/conf.py is the same
# skeleton; its content pages are title-only — ours are written out).
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "keras-unsupervised-tpu (ku)"
author = "ku contributors"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]
autodoc_mock_imports = ["jax", "flax", "optax", "orbax"]
html_theme = "alabaster"
