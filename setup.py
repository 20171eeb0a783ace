"""Packaging shim (reference: setup.py:14-138 builds the PyPI wheel).

All metadata lives in pyproject.toml; this file exists for
``python setup.py``-style tooling parity with the reference.
"""

from setuptools import setup

setup()
