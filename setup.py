"""Thin shim so legacy editable installs work on old setuptools stacks.

All metadata lives in pyproject.toml; environments whose setuptools lacks a
bundled bdist_wheel (<70, no ``wheel`` package) can still do
``pip install -e . --no-use-pep517 --no-build-isolation``.
"""

from setuptools import setup

setup()
