"""Shim for environments whose setuptools predates native bdist_wheel
(and that lack the ``wheel`` package, e.g. fully-offline containers):
``pip install -e . --no-use-pep517 --no-build-isolation`` takes the
legacy ``setup.py develop`` path, which needs no wheel build.  All
metadata lives in pyproject.toml."""

from setuptools import setup

setup()
