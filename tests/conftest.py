"""Shared fixtures: a reference-module oracle and a local SparkSession."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

REFERENCE_PATH = "/root/reference/WikiExtractor.py"


@pytest.fixture(scope="session")
def reference():
    """Import the reference script as a module to use as a behavioral
    oracle (SURVEY.md §5.3.1).  We replicate its production config:
    ``main()`` always calls ``ignoreTag('a')`` because keepLinks is
    False (reference WikiExtractor.py:712-713).
    """
    spec = importlib.util.spec_from_file_location("wikiextractor_reference", REFERENCE_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["wikiextractor_reference"] = mod
    spec.loader.exec_module(mod)
    mod.ignoreTag("a")
    return mod


@pytest.fixture(scope="session")
def spark():
    from wikiextractor_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name="wikiextractor-spark-tests", cpus=int(cpus))
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
