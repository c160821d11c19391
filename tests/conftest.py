from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")
    s = get_spark("graph-etl-spark-tests")
    yield s


@pytest.fixture()
def output_dir(tmp_path):
    d = str(tmp_path / "output")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def sf_dir():
    return SF_DIR
