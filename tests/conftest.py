import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_ducklake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_spark("pg_ducklake_spark_tests", cpus=4)


@pytest.fixture()
def lake(spark, tmp_path):
    from pg_ducklake_spark import Lake

    return Lake(spark, str(tmp_path / "lake"))


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
