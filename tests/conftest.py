from __future__ import annotations

import os

import pytest

from lakeshack_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_CORRECT = os.environ.get("SPARK_GRAFT_CORRECT_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="lakeshack_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sales_fixture(tmp_path_factory):
    """The reference's clustered fixture, regenerated (FIXTURES.md §A)."""
    from tests.fixture_sales import generate_sales_fixture

    root = tmp_path_factory.mktemp("sales_like")
    files = generate_sales_fixture(str(root))
    return str(root), files


@pytest.fixture(scope="session")
def spark_for_props():
    """Alias of the session Spark for hypothesis-driven tests (hypothesis
    dislikes function-scoped fixtures; session scope is explicit here)."""
    return get_spark(app_name="lakeshack_spark_tests", shuffle_partitions=8)
