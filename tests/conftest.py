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
def pg_server():
    """A real PostgreSQL server for the generic DB-API backend's 5th leg
    (VERDICT_r6 item 7): initdb + postgres run as ``nobody`` (the server
    refuses root) on a unix socket under /tmp, trust auth, no TCP. Yields
    the socket directory; skips when the server binaries are absent.

    The client side is :mod:`lakeshack_spark.pgwire` — a minimal
    pure-Python DB-API driver — so the whole wire protocol (startup,
    simple query, text-mode types, information_schema) runs for real."""
    import shutil
    import subprocess
    import tempfile

    if not (shutil.which("initdb") and shutil.which("pg_ctl")):
        pytest.skip("PostgreSQL server binaries not installed")
    root = tempfile.mkdtemp(prefix="lakeshack_pgtest_")
    data, sock = os.path.join(root, "data"), os.path.join(root, "sock")
    os.makedirs(sock)
    subprocess.run(["chown", "-R", "nobody", root], check=True)

    def as_nobody(cmd: str):
        return subprocess.run(
            ["su", "nobody", "-s", "/bin/sh", "-c", cmd],
            cwd="/tmp",
            capture_output=True,
            text=True,
        )

    r = as_nobody(f"initdb -D {data} -U lakeshack -A trust --no-sync")
    if r.returncode != 0:
        shutil.rmtree(root, ignore_errors=True)
        pytest.skip(f"initdb failed (not running as root with su?): {r.stderr[-300:]}")
    r = as_nobody(
        f"pg_ctl -D {data} -o \"-c listen_addresses='' -k {sock} "
        f'-c fsync=off" -l {root}/pg.log -w start'
    )
    if r.returncode != 0:
        shutil.rmtree(root, ignore_errors=True)
        pytest.skip(f"postgres failed to start: {r.stdout[-300:]}{r.stderr[-300:]}")
    try:
        yield sock
    finally:
        as_nobody(f"pg_ctl -D {data} -m immediate stop")
        shutil.rmtree(root, ignore_errors=True)


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
