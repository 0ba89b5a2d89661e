"""Every registered oracle must at least PLAN in DuckDB against the real
table schemas — a compound built from a bad member fragment (or a stray
f-string placeholder) should fail here in seconds, not at the driver's
correctness gate."""

from __future__ import annotations

import duckdb
import pytest

from gravitydb_spark.registry import oracle_sql

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_oracle_plans(con):
    bad = {}
    for name, sql in oracle_sql().items():
        assert "{_" not in sql, f"{name}: unexpanded f-string placeholder"
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 — collecting all failures
            bad[name] = str(e)[:200]
    assert not bad, f"oracles that do not plan: {bad}"


def test_registry_imports_without_spark_session():
    """queries()/oracle_sql() must be buildable in a bare interpreter —
    no module-level Column/DataFrame objects anywhere in the registry
    (the driver imports __spark_entry__ before creating its session).
    Run in a clean subprocess so this session's live SparkContext can't
    mask a regression."""
    import subprocess
    import sys

    code = (
        "from pyspark import SparkContext\n"
        "import __spark_entry__ as e\n"
        "q, o = e.queries(), e.oracle_sql()\n"
        "assert len(q) >= 117 and len(o) >= 100, (len(q), len(o))\n"
        "assert SparkContext._active_spark_context is None, 'import started a JVM'\n"
        "print('OK', len(q), len(o))\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.startswith("OK")
