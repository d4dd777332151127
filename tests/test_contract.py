"""Driver-contract guards: every queries() entry has an oracle, every
oracle parses in DuckDB against the fixture views, every Spark query
analyzes to a resolvable plan. Catches wiring regressions (renamed
columns, missing oracle, SQL typos) without executing 148 queries."""

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_every_query_has_an_oracle_and_vice_versa():
    qs = entrymod.queries()
    orc = entrymod.oracle_sql()
    assert set(qs) == set(orc), (
        f"orphans: {sorted(set(qs) ^ set(orc))}"
    )
    assert all(callable(f) for f in qs.values())


def test_every_oracle_parses_in_duckdb(oracle_con):
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            oracle_con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 - collect all failures
            bad.append((name, str(exc).splitlines()[0]))
    assert not bad, bad


def test_every_spark_query_analyzes(spark, sf_dir):
    bad = []
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            _ = df.schema  # forces analysis/resolution, no execution
        except Exception as exc:  # noqa: BLE001
            bad.append((name, str(exc).splitlines()[0]))
    assert not bad, bad
