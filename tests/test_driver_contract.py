"""Emulates the driver's correctness gate: every ``queries()`` entry with an
``oracle_sql()`` twin must match DuckDB row-for-row (order-insensitive,
column-name-sorted) on the same parquet tables."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from compress_otel_collector_spark.sources.tables import TABLES

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM '{sf_dir}/{t}.parquet'"
        )
    return con.sql(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    got = normalize(QUERIES[name](spark, sf_dir).toPandas())
    want = normalize(duck_run(ORACLES[name], sf_dir))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True, obj=name)


def test_all_queries_run(spark, sf_dir):
    """Every queries() entry (incl. non-oracle ones) must execute."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "pages" in df.columns


def test_windowed_counts_timezone_free(spark, sf_dir):
    """warc_hour and windowed_counts must not depend on the session
    timezone (r3 verdict #4: the UTC pin moved out of the queries — the
    driver's session may carry any tz, so the plans themselves must be
    tz-free: NTZ epoch via timestampdiff, instants via timestamp_seconds,
    hour windows bucketed in raw epoch micros)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        names = ("warc_hour", "windowed_counts", "sessionize", "asof_join",
                 "hypertable_rollup", "range_join")
        utc = {
            name: normalize(QUERIES[name](spark, sf_dir).toPandas())
            for name in names
        }
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        for name, want in utc.items():
            got = normalize(QUERIES[name](spark, sf_dir).toPandas())
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True, obj=name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
