"""LIVE execution of the JDBC incremental seam against a real embedded
database (Apache Derby, shipped in Spark's own classpath) — no
network, no containers, same JVM.

This closes the "construction-tested only" gap for the relational
connector: the pushed-down high-watermark subquery
(``jdbc_incremental_query``) is PARSED AND EXECUTED by a real SQL
engine here, through the exact ``spark.read.format("jdbc")`` path a
Postgres deployment uses (reference entry point:
dagster_code/clickhouse_load_tool/postgres_loader.py:73-153). Only
the URL and driver jar differ in production — the full seam
(driver loading, dbtable subquery, fetchsize, range-partitioned
parallel slices) runs for real. The Mongo and Kafka seams have no
embeddable equivalent; they remain covered by the opt-in
``tests/test_live_connectors.py`` suite.

Derby's strictness is a feature: it rejected the former ``__src``
subquery alias (SQL-standard identifiers cannot start with an
underscore) that Postgres merely tolerated.
"""

from __future__ import annotations

import uuid

import pytest

from cdc_data_pipeline_spark.sources.readers import (
    jdbc_incremental_query,
    read_jdbc_incremental,
)


@pytest.fixture()
def derby(spark):
    """A fresh in-memory Derby database seeded with a CDC-shaped probe
    table: (id, updated_at, v), ids 1..5, one day apart."""
    url = f"jdbc:derby:memory:t{uuid.uuid4().hex[:12]};create=true"
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.executeUpdate(
            "CREATE TABLE probe (id INT, updated_at TIMESTAMP, v VARCHAR(10))")
        for i in range(1, 6):
            st.executeUpdate(
                f"INSERT INTO probe VALUES ({i}, "
                f"TIMESTAMP('2024-01-0{i} 00:00:00'), 'r{i}')")
    finally:
        conn.close()
    return url


def test_exclusive_watermark_executes_server_side(spark, derby):
    """Reference semantics (postgres_loader.py:101-103): strict ``>``
    on the tracking column, evaluated INSIDE the database."""
    df = read_jdbc_incremental(spark, derby, "probe", "id",
                               last_value=3, inclusive=False)
    assert sorted(r["ID"] for r in df.collect()) == [4, 5]


def test_inclusive_timestamp_watermark(spark, derby):
    """The Mongo-style ``$gte`` mode with a timestamp boundary: the
    quoted string literal must be comparable to TIMESTAMP by the
    engine (Derby and Postgres both accept it)."""
    df = read_jdbc_incremental(spark, derby, "probe", "updated_at",
                               last_value="2024-01-03 00:00:00",
                               inclusive=True)
    assert sorted(r["ID"] for r in df.collect()) == [3, 4, 5]


def test_column_projection_reaches_source_query(spark, derby):
    df = read_jdbc_incremental(spark, derby, "probe", "id",
                               last_value=2, columns=["id", "v"])
    assert sorted(df.columns) == ["ID", "V"]
    assert sorted(r["V"] for r in df.collect()) == ["r3", "r4", "r5"]


def test_range_partitioned_parallel_read(spark, derby):
    """numPartitions range slices: each partition issues its own query
    (the concurrent analogue of the reference's fetchmany batching,
    base_loader.py:668-671); the union is exact, no dup/loss at the
    slice boundaries."""
    df = read_jdbc_incremental(spark, derby, "probe", "id", last_value=1,
                               partition_column="id", num_partitions=3,
                               lower_bound=1, upper_bound=6)
    assert df.rdd.getNumPartitions() == 3
    assert sorted(r["ID"] for r in df.collect()) == [2, 3, 4, 5]


def test_full_load_when_no_watermark(spark, derby):
    df = read_jdbc_incremental(spark, derby, "probe", "id")
    assert df.count() == 5


def test_query_shape_is_portable(spark):
    """The alias and predicate the database receives: no leading-
    underscore identifiers (Derby/SQL-standard reject them), literal
    quoting with doubled single quotes."""
    q = jdbc_incremental_query("probe", "updated_at",
                               last_value="o'clock", inclusive=False)
    assert q == ("(SELECT * FROM probe WHERE updated_at > 'o''clock') "
                 "AS incr_src")
    assert not q.split(" AS ")[-1].startswith("_")
