"""Batch source readers.

Reference scans (reference: dagster_code/clickhouse_load_tool/
mongo_loader.py:132-229 and postgres_loader.py:73-153) stream rows
through Python cursors with manual batching; in Spark the same
capability is a declarative scan — Catalyst pushes filters and
projections down to the parquet/JSON reader, and partitioned reads
replace `fetchmany` batching.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


NS_TIMESTAMP_COLS = ("ts",)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (S1/S2 equivalents).

    Filter/projection pushdown is free: callers apply ``.select`` /
    ``.filter`` and Catalyst pushes them into the parquet scan
    (visible as PushedFilters/ReadSchema in ``.explain``).

    Event-time columns are normalized to TIMESTAMP (LTZ) whatever the
    file carries: fixture generations have shipped both
    TIMESTAMP(NANOS) — surfaced as bigint under ``nanosAsLong`` and
    converted losslessly here (the nanos are whole microseconds) — and
    TIMESTAMP(MICROS), surfaced as TIMESTAMP_NTZ under Spark 4's NTZ
    inference. LTZ is required downstream by streaming watermarks
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) and is a no-op value-wise
    under the engine's pinned UTC session timezone.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name in NS_TIMESTAMP_COLS:
            if field.dataType.simpleString() == "bigint":
                # integer `div`, not `/`: double division loses precision
                # at epoch-nanos magnitude (~1e18 > 2^53)
                df = df.withColumn(field.name,
                                   F.timestamp_micros(F.expr(f"`{field.name}` div 1000")))
            elif field.dataType.simpleString() == "timestamp_ntz":
                df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def read_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the scan produced fewer partitions than cores.

    Small single-file parquet inputs land in one partition, serializing
    CPU-bound per-row work (hashing, shingling, feature extraction). At
    real scale (many input splits) this is a no-op — the guard keeps it
    from ever adding a shuffle to an already-parallel plan.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def incremental_scan(
    df: DataFrame,
    tracking_column: str,
    last_value,
    inclusive: bool = False,
) -> DataFrame:
    """Incremental extraction predicate (P8/P9).

    Reference semantics: Mongo uses ``$gte`` (inclusive,
    mongo_loader.py:156), Postgres uses ``>`` (exclusive,
    postgres_loader.py:101-103). Both modes supported. At scale this
    predicate prunes parquet row groups via min/max stats — no full scan.
    """
    if last_value is None:
        return df
    col = F.col(tracking_column)
    return df.filter(col >= F.lit(last_value) if inclusive else col > F.lit(last_value))


def _sql_literal(value) -> str:
    """Render a watermark value as a SQL literal for the pushed-down
    source query. Values come from ``get_watermark`` (engine-computed
    MAX, not user input); strings/timestamps are quoted with doubled
    single quotes, numbers pass through."""
    import datetime

    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, (datetime.datetime, datetime.date)):
        value = str(value)
    return "'" + str(value).replace("'", "''") + "'"


def jdbc_incremental_query(
    table: str,
    tracking_column: str,
    last_value=None,
    inclusive: bool = False,
    columns=None,
) -> str:
    """Source-side subquery for an incremental JDBC extract: the
    watermark predicate is INSIDE the query the database executes, so
    only new rows ever cross the wire (reference semantics:
    postgres_loader.py:101-103 — exclusive ``>``; Mongo's ``$gte``
    is ``inclusive=True``).
    """
    cols = ", ".join(columns) if columns else "*"
    q = f"SELECT {cols} FROM {table}"
    if last_value is not None:
        op = ">=" if inclusive else ">"
        q += f" WHERE {tracking_column} {op} {_sql_literal(last_value)}"
    # alias must start with a letter: the SQL standard (and Derby,
    # strictly) forbids unquoted leading underscores; Postgres/MySQL
    # merely tolerate them
    return f"({q}) AS incr_src"


def read_jdbc_incremental(
    spark: SparkSession,
    url: str,
    table: str,
    tracking_column: str,
    last_value=None,
    inclusive: bool = False,
    columns=None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound=None,
    upper_bound=None,
    fetchsize: int = 10_000,
    properties: dict | None = None,
) -> DataFrame:
    """S1/S2 against a live relational source: incremental JDBC scan
    with the high-watermark predicate pushed INTO the source query
    (``dbtable`` subquery), true to the reference's server-side
    ``WHERE updated_at > %s`` cursor (postgres_loader.py:73-153).

    Parallelism: pass ``partition_column``/``num_partitions`` (+
    numeric/temporal ``lower_bound``/``upper_bound``) and Spark issues
    one range-sliced query per partition — the JDBC analogue of the
    reference's ``fetchmany`` batching (base_loader.py:668-671), but
    concurrent. The tracking column is the natural partition column
    for CDC batches (recent rows cluster in its range).

    There is no live database in the test sandbox, so the query
    construction is unit-tested (tests/test_sources_quality.py) and
    the predicate-reaches-scan property is pinned on the parquet path
    (test_incremental_filter_pushdown); against a real database this
    function is the only seam that changes.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", jdbc_incremental_query(table, tracking_column,
                                                  last_value, inclusive, columns))
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        assert num_partitions and lower_bound is not None and upper_bound is not None, \
            "partitioned JDBC reads need num_partitions + lower/upper bounds"
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def read_json_staging(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read a staged JSON change-batch (S5/S6 equivalent).

    PERMISSIVE mode mirrors the reference's
    ``input_format_skip_unknown_fields=1`` (base_loader.py:713-721):
    unknown fields are dropped when the caller selects the target
    schema's columns; malformed rows land in ``_corrupt_record``.
    """
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv_source(spark: SparkSession, path: str, schema=None,
                    header: bool = True, sep: str = ",") -> DataFrame:
    """CSV source (flat-file extracts). PERMISSIVE like the JSON path:
    malformed rows land in ``_corrupt_record`` when the schema declares
    it rather than failing the scan. Schema-on-read inference is
    available but an explicit schema avoids the extra inference pass
    over the files — at 100 TB, inference is a full scan."""
    reader = (spark.read.option("mode", "PERMISSIVE")
              .option("header", str(header).lower()).option("sep", sep))
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_bucketed_table(df: DataFrame, name: str, keys, n_buckets: int = 32,
                         sort_cols=None) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Two tables bucketed by the same key into the same bucket count
    join WITHOUT a shuffle (and without even a sort when sortBy matches
    the join key) — at 100 TB this turns the recurring fact-to-fact
    join from the dominant shuffle into a local zip per bucket. The
    bucketing survives restarts: it's recorded in the catalog, so every
    downstream join benefits, not just this session's.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def mongo_pipeline(
    tracking_column: str | None = None,
    last_value=None,
    inclusive: bool = True,
    query_filter: dict | None = None,
    projection=None,
    sort_by_tracking: bool = True,
) -> list[dict]:
    """Mongo aggregation pipeline for an incremental collection scan,
    mirroring the reference loader's cursor construction
    (mongo_loader.py:132-229): optional ``query_filter`` merged with
    the watermark (``$gte`` inclusive — the reference re-reads the
    boundary row and dedupes downstream; ``$gt`` exclusive), optional
    projection, ascending sort on the tracking column. The pipeline is
    executed SERVER-SIDE by the connector, so only new rows cross the
    wire — same pushdown contract as the JDBC seam.
    """
    match: dict = dict(query_filter or {})
    if tracking_column is not None and last_value is not None:
        op = "$gte" if inclusive else "$gt"
        match[tracking_column] = {op: last_value}
    pipeline: list[dict] = []
    if match:
        pipeline.append({"$match": match})
    if projection:
        pipeline.append({"$project": {c: 1 for c in projection}})
    if sort_by_tracking and tracking_column is not None:
        pipeline.append({"$sort": {tracking_column: 1}})
    return pipeline


def read_mongo_incremental(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    tracking_column: str | None = None,
    last_value=None,
    inclusive: bool = True,
    query_filter: dict | None = None,
    projection=None,
) -> DataFrame:
    """S1/S2 against a live MongoDB: incremental collection scan with
    the watermark in a server-side ``$match`` (reference
    mongo_loader.py:156 uses ``$gte`` on the boundary). Requires the
    mongo-spark connector on the classpath — absent in this sandbox,
    so pipeline construction is unit-tested and the downstream
    normalize/merge path is exercised on fixtures; against a real
    cluster this function is the only seam that changes.
    """
    import json as _json

    pipeline = mongo_pipeline(tracking_column, last_value, inclusive,
                              query_filter, projection)
    try:
        return (spark.read.format("mongodb")
                .option("connection.uri", uri)
                .option("database", database)
                .option("collection", collection)
                .option("aggregation.pipeline", _json.dumps(pipeline))
                .load())
    except Exception as e:  # pragma: no cover - connector absent in sandbox
        raise RuntimeError(
            "mongo-spark connector not on the classpath; add "
            "org.mongodb.spark:mongo-spark-connector to spark.jars.packages"
        ) from e


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """ORC scan (bundled with Spark — no extra jars): same predicate
    pushdown / column pruning contract as the parquet scans (verify
    with ``.explain`` -> PushedFilters / ReadSchema). The warehouse
    interchange format alongside parquet; Hive-heavy estates stage in
    ORC where the reference staged JSON."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by=None) -> None:
    w = df.write.mode(mode).format("orc")
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        w = w.partitionBy(*cols)
    w.save(path)


def read_avro(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Avro scan — requires the external ``spark-avro`` package
    (org.apache.spark:spark-avro_2.13) on the classpath; it is NOT
    bundled with Spark and is absent in this sandbox, so the call is
    gated behind a clear error instead of a raw ClassNotFound. The
    row-oriented streaming-interchange format (Kafka schema-registry
    pipelines) alongside the columnar parquet/ORC scans."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.format("avro").load(path)
    except Exception as exc:
        # ONLY the missing-data-source shape maps to the classpath
        # hint — a broader match (e.g. any message mentioning the
        # .avro path) would mislabel missing files/permissions
        if "Failed to find data source" in str(exc):
            raise RuntimeError(
                "spark-avro is not on the classpath; add "
                "spark.jars.packages=org.apache.spark:spark-avro_2.13:<spark-version> "
                "to the session config") from exc
        raise
