"""Normalization ops (P2-P6), schema inference quirks, quality ops."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from cdc_data_pipeline_spark.operators.quality import (
    DataQualityError,
    accepted_values_violations,
    expect_not_null,
    expect_unique,
    not_null_violation_count,
    unique_violations,
)
from cdc_data_pipeline_spark.sources.normalize import (
    apply_refined_schema,
    drop_fields,
    flatten_structs,
    infer_refined_schema,
    normalize_document_frame,
    sanitize_keys,
)


def test_drop_fields_top_and_nested(spark):
    df = spark.createDataFrame([Row(a=Row(b=1, c=2), d=3, e=4)])
    out = drop_fields(df, ["d", "a.b"])
    assert "d" not in out.columns
    assert [f.name for f in out.schema["a"].dataType.fields] == ["c"]


def test_flatten_one_level(spark):
    df = spark.createDataFrame([Row(a=Row(b=1, c="x"), d=3)])
    out = flatten_structs(df)
    assert set(out.columns) == {"a_b", "a_c", "d"}
    assert out.first().a_b == 1


def test_sanitize_dollar_keys(spark):
    df = spark.createDataFrame([(1,)], ["$date"])
    assert sanitize_keys(df).columns == ["date"]


def test_stringify_nested(spark):
    df = spark.createDataFrame([Row(a=Row(b=1), k=2)])
    out = normalize_document_frame(df, stringify_nested=True)
    assert out.schema["a"].dataType == T.StringType()
    assert out.first().a == '{"b":1}'


def test_schema_inference_date_rules(spark):
    """Reference rules (base_loader.py:762-855): >=80% timestamp-regex
    -> DateTime, date-regex -> Date, mixed stays string."""
    rows = [("2024-01-01 10:00:00", "2024-01-01", "x1"),
            ("2024-01-02 11:30:00", "2024-01-02", "2024-01-01"),
            ("2024-01-03 09:15:00", "2024-01-03", "7")]
    df = spark.createDataFrame(rows, "ts_str string, d_str string, mixed string")
    refined = infer_refined_schema(df)
    assert isinstance(refined["ts_str"], T.TimestampType)
    assert isinstance(refined["d_str"], T.DateType)
    assert "mixed" not in refined
    out = apply_refined_schema(df, refined)
    assert isinstance(out.schema["ts_str"].dataType, T.TimestampType)
    assert out.filter("ts_str IS NULL OR d_str IS NULL").count() == 0


def test_jdbc_incremental_query_embeds_watermark():
    """S2 true-to-form: the watermark predicate must live INSIDE the
    query the database executes (reference: postgres_loader.py:101-103
    exclusive `>`; Mongo's $gte is the inclusive mode), so only new
    rows cross the wire. No live DB in the sandbox — the pushed-down
    query construction is the unit under test; the predicate-reaches-
    scan property is pinned on the parquet path by
    test_incremental_filter_pushdown."""
    from cdc_data_pipeline_spark.sources.readers import jdbc_incremental_query

    q = jdbc_incremental_query("public.savings_plan", "updated_at",
                               "2024-01-01 10:00:00")
    assert q == ("(SELECT * FROM public.savings_plan "
                 "WHERE updated_at > '2024-01-01 10:00:00') AS incr_src")

    q = jdbc_incremental_query("t", "updated_at", "2024-01-01", inclusive=True,
                               columns=["id", "updated_at"])
    assert q == ("(SELECT id, updated_at FROM t "
                 "WHERE updated_at >= '2024-01-01') AS incr_src")

    assert jdbc_incremental_query("t", "seq", 42) == \
        "(SELECT * FROM t WHERE seq > 42) AS incr_src"
    # first run: no watermark -> full scan, no WHERE
    assert jdbc_incremental_query("t", "seq") == "(SELECT * FROM t) AS incr_src"
    # quotes in a (string) watermark value cannot break out of the literal
    assert "WHERE c > '''; DROP'" in jdbc_incremental_query("t", "c", "'; DROP")


def test_document_schema_vote_mixed_and_nulls():
    """Reference vote rules (base_loader.py:788-855): union of keys,
    mixed python types -> String, bool before int, int+float -> Double,
    nested -> String, all-NULL -> nullable String, >=80% date regex on
    strings -> Date/Timestamp."""
    from cdc_data_pipeline_spark.sources.normalize import infer_document_schema

    docs = [
        {"i": 1, "f": 1.5, "b": True, "mixed": 7, "allnull": None,
         "nested": {"a": 1}, "ts": "2024-01-01 10:00:00", "num_or_str": 1},
        {"i": 2, "f": 2, "b": False, "mixed": "seven",
         "ts": "2024-01-02 11:00:00", "num_or_str": 2, "late_key": "x"},
        {"i": 3, "f": 2.5, "b": True, "mixed": 8.0, "allnull": None,
         "ts": "2024-01-03 12:00:00", "num_or_str": "three"},
    ]
    schema = infer_document_schema(docs)
    by_name = {f.name: f.dataType for f in schema.fields}

    assert isinstance(by_name["i"], T.LongType)
    assert isinstance(by_name["f"], T.DoubleType)          # int+float -> Double
    assert isinstance(by_name["b"], T.BooleanType)
    assert isinstance(by_name["mixed"], T.StringType)      # int/str/float mix
    assert isinstance(by_name["allnull"], T.StringType)    # no non-null sample
    assert isinstance(by_name["nested"], T.StringType)     # dict -> serialized
    assert isinstance(by_name["ts"], T.TimestampType)      # 3/3 regex hits
    assert isinstance(by_name["num_or_str"], T.StringType) # mixed, not Long
    assert "late_key" in by_name                           # union of keys
    assert [f.nullable for f in schema.fields] == [True] * len(schema.fields)


def test_unique_and_not_null(spark):
    df = spark.createDataFrame([(1, "a"), (1, None), (2, "b")], "k long, v string")
    assert unique_violations(df, ["k"]).count() == 1
    nn = not_null_violation_count(df, ["k", "v"]).first()
    assert nn["k_nulls"] == 0 and nn["v_nulls"] == 1
    with pytest.raises(DataQualityError):
        expect_unique(df, ["k"])
    with pytest.raises(DataQualityError):
        expect_not_null(df, ["v"])
    expect_not_null(df, ["k"])


def test_accepted_values(spark):
    df = spark.createDataFrame([("active",), ("bogus",), (None,)], "status string")
    bad = accepted_values_violations(df, "status", ["active", "completed", "cancelled"]).collect()
    assert len(bad) == 1 and bad[0].status == "bogus"


def test_hostile_session_timezone_fixed(spark):
    """The driver may hand us a session with a non-UTC timezone; every
    catalog query routes through configure_session, which must reset it
    or timestamp collects would shift against the DuckDB oracle."""
    from cdc_data_pipeline_spark import catalog
    from tests.test_oracle_parity import canon, duck_result
    from tests.conftest import SF0001

    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        sdf = catalog.queries()["stg_savings_plan"](spark, SF0001)
        c1, r1 = canon(sdf.columns, [tuple(r) for r in sdf.collect()])
        d_cols, _d_types, d_rows = duck_result(catalog.oracles()["stg_savings_plan"], SF0001)
        c2, r2 = canon(d_cols, d_rows)
        assert c1 == c2 and r1 == r2
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_json_staging_roundtrip_permissive(spark, tmp_path):
    """S4/S6: JSON staging hop — unknown fields dropped when selecting
    the target schema (the reference's skip_unknown_fields), malformed
    rows surfaced, values preserved."""
    import json

    from cdc_data_pipeline_spark.sources.readers import read_json_staging

    path = tmp_path / "staged"
    path.mkdir()
    rows = [
        {"k": 1, "v": "a", "extra_field": "ignored"},
        {"k": 2, "v": "b"},
    ]
    with open(path / "batch.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write("{not valid json\n")

    schema = "k long, v string, _corrupt_record string"
    df = read_json_staging(spark, str(path), schema=schema).cache()
    good = df.filter("_corrupt_record IS NULL").select("k", "v")
    assert sorted(map(tuple, good.collect())) == [(1, "a"), (2, "b")]
    assert df.filter("_corrupt_record IS NOT NULL").count() == 1
    df.unpersist()


def test_churn_simulator_drives_upsert(spark, sf_dir):
    """Three deterministic churn ticks merged with upsert_dedup: state
    grows by exactly the insert count per tick, updated keys carry the
    bumped tracking value, and regeneration is bit-identical."""
    from cdc_data_pipeline_spark.operators import incremental as inc
    from cdc_data_pipeline_spark.sources.readers import read_table
    from cdc_data_pipeline_spark.sources.simulate import PROFILES, churn_batch

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice")
    n_ins, n_upd = PROFILES["light"]
    state = orders
    n0 = state.count()
    for tick in (1, 2, 3):
        batch = churn_batch(orders, ["o_orderkey"], "o_orderdate", tick,
                            "light", value_col="o_totalprice")
        assert batch.count() == n_ins + n_upd
        # determinism: same tick regenerates the identical batch
        again = churn_batch(orders, ["o_orderkey"], "o_orderdate", tick,
                            "light", value_col="o_totalprice")
        assert batch.exceptAll(again).count() == 0
        state = inc.upsert_dedup(state, batch, ["o_orderkey"], "o_orderdate")
    assert state.count() == n0 + 3 * n_ins


def test_csv_source_roundtrip(spark, tmp_path):
    from cdc_data_pipeline_spark.sources.readers import read_csv_source

    p = tmp_path / "extract.csv"
    p.write_text("k,v\n1,a\n2,b\nnot_a_number,c\n")
    df = read_csv_source(spark, str(p), schema="k long, v string, _corrupt_record string").cache()
    df.count()
    good = df.filter("_corrupt_record IS NULL")
    assert sorted((r.k, r.v) for r in good.collect()) == [(1, "a"), (2, "b")]
    assert df.filter("_corrupt_record IS NOT NULL").count() == 1


def test_winnow_vectorized_equals_native(spark, sf_dir):
    """The Arrow-batched winnowing fingerprints must be bit-identical
    to the native-expression formulation."""
    from pyspark.sql import functions as F

    from cdc_data_pipeline_spark.functions import text as tx
    from cdc_data_pipeline_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents").filter(F.length("text") >= 11).limit(30)
    native = d.select("doc_id", F.explode(tx.winnow_fingerprints("text")).alias("fp"))
    vec = d.select("doc_id",
                   F.explode(tx.winnow_fingerprints_vectorized()(F.col("text"))).alias("fp"))
    assert sorted(map(tuple, native.collect())) == sorted(map(tuple, vec.collect()))


def test_salted_join_matches_plain_join(spark, sf_dir):
    from cdc_data_pipeline_spark.operators.skew import salted_join
    from cdc_data_pipeline_spark.sources.readers import read_table
    import pyspark.sql.functions as F

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name").withColumnRenamed("c_custkey", "o_custkey")
    # plant a hot key: half the orders point at customer 1
    skewed = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(1)).otherwise(F.col("o_custkey")))
    for how in ("inner", "left"):
        want = skewed.join(cust, ["o_custkey"], how)
        got = salted_join(skewed, cust, ["o_custkey"], how=how, salt=8)
        assert got.exceptAll(want.select(*got.columns)).count() == 0
        assert want.select(*got.columns).exceptAll(got).count() == 0


def test_salted_join_spreads_hot_key_over_salt_partitions(spark, sf_dir):
    from cdc_data_pipeline_spark.operators.skew import salted_join
    from cdc_data_pipeline_spark.sources.readers import read_table
    import pyspark.sql.functions as F

    orders = read_table(spark, sf_dir, "orders").select("o_orderkey") \
        .withColumn("k", F.lit(1))  # ONE key for every row
    dim = spark.createDataFrame([(1, "hot")], ["k", "label"])
    joined = salted_join(orders, dim, ["k"], salt=8)
    # pre-drop the salt column the join shuffles on: 8 distinct
    # (k, salt) shuffle keys exist, so no single reducer saw all rows
    n = orders.count()
    assert joined.count() == n
    salted = orders.withColumn(
        "__salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(8)))
    per_salt = salted.groupBy("__salt").count().collect()
    assert len(per_salt) == 8
    assert max(r["count"] for r in per_salt) < 0.3 * n


def test_schema_diff_and_align(spark):
    import pyspark.sql.types as T
    import pyspark.sql.functions as F
    from cdc_data_pipeline_spark.sources.normalize import align_to_schema, schema_diff

    old = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.IntegerType()),
        T.StructField("legacy", T.StringType()),
    ])
    new = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),   # widened
        T.StructField("created_at", T.TimestampType()),  # added
    ])
    d = schema_diff(old, new)
    assert d["added"] == ["created_at"]
    assert d["removed"] == ["legacy"]
    assert d["changed"] == {"amount": ("int", "double")}

    df = spark.createDataFrame([(1, "a", 5, "x")], schema=old)
    evolved = align_to_schema(df, new)
    assert [f.name for f in evolved.schema.fields] == [
        "id", "name", "amount", "created_at"]
    row = evolved.first()
    assert row.amount == 5.0 and row.created_at is None
    # old and new generations union positionally after alignment
    new_df = spark.createDataFrame(
        [(2, "b", 7.5, None)], schema=new)
    assert new_df.unionByName(evolved).count() == 2


def test_quarantine_split_routes_with_reasons(spark):
    from pyspark.sql import functions as F

    from cdc_data_pipeline_spark.operators.quality import quarantine_split

    df = spark.createDataFrame(
        [(1, "ok", 5.0), (2, "bad", -1.0), (3, None, 2.0), (4, "bad", None)],
        "id long, status string, v double")
    good, bad = quarantine_split(df, {
        "status_ok": F.col("status") != "bad",
        "v_positive": F.col("v") > 0,
    })
    assert [r["id"] for r in good.collect()] == [1]
    reasons = {r["id"]: sorted(r["_violations"]) for r in bad.collect()}
    assert reasons == {
        2: ["status_ok", "v_positive"],
        3: ["status_ok"],          # NULL status must NOT pass
        4: ["status_ok", "v_positive"],   # NULL v must NOT pass
    }
    assert "_violations" not in good.columns


def test_mongo_pipeline_construction():
    from cdc_data_pipeline_spark.sources.readers import mongo_pipeline

    # reference semantics: $gte watermark merged with the caller filter,
    # projection, ascending tracking sort (mongo_loader.py:132-229)
    p = mongo_pipeline("updated_at", "2024-01-01", inclusive=True,
                       query_filter={"status": "active"},
                       projection=["_id", "updated_at", "status"])
    assert p == [
        {"$match": {"status": "active", "updated_at": {"$gte": "2024-01-01"}}},
        {"$project": {"_id": 1, "updated_at": 1, "status": 1}},
        {"$sort": {"updated_at": 1}},
    ]
    # exclusive mode and bare full scans
    assert mongo_pipeline("u", 5, inclusive=False)[0] == {"$match": {"u": {"$gt": 5}}}
    assert mongo_pipeline() == []


def test_no_row_at_a_time_python_udfs_in_source():
    """Policy pin: every Python boundary must be Arrow-batched
    (pandas_udf / mapInPandas / applyInPandas). A row-at-a-time
    F.udf is 10-100x slower and must not enter the hot path."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1] / "cdc_data_pipeline_spark"
    offenders = []
    pat = re.compile(r"(?<!pandas_)\budf\s*\(|\bF\.udf\b|functions import udf\b")
    for p in root.rglob("*.py"):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if pat.search(line) and "pandas_udf" not in line:
                offenders.append(f"{p.name}:{i}: {line.strip()}")
    assert not offenders, offenders


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC joins parquet/JSON/CSV as a first-class scan format: full
    round trip, and the watermark predicate reaches the ORC scan as a
    pushed filter (row-group pruning on min/max, same as parquet)."""
    from cdc_data_pipeline_spark.sources.readers import (
        read_orc, read_table, write_orc)

    from pyspark.sql import functions as F

    orders = read_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    assert back.schema == orders.schema
    filtered = back.filter(
        F.col("o_orderdate") > F.lit("1997-06-01").cast("timestamp"))
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderdate" in plan.split(
        "PushedFilters")[1][:200]


def test_avro_gated_with_clear_error(spark, tmp_path):
    """Without spark-avro on the classpath the reader must fail with
    an actionable message, not a raw ClassNotFound."""
    import pytest

    from cdc_data_pipeline_spark.sources.readers import read_avro

    try:
        df = read_avro(spark, str(tmp_path / "nothing.avro"))
    except RuntimeError as exc:
        assert "spark.jars.packages" in str(exc)
    except Exception:
        raise
    else:  # classpath actually has avro: reading a missing path fails later
        with pytest.raises(Exception):
            df.count()
