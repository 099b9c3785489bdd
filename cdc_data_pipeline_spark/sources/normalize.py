"""Document-normalization operators (extract-side row transforms).

Re-expresses the reference's per-document Python loops (reference:
mongo_loader.py:62-130 — field deletion, one-level flatten, ObjectId/
datetime normalization, ``$``-key sanitization) as schema-driven Column
expressions. No UDFs: every transform compiles to native Catalyst
expressions, so it runs JVM-side inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$")
_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def drop_fields(df: DataFrame, paths: list[str]) -> DataFrame:
    """Remove top-level or one-deep nested fields (P2).

    Reference: mongo_loader.py:62-85 ``_delete_fields_from_doc`` with
    dotted paths like ``a.b``. Nested drops use ``Column.dropFields``
    (struct rebuild, still codegen'd).
    """
    for path in paths:
        if "." in path:
            top, _, nested = path.partition(".")
            if top in df.columns:
                df = df.withColumn(top, F.col(top).dropFields(nested))
        elif path in df.columns:
            df = df.drop(path)
    return df


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """One-level struct flatten (P3): ``{a: {b: 1}}`` -> column ``a_b``.

    Reference: mongo_loader.py:122-130 ``_flatten_document``.
    """
    cols = []
    for field in df.schema.fields:
        if isinstance(field.dataType, T.StructType):
            for sub in field.dataType.fields:
                cols.append(F.col(f"`{field.name}`.`{sub.name}`").alias(f"{field.name}{sep}{sub.name}"))
        else:
            cols.append(F.col(f"`{field.name}`"))
    return df.select(*cols)


def sanitize_keys(df: DataFrame, strip: str = "$") -> DataFrame:
    """Strip a character from all column names (P6).

    Reference: mongo_loader.py:97-100 strips BSON ``$`` markers via a
    JSON dump/replace/load round-trip; here it is a zero-cost rename.
    """
    return df.toDF(*[c.replace(strip, "") for c in df.columns])


def normalize_document_frame(df: DataFrame, stringify_nested: bool = False) -> DataFrame:
    """Apply the Mongo-document normalization pipeline (P4/P5 analogue).

    ObjectId->string and datetime->string become casts / ``date_format``;
    nested structures optionally serialize to JSON strings to mirror the
    reference's warehouse layout (mongo_loader.py:122-130,
    base_loader.py:837-838).
    """
    out = df
    for field in df.schema.fields:
        if stringify_nested and isinstance(field.dataType, (T.StructType, T.ArrayType, T.MapType)):
            out = out.withColumn(field.name, F.to_json(F.col(field.name)))
    return out


def infer_refined_schema(df: DataFrame, sample_rows: int = 1000, probe_values: int = 20):
    """Schema refinement over string-typed JSON columns (S7 analogue).

    Mirrors the reference's inference rules (base_loader.py:762-855):
    sample <= ``sample_rows`` rows; for each string column, if >= 80% of
    the first ``probe_values`` non-null values match the timestamp regex
    -> TimestampType, date regex -> DateType; mixed/other stays string.
    Returns {column: refined Spark type}. Driver-side sampling only — the
    actual cast is then a distributed ``to_timestamp``/``to_date``.
    """
    string_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    if not string_cols:
        return {}
    sample = df.select(*string_cols).limit(sample_rows).collect()
    refined: dict[str, T.DataType] = {}
    for c in string_cols:
        values = [r[c] for r in sample if r[c] is not None][:probe_values]
        if not values:
            continue
        ts_hits = sum(1 for v in values if isinstance(v, str) and _TS_RE.match(v))
        date_hits = sum(1 for v in values if isinstance(v, str) and _DATE_RE.match(v))
        if ts_hits / len(values) >= 0.8:
            refined[c] = T.TimestampType()
        elif date_hits / len(values) >= 0.8:
            refined[c] = T.DateType()
    return refined


def infer_document_schema(docs, sample_rows: int = 1000,
                          probe_values: int = 20) -> T.StructType:
    """Full schema vote over raw semi-structured documents (S7).

    Mirrors the reference's table-creation inference
    (base_loader.py:762-855) for a staged JSON batch whose target table
    does not exist yet:

    - sample <= ``sample_rows`` documents and take the UNION of all
      keys (a key absent from early docs still gets a column);
    - vote one type per column from its non-null sampled values:
      bool -> Boolean, int -> Long, float (or int+float mix, which the
      reference's float() coercion makes indistinguishable) -> Double;
    - MIXED python types -> String (base_loader.py:808-813);
    - nested dict/list -> String (stored as serialized JSON,
      base_loader.py:837-838);
    - string columns refine by the >=80% regex vote over the first
      ``probe_values`` values: timestamp-pattern -> Timestamp,
      date-pattern -> Date, otherwise String;
    - a column with NO non-null sample -> nullable String
      (base_loader.py:788-791).

    Driver-side over a bounded sample, like the reference; the
    returned StructType then drives a distributed ``spark.read.json``
    / ``apply_refined_schema`` pass.
    """
    sample = list(docs)[:sample_rows]
    keys: list[str] = []
    for d in sample:
        for k in d:
            if k not in keys:
                keys.append(k)

    fields = []
    for k in keys:
        values = [d[k] for d in sample if d.get(k) is not None]
        dtype: T.DataType = T.StringType()
        if values:
            # bool is a subclass of int: check it first, and treat a
            # bool/int mixture as MIXED, not as int
            py_types = {bool if isinstance(v, bool) else type(v) for v in values}
            if py_types == {bool}:
                dtype = T.BooleanType()
            elif py_types == {int}:
                dtype = T.LongType()
            elif py_types in ({float}, {int, float}):
                dtype = T.DoubleType()
            elif py_types == {str}:
                probe = values[:probe_values]
                ts_hits = sum(1 for v in probe if _TS_RE.match(v))
                date_hits = sum(1 for v in probe if _DATE_RE.match(v))
                if ts_hits / len(probe) >= 0.8:
                    dtype = T.TimestampType()
                elif date_hits / len(probe) >= 0.8:
                    dtype = T.DateType()
            # dict/list or mixed python types -> String fallback
        fields.append(T.StructField(k, dtype, nullable=True))
    return T.StructType(fields)


def apply_refined_schema(df: DataFrame, refined) -> DataFrame:
    out = df
    for c, dtype in refined.items():
        if isinstance(dtype, T.TimestampType):
            out = out.withColumn(c, F.to_timestamp(c, "yyyy-MM-dd HH:mm:ss"))
        elif isinstance(dtype, T.DateType):
            out = out.withColumn(c, F.to_date(c, "yyyy-MM-dd"))
        else:
            out = out.withColumn(c, F.col(c).cast(dtype))
    return out


def schema_diff(old: T.StructType, new: T.StructType) -> dict:
    """CDC schema-evolution report between two extract snapshots:
    ``added`` / ``removed`` column names and ``changed`` name ->
    (old_type, new_type) pairs (simpleString form). The decision input
    for evolve-vs-fail policies (the reference recreates staging
    tables on drift; ``align_to_schema`` below is the permissive
    evolve path)."""
    o = {f.name: f.dataType.simpleString() for f in old.fields}
    n = {f.name: f.dataType.simpleString() for f in new.fields}
    return {
        "added": sorted(set(n) - set(o)),
        "removed": sorted(set(o) - set(n)),
        "changed": {k: (o[k], n[k]) for k in sorted(set(o) & set(n))
                    if o[k] != n[k]},
    }


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Evolve ``df`` onto ``target``: missing columns appear as typed
    NULLs, extra columns drop, shared columns cast. Column order
    follows ``target`` so unions across snapshot generations line up
    positionally as well as by name."""
    have = {f.name for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
