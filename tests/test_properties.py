"""Property-based tests (hypothesis) for the CDC merge core.

The reference has no unit tests at all (SURVEY §5); these pin the
algebraic laws the merge strategies must satisfy on ANY input, not just
the fixture shapes: batch-at-a-time merging must agree with merge-all-
at-once, and SCD2 state must stay internally consistent over arbitrary
batch sequences.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators import incremental as inc
from cdc_data_pipeline_spark.operators import scd2

ROWS = st.lists(
    st.tuples(st.integers(0, 4),      # key
              st.integers(0, 6),      # tracking
              st.integers(0, 3)),     # value
    min_size=1, max_size=12,
)

SETTINGS = dict(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, t long, v long")


@given(b1=ROWS, b2=ROWS)
@settings(**SETTINGS)
def test_upsert_dedup_incremental_equals_batch(spark, b1, b2):
    """upsert_dedup batch-by-batch == latest_per_key over everything.

    tiebreaker: v desc — makes latest-record-wins total, so both
    evaluation orders must land on identical state.
    """
    d1, d2 = _df(spark, b1), _df(spark, b2)
    step = inc.upsert_dedup(inc.latest_per_key(d1, ["k"], "t", ["v"]),
                            d2, ["k"], "t", ["v"])
    # NOTE: upsert semantics: batch rows REPLACE target rows per key even
    # if the target had a higher tracking value (delete+insert, M2/M3).
    merged_keys = {r[0] for r in b2}
    expect_from_b2 = inc.latest_per_key(d2, ["k"], "t", ["v"])
    expect_from_b1 = inc.latest_per_key(
        d1.filter(~F.col("k").isin(list(merged_keys))), ["k"], "t", ["v"])
    expected = expect_from_b1.unionByName(expect_from_b2)
    assert sorted(map(tuple, step.collect())) == sorted(map(tuple, expected.collect()))


@given(b1=ROWS, b2=ROWS)
@settings(**SETTINGS)
def test_upsert_keys_partition_state(spark, b1, b2):
    """After upsert(target, batch): every batch key's rows come from the
    batch; every other key's rows are untouched target rows."""
    t = inc.latest_per_key(_df(spark, b1), ["k"], "t", ["v"])
    b = _df(spark, b2)
    out = inc.upsert(t, b, ["k"]).collect()
    batch_keys = {r[0] for r in b2}
    got_batch = sorted(tuple(r) for r in out if r.k in batch_keys)
    assert got_batch == sorted(map(tuple, b.collect()))
    got_rest = sorted(tuple(r) for r in out if r.k not in batch_keys)
    assert got_rest == sorted(
        tuple(r) for r in t.collect() if r.k not in batch_keys)


@given(seq=st.lists(st.dictionaries(st.integers(0, 3), st.integers(0, 2),
                                    min_size=1, max_size=4),
                    min_size=1, max_size=3))
@settings(**SETTINGS)
def test_scd2_invariants_over_batch_sequences(spark, seq):
    """For ANY sequence of (key -> check_value) batches:
    - exactly one open row per key ever seen,
    - the open row carries the key's most recent value,
    - closed intervals are well-formed and non-overlapping,
    - re-merging the final batch at a later ts changes nothing.
    """
    snap = None
    last_seen: dict[int, int] = {}
    for i, batch in enumerate(seq):
        rows = [(k, v) for k, v in sorted(batch.items())]
        df = spark.createDataFrame(rows, "user_id long, occ long")
        ts = f"2024-01-0{i + 1} 00:00:00"
        snap = scd2.scd2_merge(snap, df, ["user_id"], ["occ"], ts)
        last_seen.update(batch)
    state = snap.collect()

    open_rows = {r.user_id: r for r in state if r.dbt_valid_to is None}
    assert set(open_rows) == set(last_seen)          # one open row per key
    for k, r in open_rows.items():
        assert r.occ == last_seen[k]                 # open row = latest value

    by_key: dict[int, list] = {}
    for r in state:
        by_key.setdefault(r.user_id, []).append(r)
    for k, rows in by_key.items():
        assert sum(r.dbt_valid_to is None for r in rows) == 1
        closed = sorted((r for r in rows if r.dbt_valid_to is not None),
                        key=lambda r: r.dbt_valid_from)
        for r in closed:
            assert r.dbt_valid_from < r.dbt_valid_to
        for a, b in zip(closed, closed[1:]):
            assert a.dbt_valid_to <= b.dbt_valid_from  # no overlap

    # idempotency: same data at a later ts is a no-op
    final_rows = [(k, v) for k, v in sorted(last_seen.items())]
    df = spark.createDataFrame(final_rows, "user_id long, occ long")
    again = scd2.scd2_merge(snap, df, ["user_id"], ["occ"], "2024-02-01 00:00:00")
    assert sorted((r.user_id, r.occ, r.dbt_valid_from, r.dbt_valid_to)
                  for r in again.collect()) == \
           sorted((r.user_id, r.occ, r.dbt_valid_from, r.dbt_valid_to)
                  for r in state)


@given(b1=ROWS, b2=ROWS)
@settings(**SETTINGS)
def test_merge_without_deletes_equals_upsert(spark, b1, b2):
    """merge() with no delete/guard conditions must degenerate exactly
    to the delete+insert upsert (M2)."""
    from cdc_data_pipeline_spark.operators.merge import merge

    target = inc.latest_per_key(_df(spark, b1), ["k"], "t", ["v"])
    batch = inc.latest_per_key(_df(spark, b2), ["k"], "t", ["v"])
    via_merge = merge(target, batch, ["k"])
    via_upsert = inc.upsert(target, batch, ["k"])
    assert sorted(map(tuple, via_merge.collect())) == \
           sorted(map(tuple, via_upsert.collect()))


# ----------------------------------------------- round-2 operator laws

WORDS = st.sampled_from(["a", "b", "c", "d"])
DOCS = st.lists(st.lists(WORDS, min_size=0, max_size=12), min_size=1, max_size=6)


def _py_dup_spans(docs, n):
    """Reference implementation: maximal COVERED spans — a window at
    start p covers [p, p+n-1], and windows whose starts are <= n apart
    have connected coverage, so they merge into one span."""
    grams = {}
    for d, toks in enumerate(docs):
        for p in range(len(toks) - n + 1):
            grams.setdefault(tuple(toks[p:p + n]), []).append((d, p))
    hits = {}
    for occ in grams.values():
        if len(occ) >= 2:
            for d, p in occ:
                hits.setdefault(d, set()).add(p)
    spans = set()
    for d, ps in hits.items():
        run = None
        for p in sorted(ps):
            if run and p - run[1] <= n:
                run = (run[0], p)
            else:
                if run:
                    spans.add((d, run[0], run[1] + n - 1))
                run = (p, p)
        if run:
            spans.add((d, run[0], run[1] + n - 1))
    return spans


@given(docs=DOCS)
@settings(**SETTINGS)
def test_duplicated_spans_matches_python_reference(spark, docs):
    from cdc_data_pipeline_spark.operators.segments import duplicated_spans

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string")
    got = {(r["doc_id"], r["span_start"], r["span_end"])
           for r in duplicated_spans(df, n=2).collect()}
    assert got == _py_dup_spans(docs, 2)


CHANGES = st.lists(
    st.tuples(st.integers(0, 3),                      # key
              st.sampled_from(["c", "u", "d"]),       # op
              st.integers(0, 9)),                     # value
    min_size=0, max_size=12)


@given(seq=CHANGES)
@settings(**SETTINGS)
def test_apply_changes_matches_dict_replay(spark, seq):
    """Debezium change application == replaying the ops into a dict
    (ts = sequence position, so latest-wins is the last op per key)."""
    import json

    from cdc_data_pipeline_spark.streaming.debezium import (
        apply_changes, parse_debezium)
    from pyspark.sql import types as T

    payload = T.StructType([T.StructField("k", T.LongType()),
                            T.StructField("v", T.LongType())])
    envs = []
    for i, (k, op, v) in enumerate(seq):
        ts = 1700000000000 + i * 1000
        if op == "d":
            envs.append(json.dumps(
                {"before": {"k": k, "v": v}, "after": None, "op": "d", "ts_ms": ts}))
        else:
            envs.append(json.dumps(
                {"before": None, "after": {"k": k, "v": v}, "op": op, "ts_ms": ts}))
    raw = spark.createDataFrame([(e,) for e in envs] or [(None,)], "value string")
    changes = parse_debezium(raw, payload)
    out = {r["k"]: r["v"] for r in apply_changes(None, changes, ["k"]).collect()}
    # apply_changes on an empty target applies only non-delete latest rows
    expected = {}
    latest: dict = {}
    for k, op, v in seq:
        latest[k] = (op, v)
    for k, (op, v) in latest.items():
        if op != "d":
            expected[k] = v
    assert out == expected


@given(seq=CHANGES)
@settings(**SETTINGS)
def test_apply_changes_same_ms_resolves_by_kafka_offset(spark, seq):
    """Debezium ts_ms is millisecond-granular: ALL changes here share
    one ts_ms, so only the Kafka (partition, offset) tiebreak can
    order them. Latest-wins must mean last offset — including
    insert-then-delete collapsing to the delete."""
    import json

    from cdc_data_pipeline_spark.streaming.debezium import (
        apply_changes, parse_debezium)
    from pyspark.sql import types as T

    payload = T.StructType([T.StructField("k", T.LongType()),
                            T.StructField("v", T.LongType())])
    rows = []
    for i, (k, op, v) in enumerate(seq):
        body = {"k": k, "v": v}
        env = ({"before": body, "after": None, "op": "d", "ts_ms": 1700000000000}
               if op == "d" else
               {"before": None, "after": body, "op": op, "ts_ms": 1700000000000})
        rows.append((json.dumps(env), 0, i))
    raw = spark.createDataFrame(
        rows or [(None, 0, 0)], "value string, partition int, offset long")
    changes = parse_debezium(raw, payload)
    assert "_src_offset" in changes.columns
    out = {r["k"]: r["v"] for r in apply_changes(None, changes, ["k"]).collect()}
    expected = {}
    latest: dict = {}
    for k, op, v in seq:
        latest[k] = (op, v)
    for k, (op, v) in latest.items():
        if op != "d":
            expected[k] = v
    assert out == expected


GROUPED = st.lists(
    st.tuples(st.integers(0, 3),       # group
              st.integers(0, 9),       # order value
              st.integers(0, 999)),    # unique-ish id (tiebreak)
    min_size=1, max_size=24, unique_by=lambda r: r[2],
)


@given(rows=GROUPED, k=st.integers(1, 4))
@settings(**SETTINGS)
def test_group_topk_equals_python_reference(spark, rows, k):
    """group_topk == per-group sort + head(k) computed in Python, for
    any grouping, any k, including hot groups and singleton batches."""
    from cdc_data_pipeline_spark.operators import sampling as sp

    df = spark.createDataFrame(rows, "g long, val long, id long").repartition(3)
    got = sorted(tuple(r) for r in sp.group_topk(
        df, ["g"], k, [("val", False), ("id", True)]).collect())
    by_g = {}
    for g, val, i in rows:
        by_g.setdefault(g, []).append((val, i))
    expect = []
    for g, vs in by_g.items():
        for val, i in sorted(vs, key=lambda t: (-t[0], t[1]))[:k]:
            expect.append((g, val, i))
    assert got == sorted(expect)


@given(ids=st.lists(st.integers(0, 10**6), min_size=1, max_size=30,
                    unique=True),
       n=st.integers(1, 8))
@settings(**SETTINGS)
def test_deterministic_shuffle_is_bijective_and_stable(spark, ids, n):
    """(shard, pos) is dense per shard, covers every row, and is
    invariant to input partitioning."""
    from cdc_data_pipeline_spark.operators.shuffle import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = deterministic_shuffle(df, "doc_id", n, seed=4).collect()
    assert len(out) == len(ids)
    by_shard = {}
    for r in out:
        assert 0 <= r.shard_id < n
        by_shard.setdefault(r.shard_id, []).append(r.pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    again = deterministic_shuffle(df.repartition(5), "doc_id", n, seed=4).collect()
    assert sorted((r.doc_id, r.shard_id, r.pos) for r in out) == \
        sorted((r.doc_id, r.shard_id, r.pos) for r in again)


NULLABLE_GROUPED = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 2)),   # nullable group
              st.one_of(st.none(), st.integers(0, 9)),   # nullable order
              st.integers(0, 999)),                      # unique tiebreak
    min_size=1, max_size=20, unique_by=lambda r: r[2],
)


@given(rows=NULLABLE_GROUPED, k=st.integers(1, 3),
       asc=st.booleans())
@settings(**SETTINGS)
def test_group_topk_null_property_matches_window(spark, rows, k, asc):
    """For ANY mix of null group keys and null order values (the r3
    advice failure class), group_topk must equal the plain Spark rank
    window in both sort directions."""
    from pyspark.sql import Window

    from cdc_data_pipeline_spark.operators import sampling as sp

    def nkey(t):
        return tuple((x is None, x) for x in t)

    df = spark.createDataFrame(
        rows, "g long, val long, id long").repartition(3)
    got = sorted((tuple(r) for r in sp.group_topk(
        df, ["g"], k, [("val", asc), ("id", True)]).collect()), key=nkey)
    order = F.col("val").asc() if asc else F.col("val").desc()
    w = Window.partitionBy("g").orderBy(order, F.col("id").asc())
    expect = sorted((tuple(r) for r in
                     df.withColumn("__rn", F.row_number().over(w))
                     .filter(F.col("__rn") <= k).drop("__rn").collect()),
                    key=nkey)
    assert got == expect


MIX_DOCS = st.lists(
    st.tuples(st.integers(0, 999),                       # unique doc id
              st.sampled_from(["a", "b", "c"])),         # domain
    min_size=3, max_size=30, unique_by=lambda r: r[0],
)


@given(rows=MIX_DOCS, epochs=st.sampled_from([1.0, 1.5, 2.0, 3.0]))
@settings(**SETTINGS)
def test_mixture_repeat_python_reference(spark, rows, epochs):
    """mixture_repeat's multiset == the python reference computation
    (same T = min(n_d*E/p_d), same floor+fractional-hash copies), for
    any corpus composition and epoch cap; epochs dense from 0."""
    from cdc_data_pipeline_spark.functions.hashing import py_uniform_hash
    from cdc_data_pipeline_spark.operators import sampling as sp

    w = {"a": 0.5, "b": 0.3, "c": 0.2}
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted((r.doc_id, r.epoch) for r in
                 sp.mixture_repeat(df, "source", w, "doc_id",
                                   max_epochs=epochs, seed=3).collect())
    n = {}
    for _, d in rows:
        n[d] = n.get(d, 0) + 1
    present = [d for d in sorted(w) if n.get(d)]
    if not present:
        assert got == []
        return
    cap = min(n[d] * epochs / w[d] for d in present)
    rates = {d: w[d] * cap / n[d] for d in present}
    import math
    expect = []
    for i, d in rows:
        if d not in rates:
            continue
        r = rates[d]
        c = int(math.floor(r)) + (1 if py_uniform_hash(str(i), 3) < r - math.floor(r) else 0)
        expect.extend((i, e) for e in range(c))
    assert got == sorted(expect)


TOKCOUNTS = st.lists(st.integers(0, 40), min_size=0, max_size=25)


@given(counts=TOKCOUNTS, seq_len=st.integers(1, 17))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pack_sequences_tiling_invariants(spark, counts, seq_len):
    """For ANY token-count sequence and window size: (1) fragments
    tile each document exactly (contiguous doc offsets summing to its
    count); (2) every window except the last holds exactly seq_len
    tokens; (3) window offsets never exceed seq_len; (4) zero-token
    docs vanish."""
    from cdc_data_pipeline_spark.operators.packing import pack_sequences

    rows = [(i, c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_sequences(df, seq_len, "n_tok", "doc_id", chunk=4).collect()
    total = sum(c for _, c in rows)
    by_doc, by_seq = {}, {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
        by_seq[r["seq_id"]] = by_seq.get(r["seq_id"], 0) + r["frag_len"]
        assert 0 <= r["seq_offset"] < seq_len
        assert 0 < r["frag_len"] <= seq_len
    for i, c in rows:
        if c == 0:
            assert i not in by_doc
            continue
        frags = sorted(by_doc[i], key=lambda r: r["doc_offset"])
        assert frags[0]["doc_offset"] == 0
        assert sum(f["frag_len"] for f in frags) == c
        for a, z in zip(frags, frags[1:]):
            assert z["doc_offset"] == a["doc_offset"] + a["frag_len"]
    if total:
        n_seq = (total + seq_len - 1) // seq_len
        assert set(by_seq) == set(range(n_seq))
        for sid, n in by_seq.items():
            assert n == (seq_len if sid < n_seq - 1 else total - seq_len * (n_seq - 1))
    else:
        assert not by_seq


BATCHES = st.lists(
    st.lists(st.tuples(st.integers(0, 3),        # key
                       st.integers(0, 3),        # value
                       st.booleans()),           # hard delete?
             min_size=1, max_size=5),
    min_size=1, max_size=3)


@given(batches=BATCHES)
@settings(**SETTINGS | {"max_examples": 5})
def test_feed_family_invariants_any_op_sequence(spark, batches):
    """The bucketed feed family's algebraic contract on ANY op
    sequence (random upsert/delete mixes, repeated keys, deletes of
    absent keys, whole batches that change nothing): the final table
    equals a dict-model replay; a replica applied from the feed ALONE
    equals the table; time travel at the newest commit equals the
    table; and a mart folded from the feed's preimage/postimage
    deltas equals a full recompute. One test, four consumers of the
    same feed — any missed preimage, dropped commit, or misclassified
    op breaks at least one equality."""
    import shutil
    import tempfile

    from cdc_data_pipeline_spark.operators.incremental import (
        agg_deltas_from_feed, apply_changes, merge_agg_deltas,
        read_changes, table_at, upsert_bucketed)

    root = tempfile.mkdtemp(prefix="cdc_prop_")
    try:
        path, rep = root + "/t", root + "/r"
        state: dict = {}
        ts_base = 0
        for batch in batches:
            rows = [(k, v, ts_base + i, d)
                    for i, (k, v, d) in enumerate(batch)]
            ts_base += len(batch)
            per: dict = {}
            for k, v, ts, d in rows:        # latest op per key wins
                if k not in per or ts > per[k][1]:
                    per[k] = (v, ts, d)
            for k, (v, ts, d) in per.items():
                if d:
                    state.pop(k, None)
                else:
                    state[k] = (v, ts)
            df = spark.createDataFrame(
                rows, "k long, v long, ts long, is_del boolean")
            upsert_bucketed(spark, path, df, ["k"], "ts", n_buckets=4,
                            delete_col="is_del", emit_changes=True,
                            update_preimages=True)

        def rows_of(p):
            try:
                return {(r["k"], r["v"], r["ts"]) for r in
                        spark.read.parquet(p)
                        .select("k", "v", "ts").collect()}
            except Exception:
                return set()            # drained table: no data files

        want = {(k, v, ts) for k, (v, ts) in state.items()}
        assert rows_of(path) == want

        feed = read_changes(spark, path)
        if feed is None:                 # nothing ever changed
            assert want == set()
            return
        apply_changes(spark, feed, rep, ["k"], n_buckets=4)
        assert rows_of(rep) == want

        got_t = {(r["k"], r["v"], r["ts"]) for r in
                 table_at(spark, path, 10**9)
                 .select("k", "v", "ts").collect()}
        assert got_t == want

        deltas = agg_deltas_from_feed(
            feed.withColumn("g", F.col("k") % 2), ["g"], ["v"])
        mart = {(r["g"], r["delta_v"], r["delta_count"]) for r in
                merge_agg_deltas(None, deltas, ["g"]).collect()}
        from collections import defaultdict
        sums: dict = defaultdict(lambda: [0, 0])
        for k, (v, _ts) in state.items():
            sums[k % 2][0] += v
            sums[k % 2][1] += 1
        assert mart == {(g, s, c) for g, (s, c) in sums.items()}

        # fifth consumer: the independent structural + deep auditor —
        # every state the protocol can legitimately reach must fsck
        # clean (table bucketed where keys hash, feed replay == table,
        # dense commits, coherent pointer)
        from cdc_data_pipeline_spark.operators.incremental import (
            fsck_table)

        audit = fsck_table(spark, path, deep=True)
        assert audit["ok"] and audit["warnings"] == 0, audit["findings"]
    finally:
        shutil.rmtree(root, ignore_errors=True)
