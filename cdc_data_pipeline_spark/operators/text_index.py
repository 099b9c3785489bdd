"""Persisted inverted text index: build once, BM25-search with
partition pruning, maintain incrementally — the lexical sibling of the
persisted ANN indexes (``operators/index.py``), completing the quartet
(MinHash-LSH, IVF, IVF-PQ, inverted text).

``terms.bm25_topk`` recomputes postings per query batch — right for
one-shot jobs, wrong for a serving corpus written once and queried
forever. This module materializes the index LSM-style:

    <path>/meta.json               {"n_buckets": N} — the partition
                                   modulus is index METADATA: a reader
                                   must prune with the writer's layout
    <path>/BASE                    pointer file naming the CURRENT
                                   base generation (atomic publish)
    <path>/base-<gen>/postings/tb=K/  (token, doc_id, tf) by
                                   token-hash bucket — a query touches
                                   only its own terms' directories
    <path>/base-<gen>/doclens/db=K/   (doc_id, dl) by doc-hash bucket;
                                   dl=0 rows keep token-less documents
                                   visible to dedup and n_docs
    <path>/base-<gen>/vocab/tb=K/  (token, df) — exact in base
    <path>/base-<gen>/stats/       one (n_docs, total_len) row
    <path>/base-<gen>/compacted.json  delta dirs folded INTO this base
    <path>/delta/<token>/...       one DIRECTORY per committed batch
                                   holding the same four sub-tables;
                                   upsert/delete deltas additionally
                                   carry tombstones/db=K/ rows
                                   (doc_id, victim root) and a NET
                                   stats correction row
    <path>/delta/<token>/_COMMIT   marker written LAST

Base generations are IMMUTABLE once published: a writer stages the
full ``base-<gen>`` directory, then atomically publishes the ``BASE``
pointer (``fsutil.publish_text`` — os.replace locally, a single PUT on
object stores). A reader resolves the pointer ONCE and every
subsequent scan targets that immutable generation plus the delta set
its manifest admits — compaction swapping the pointer mid-query cannot
mix a new base with the old base's delta view. Superseded generations
and folded deltas are garbage-collected with a ONE-GENERATION GRACE:
publishing generation G+1 deletes only generations < G and the deltas
generation G's own manifest had already excluded, so any reader that
resolved G (or G+1) keeps every directory it can reach until a SECOND
compaction completes. Long-lived query plans should be consumed within
one compaction cycle.

Append idempotency is structural, not best-effort: the batch digest
names the delta directory, every sub-table is written with OVERWRITE
into that directory, and the commit marker lands last — so a replayed
batch (foreachBatch is at-least-once) either sees its marker and
no-ops, or re-overwrites the same partially-written directory and
converges. Uncommitted directories are invisible to search.

CDC-complete: beyond insert-only ``append_to_text_index``, the index
takes latest-wins ``upsert_into_text_index`` and
``delete_from_text_index`` — the reference's delete+insert merge
(base_loader.py:241-249) applied to an inverted index. Mutations
never rewrite data: each commits ONE delta whose ``tombstones`` table
names its victims as (doc_id, root) — ROOT-ADDRESSED, exploiting the
invariant that an id has exactly one live copy, so no cross-delta
ordering metadata is ever needed — plus a net stats correction row.
Search filters every per-doc relation through the kill set
(candidate-bounded, like doclens), derives df from the visible
postings (so idf re-prices exactly), and sums the additive stats
rows; n_docs / total_len / df / avgdl therefore stay EXACT through
any insert/upsert/delete mix — incremental ingest shifts idf and
avgdl for every document, and this layout prices that correctly
instead of serving stale statistics. Compaction resolves all
tombstones into a clean generation.

Scale: the postings write is the only full-corpus shuffle; search
reads probed token buckets of base + committed deltas (compaction
bounds the delta count), doclens is read candidate-bounded (only the
doc-hash buckets of documents that matched a probed posting — never
the corpus-cardinality table in full), and scoring reuses
``terms.score_bm25_postings`` (the hoisted-factor plan with the
skew-safe group_topk rank).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.text import tokens
from cdc_data_pipeline_spark.operators import lsm
from cdc_data_pipeline_spark.operators.terms import score_bm25_postings
from cdc_data_pipeline_spark.sources import fsutil
from cdc_data_pipeline_spark.sources.fsutil import path_join

# the generation/pointer/tombstone machinery is the SHARED protocol in
# ``operators/lsm.py`` (the ANN indexes speak it too); this module
# keeps thin private wrappers so its storage layout reads as one piece
COMMIT = lsm.COMMIT
BASE_PTR = lsm.BASE_PTR


def _tb(col, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def _meta(spark: SparkSession, path: str) -> dict:
    txt = fsutil.read_text(spark, path_join(path, "meta.json"))
    if txt is None:
        raise FileNotFoundError(f"not a text index (no meta.json): {path}")
    return json.loads(txt)


def _gen_name(gen: int) -> str:
    return lsm.gen_name(gen)


def _base_names(spark: SparkSession, path: str) -> list[str]:
    return lsm.base_names(spark, path)


def _current_base_name(spark: SparkSession, path: str) -> str | None:
    """The published generation (pointer content), falling back to the
    legacy un-generationed ``base`` layout for indexes written before
    the pointer protocol."""
    return lsm.current_base_name(spark, path)


def _base_root(spark: SparkSession, path: str) -> str:
    """The base directory to READ, resolved ONCE per operation from
    the atomically-published pointer; everything underneath it is
    immutable, so all later lazy scans of the same operation see one
    consistent generation."""
    name = _current_base_name(spark, path)
    if name is None:
        raise FileNotFoundError(f"text index has no published base: {path}")
    return path_join(path, name)


def _committed_deltas(spark: SparkSession, path: str,
                      base_root: str) -> list[str]:
    return lsm.committed_deltas(spark, path, base_root)


def _root_pairs(spark: SparkSession, path: str,
                base_root: str) -> list[tuple[str, str]]:
    base_name = base_root.rstrip("/").rsplit("/", 1)[-1]
    return lsm.root_pairs(spark, path, base_name, base_root)


def _read_union(spark: SparkSession, roots: list[str], table: str,
                bucket_col: str | None = None,
                buckets: list[int] | None = None) -> DataFrame | None:
    return lsm.read_union(spark, roots, table, bucket_col, buckets)


def _read_union_tagged(spark: SparkSession, pairs: list[tuple[str, str]],
                       table: str, bucket_col: str | None = None,
                       buckets: list[int] | None = None) -> DataFrame | None:
    return lsm.read_union_tagged(spark, pairs, table, bucket_col, buckets)


def _kills(spark: SparkSession, pairs: list[tuple[str, str]],
           dbs: list[int] | None, id_col: str) -> DataFrame | None:
    """Kill set candidate-bounded by the same doc-hash bucket list as
    the doclens read; ``dbs`` None means UNBOUNDED (the compaction
    fold)."""
    return lsm.kills(spark, pairs, id_col, "db", dbs)


def _visible(df: DataFrame | None, kills: DataFrame | None,
             id_col: str) -> DataFrame | None:
    return lsm.visible(df, kills, id_col)


def _dedup_batch(batch: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deterministic within-batch dedup: one row per id (max text as
    the tiebreak). CDC callers with a real version column should
    pre-apply ``incremental.latest_per_key`` — this guard only makes
    accidental duplicate delivery harmless, it does not order
    versions."""
    return (batch.select(id_col, text_col)
            .groupBy(id_col).agg(F.max(text_col).alias(text_col)))


def _batch_token(batch: DataFrame, text_col: str, id_col: str,
                 kind: str = "b") -> str:
    """Content digest naming the batch's delta directory (see
    ``lsm.content_token`` for the hashing contract)."""
    return lsm.content_token(batch, [id_col, text_col], kind)


def _ids_token(ids: DataFrame, id_col: str) -> str:
    """Content digest for an id-only batch (the delete shape)."""
    return lsm.content_token(ids, [id_col], "d")


def _salt_past_manifest(spark: SparkSession, base: str, token: str) -> str:
    return lsm.salt_past_manifest(spark, base, token)


def _write_tombstones(spark: SparkSession, ddir: str, victims: DataFrame,
                      id_col: str, n_buckets: int) -> None:
    """Persist the delta's kill set, doc-hash-bucketed like doclens so
    search reads it candidate-bounded. ``victims`` is (id, __root)."""
    lsm.write_tombstones(spark, ddir, victims, id_col,
                         _tb(F.col(id_col), n_buckets).alias("db"))


def _index_tables(fresh: DataFrame, n_buckets: int, text_col: str,
                  id_col: str):
    """(postings, doclens, vocab, stats_row) for a document set.
    doclens keeps dl=0 rows for token-less documents (they count in
    n_docs and must be visible to the append dedup); postings/vocab
    naturally exclude them."""
    ex = fresh.select(F.col(id_col),
                      F.explode(tokens(text_col)).alias("token"))
    tf = ex.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf")) \
           .localCheckpoint(eager=True)  # one tokenize pass feeds all tables
    postings = tf.withColumn("tb", _tb(F.col("token"), n_buckets))
    dl = (fresh.select(id_col)
          .join(tf.groupBy(id_col).agg(F.sum("tf").alias("dl")),
                id_col, "left")
          .select(id_col, F.coalesce("dl", F.lit(0)).alias("dl")))
    doclens = dl.withColumn("db", _tb(F.col(id_col), n_buckets))
    vocab = (tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
             .withColumn("tb", _tb(F.col("token"), n_buckets)))
    row = dl.agg(F.count(F.lit(1)).alias("n"),
                 F.sum("dl").alias("t")).collect()[0]
    return postings, doclens, vocab, (int(row["n"]), int(row["t"] or 0))


def _write_tables(spark: SparkSession, root: str, postings, doclens, vocab,
                  stats_row) -> None:
    """Write the four sub-tables. EMPTY frames are skipped entirely (a
    parquet directory with no part files cannot be re-read — schema
    inference fails); ``_read_union`` treats the absent directory as
    zero rows. stats is always written (a literal row, never empty)."""
    for df, name, part in ((postings, "postings", "tb"),
                           (doclens, "doclens", "db"),
                           (vocab, "vocab", "tb")):
        if df is not None and not df.isEmpty():
            df.write.mode("overwrite").partitionBy(part) \
                .parquet(path_join(root, name))
    spark.createDataFrame([stats_row], "n_docs long, total_len long") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(path_join(root, "stats"))


def _publish_base(spark: SparkSession, path: str, new_name: str,
                  keep: set[str], gc_deltas: list[str],
                  expect_ptr=lsm._UNCHECKED) -> None:
    lsm.publish_base(spark, path, new_name, keep, gc_deltas,
                     expect_ptr=expect_ptr)


def build_text_index(spark: SparkSession, corpus: DataFrame, path: str,
                     n_buckets: int = 16, text_col: str = "text",
                     id_col: str = "doc_id") -> dict:
    """Tokenize, aggregate, and persist the base tables as a NEW base
    generation, then atomically publish the ``BASE`` pointer. A build
    is a full rewrite: its manifest names every pre-existing delta (so
    the instant the pointer lands they are logically excluded), and
    the GC pass then removes them plus superseded generations. Not
    concurrent-safe with other MAINTENANCE (single-maintainer
    contract); searches that resolved the previous pointer keep
    working through the one-generation grace. ``n_buckets`` is
    IMMUTABLE once an index exists: the partition layout on disk and
    the reader's probe hash must agree, so changing it requires
    deleting the index — rebuilding in place with a different modulus
    would have a crash window serving silently incomplete prunes.
    Returns {n_docs, n_postings}."""
    meta_path = path_join(path, "meta.json")
    txt = fsutil.read_text(spark, meta_path)
    if txt is not None and json.loads(txt)["n_buckets"] != n_buckets:
        raise ValueError(
            f"index at {path} was built with n_buckets="
            f"{json.loads(txt)['n_buckets']}; delete it to change the "
            f"bucket layout (requested {n_buckets})")
    postings, doclens, vocab, stats_row = _index_tables(
        corpus.select(id_col, text_col), n_buckets, text_col, id_col)
    cur = _current_base_name(spark, path)
    new_name = lsm.next_gen_name(spark, path)
    new = path_join(path, new_name)
    fsutil.delete(spark, new)
    _write_tables(spark, new, postings, doclens, vocab, stats_row)
    # a rebuild supersedes every existing delta: exclude them all
    # logically before the publish. GC only the deltas the superseded
    # generation had ALREADY excluded — the rest stay one grace cycle
    # for readers still holding the old pointer, invisible to new
    # readers through the manifest either way
    stale = lsm.rebuild_manifest(spark, path, new)
    fsutil.write_text(spark, meta_path, json.dumps({"n_buckets": n_buckets}))
    gc = lsm.rebuild_gc_list(spark, path, cur, stale)
    keep = {new_name} | ({cur} if cur else set())
    _publish_base(spark, path, new_name, keep, gc)
    return {"n_docs": stats_row[0], "n_postings": postings.count()}


def search_text_index(spark: SparkSession, path: str, queries: DataFrame,
                      k: int = 5, k1: float = 1.2, b: float = 0.75,
                      text_col: str = "text", id_col: str = "doc_id",
                      exclude_self: bool = False,
                      exclude_pairs: DataFrame | None = None,
                      materialize_candidates: bool = True) -> DataFrame:
    """BM25 top-k over the persisted index, touching only the query
    vocabulary's postings/vocab buckets in base + committed deltas and
    only the candidate documents' doclens buckets. READ-ONLY and
    SNAPSHOT-CONSISTENT alongside maintenance: the base generation is
    resolved once from the atomically-published pointer, and that
    generation plus the deltas its manifest admits are immutable — a
    concurrent compaction publishes a NEW generation and only
    garbage-collects this one after a further full compaction cycle.

    ``exclude_self`` defaults OFF: the query frame is an arbitrary
    external id space here, and a query id that merely COINCIDES with
    a corpus doc_id is a legitimate hit. Pass True for the
    more-like-this shape (queries drawn from the corpus itself), which
    then matches ``terms.bm25_topk`` exactly on the same corpus
    (query_id, neighbor_id, bm25, rank).

    ``exclude_pairs`` (optional ``(id_a, id_b)`` frame) drops named
    query/neighbor pairs BEFORE ranking so the top-k backfills past
    them — the hard-negative-mining shape (known positives must not
    consume result slots), identical semantics to ``bm25_topk``.

    ``materialize_candidates`` (default ON) localCheckpoints the
    query-vocabulary slice of the pruned postings, so the candidate
    doc-bucket derivation and the scoring job share ONE scan of the
    probed postings buckets instead of two. Pass False to keep the
    whole plan lazy over the parquet roots — the shape plan-inspection
    tooling wants (the partition-pruning filters stay visible in the
    final plan) at the cost of a second read of the probed buckets."""
    n_buckets = _meta(spark, path)["n_buckets"]
    base = _base_root(spark, path)
    pairs = _root_pairs(spark, path, base)
    qt = (queries.select(F.col(id_col).alias("query_id"),
                         F.explode(tokens(text_col)).alias("token"))
          .distinct().localCheckpoint(eager=True))
    # probed bucket set: <= |query vocabulary| ids, driver-side and
    # tiny — becomes a static IN-filter so every root's scan prunes
    # unprobed tb= directories before any file is opened
    buckets = [r[0] for r in qt.select(
        _tb(F.col("token"), n_buckets).alias("tb")).distinct().collect()]
    postings = _read_union_tagged(spark, pairs, "postings", "tb", buckets)
    if postings is None:
        idt = dict(queries.dtypes)[id_col]
        return spark.createDataFrame(
            [], f"query_id {idt}, neighbor_id {idt}, bm25 double, rank int")
    # candidate postings: only rows whose token is in the query
    # vocabulary score anything, and only their documents need a
    # length norm — checkpoint this (query-bounded) slice so the
    # doc-bucket derivation, the visibility filter, the exact df
    # aggregation, and the scoring join all read the probed parquet
    # buckets exactly once
    cand0 = postings.join(F.broadcast(qt.select("token").distinct()), "token")
    if materialize_candidates:
        cand0 = cand0.localCheckpoint(eager=True)
    # candidate-bounded doclens/tombstones: derive the candidates'
    # doc-hash bucket set (pre-visibility superset — pruning only) and
    # prune db= directories the same way the postings scan pruned tb=
    # — no search ever reads a corpus-cardinality table in full
    dbs = [r[0] for r in cand0.select(
        _tb(F.col(id_col), n_buckets).alias("db")).distinct().collect()]
    kills = _kills(spark, pairs, dbs, id_col)
    cand = _visible(cand0, kills, id_col).select(F.col(id_col), "token", "tf")
    # exact df for the probed vocabulary, FROM the visible candidate
    # postings themselves (one row per (doc, token)) — upsert/delete
    # tombstones are priced into idf without any correction table
    dfreq = cand.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    dl = (_visible(_read_union_tagged(spark, pairs, "doclens", "db", dbs),
                   kills, id_col)
          .select(F.col(id_col), "dl"))
    # stats rows are ADDITIVE across roots: upsert/delete deltas carry
    # correction rows (negative doc/length terms for their victims)
    stats = (_read_union(spark, [p for _, p in pairs], "stats")
             .agg(F.sum("n_docs").alias("n_docs"),
                  F.sum("total_len").alias("total_len")))
    return score_bm25_postings(
        cand, qt, dl, dfreq,
        stats, k=k, k1=k1, b=b, id_col=id_col, query_id_col="query_id",
        exclude_self=exclude_self, exclude_pairs=exclude_pairs)


def append_to_text_index(spark: SparkSession, path: str, batch: DataFrame,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> dict:
    """CDC-shape maintenance: tokenize a NEW document batch and commit
    it as one delta directory — no rewrite of any base or prior-delta
    file. Search statistics stay EXACT after appends because search
    sums the deltas. Unlike the ANN indexes (whose cells drift until
    rebuild), there is no staleness to manage — only delta-count
    growth, bounded by ``compact_text_index``.

    IDEMPOTENT under at-least-once redelivery at EVERY crash point:
    the content digest of the (deduped) batch names the delta
    directory; a replay after full commit sees the marker and no-ops,
    and a replay after a partial write overwrites the same directory
    — uncommitted directories are invisible to search either way.
    Duplicate ids inside the batch are collapsed deterministically
    first (``_dedup_batch``); ids already in the index (base or
    committed deltas) are anti-joined away, reading only the batch's
    own doc-hash buckets.

    Digest names the current generation's manifest has EXCLUDED are
    salted: after a rebuild, a grace-retained folded delta directory
    may still carry a stale ``_COMMIT`` under this batch's digest —
    trusting it would silently drop the re-appended documents (the
    manifest keeps the name invisible forever and the next compact
    GCs the directory). The salt is derived from the manifest itself,
    so a crash-replay against the same generation re-derives the same
    salted name and stays idempotent; across a compaction boundary
    the anti-join converges the replay instead."""
    n_buckets = _meta(spark, path)["n_buckets"]
    batch0 = _dedup_batch(batch, text_col, id_col).localCheckpoint(eager=True)
    base = _base_root(spark, path)
    token = _salt_past_manifest(
        spark, base, _batch_token(batch0, text_col, id_col))
    ddir = path_join(path, "delta", token)
    if fsutil.exists(spark, path_join(ddir, COMMIT)):
        return {"appended": 0, "batch": token}
    dbs = [r[0] for r in batch0.select(
        _tb(F.col(id_col), n_buckets).alias("db")).distinct().collect()]
    pairs = _root_pairs(spark, path, base)
    kills = _kills(spark, pairs, dbs, id_col)
    existing = _visible(
        _read_union_tagged(spark, pairs, "doclens", "db", dbs),
        kills, id_col)
    # no doclens anywhere = an index built over an empty corpus being
    # bootstrapped by its first streamed batch: nothing to dedup
    # against. An id whose only copies are TOMBSTONED counts as absent
    # — a deleted document is legitimately re-insertable.
    fresh = batch0 if existing is None else \
        batch0.join(existing.select(id_col), id_col, "left_anti") \
              .localCheckpoint(eager=True)
    postings, doclens, vocab, stats_row = _index_tables(
        fresh, n_buckets, text_col, id_col)
    _write_tables(spark, ddir, postings, doclens, vocab, stats_row)
    fsutil.write_text(spark, path_join(ddir, COMMIT), "1")
    return {"appended": stats_row[0], "batch": token}


def upsert_into_text_index(spark: SparkSession, path: str, batch: DataFrame,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> dict:
    """CDC upsert (latest wins): every document in the batch becomes
    the LIVE version — ids already visible in the index have their
    prior copy tombstoned, the reference's delete+insert merge shape
    (base_loader.py:241-249) applied to the inverted index. One delta
    directory commits atomically with: the batch's own four tables, a
    ``tombstones`` table naming each victim as (doc_id, root) —
    root-ADDRESSED, so no cross-delta ordering is ever needed to
    decide which physical copy is dead — and a stats row carrying the
    NET correction (docs added minus docs killed, length added minus
    length killed), keeping the additive n_docs/total_len sums exact.
    Document frequency stays exact because search derives df from the
    visible postings themselves.

    IDEMPOTENT like append: the op-prefixed content digest names the
    directory; replay-after-commit no-ops, replay-after-partial-write
    overwrites and converges (victims are recomputed from the
    committed roots only — an uncommitted directory influences
    nothing). Replayed after an intervening compaction folded this
    batch, the recomputed victims are the batch's own (already
    identical) folded copies — re-killing and re-inserting the same
    content, a no-op for every search statistic. Duplicate ids inside
    the batch collapse deterministically first; CDC callers with a
    real version column should pre-apply
    ``incremental.latest_per_key``. Single-maintainer contract with
    other writes, like append/compact. Returns
    {upserted, replaced, batch}."""
    n_buckets = _meta(spark, path)["n_buckets"]
    batch0 = _dedup_batch(batch, text_col, id_col).localCheckpoint(eager=True)
    base = _base_root(spark, path)
    token = _salt_past_manifest(
        spark, base, _batch_token(batch0, text_col, id_col, kind="u"))
    ddir = path_join(path, "delta", token)
    if fsutil.exists(spark, path_join(ddir, COMMIT)):
        return {"upserted": 0, "replaced": 0, "batch": token}
    dbs = [r[0] for r in batch0.select(
        _tb(F.col(id_col), n_buckets).alias("db")).distinct().collect()]
    pairs = _root_pairs(spark, path, base)
    kills = _kills(spark, pairs, dbs, id_col)
    existing = _read_union_tagged(spark, pairs, "doclens", "db", dbs)
    # victims: the currently-VISIBLE copies of the batch's ids (an
    # already-killed copy must not be killed twice — its stats were
    # already corrected once)
    victims = None
    if existing is not None:
        vis = existing.join(kills, [id_col, "__root"], "left_anti") \
            if kills is not None else existing
        victims = vis.join(batch0.select(id_col), id_col) \
            .localCheckpoint(eager=True)
    postings, doclens, vocab, (n_new, len_new) = _index_tables(
        batch0, n_buckets, text_col, id_col)
    n_kill, len_kill = 0, 0
    if victims is not None:
        vrow = victims.agg(F.count(F.lit(1)).alias("n"),
                           F.sum("dl").alias("t")).collect()[0]
        n_kill, len_kill = int(vrow["n"]), int(vrow["t"] or 0)
    _write_tables(spark, ddir, postings, doclens, vocab,
                  (n_new - n_kill, len_new - len_kill))
    if victims is not None:
        _write_tombstones(spark, ddir,
                          victims.select(id_col, "__root"),
                          id_col, n_buckets)
    fsutil.write_text(spark, path_join(ddir, COMMIT), "1")
    return {"upserted": n_new, "replaced": n_kill, "batch": token}


def delete_from_text_index(spark: SparkSession, path: str, ids: DataFrame,
                           id_col: str = "doc_id") -> dict:
    """CDC delete: tombstone the visible copies of ``ids`` (an id-only
    frame) in one committed delta — no data rewrite anywhere. The
    delta carries only the ``tombstones`` table and a NEGATIVE stats
    correction row, so n_docs/avgdl immediately reflect the removal
    and idf re-prices on the next search (df is derived from visible
    postings). Ids not present are ignored (delete is idempotent by
    nature); the op-prefixed digest keeps replays single-committed.
    Returns {deleted, batch}."""
    n_buckets = _meta(spark, path)["n_buckets"]
    ids0 = ids.select(id_col).distinct().localCheckpoint(eager=True)
    base = _base_root(spark, path)
    token = _salt_past_manifest(spark, base, _ids_token(ids0, id_col))
    ddir = path_join(path, "delta", token)
    if fsutil.exists(spark, path_join(ddir, COMMIT)):
        return {"deleted": 0, "batch": token}
    dbs = [r[0] for r in ids0.select(
        _tb(F.col(id_col), n_buckets).alias("db")).distinct().collect()]
    pairs = _root_pairs(spark, path, base)
    kills = _kills(spark, pairs, dbs, id_col)
    existing = _read_union_tagged(spark, pairs, "doclens", "db", dbs)
    n_kill, len_kill = 0, 0
    victims = None
    if existing is not None:
        vis = existing.join(kills, [id_col, "__root"], "left_anti") \
            if kills is not None else existing
        victims = vis.join(ids0, id_col).localCheckpoint(eager=True)
        vrow = victims.agg(F.count(F.lit(1)).alias("n"),
                           F.sum("dl").alias("t")).collect()[0]
        n_kill, len_kill = int(vrow["n"]), int(vrow["t"] or 0)
    if n_kill == 0:
        # nothing visible matched: commit nothing (a zero stats
        # correction + no tombstones changes no answer). Replaying a
        # no-op delete is itself a no-op, so the idempotency marker is
        # not needed; committing it anyway would add one delta dir per
        # no-op delete until the next compact.
        fsutil.delete(spark, ddir)  # clears a crashed partial stage
        return {"deleted": 0, "batch": token}
    _write_tables(spark, ddir, None, None, None, (-n_kill, -len_kill))
    _write_tombstones(spark, ddir,
                      victims.select(id_col, "__root"),
                      id_col, n_buckets)
    fsutil.write_text(spark, path_join(ddir, COMMIT), "1")
    return {"deleted": n_kill, "batch": token}


def compact_text_index(spark: SparkSession, path: str) -> dict:
    """Offline maintenance: fold the current base + committed deltas
    into a NEW base generation, atomically publish it, and
    garbage-collect what no resolvable reader can still reach (the
    LSM compaction step — search cost grows with delta count, and the
    query-time vocab/stats delta sums grow with batch count).
    Result-transparent: delta summing is associative, so pre-merging
    is invisible to search.

    NOT concurrent-safe with an in-flight append (documented single-
    maintainer contract, like the versioned-table writer); concurrent
    SEARCHES are snapshot-consistent — each resolved the pointer once,
    and the one-generation GC grace keeps their resolved generation
    (and the deltas it admits) on disk until a SECOND compaction
    completes. Crash-safety: (1) the staged generation carries a
    ``compacted.json`` manifest naming the folded deltas, so the
    instant the pointer publish lands those deltas are excluded
    LOGICALLY — a crash before the GC loop cannot double-count them,
    and the next compact garbage-collects the leftovers; (2) a crash
    BEFORE the publish leaves an orphan staged directory the pointer
    never references, swept by the next successful publish."""
    cur_name = _current_base_name(spark, path)
    if cur_name is None:
        raise FileNotFoundError(f"text index has no published base: {path}")
    base = path_join(path, cur_name)
    deltas = _committed_deltas(spark, path, base)
    pairs = _root_pairs(spark, path, base)
    postings0 = _read_union_tagged(spark, pairs, "postings")
    doclens0 = _read_union_tagged(spark, pairs, "doclens")
    # the index's id column name is whatever it was built with —
    # recover it from the stored schema (the one column that is not
    # table machinery), so compact needs no caller-supplied names
    fixed = {"dl", "db", "tb", "token", "tf", "__root"}
    src = doclens0 if doclens0 is not None else postings0
    id_col = next((c for c in src.columns if c not in fixed), "doc_id") \
        if src is not None else "doc_id"
    # the fold RESOLVES upsert/delete tombstones: killed copies are
    # dropped from every table and the new generation carries no
    # tombstones at all — kills here are unbounded (whole index), the
    # one place that is correct
    kills = _kills(spark, pairs, None, id_col)
    postings = _visible(postings0, kills, id_col)
    doclens = _visible(doclens0, kills, id_col)
    if doclens is not None:
        # folded relations feed three writes + the stats aggregate:
        # pin them so the kill anti-join runs once per table
        doclens = doclens.localCheckpoint(eager=True)
    if postings is not None:
        postings = postings.localCheckpoint(eager=True)
    # vocab and stats are RECOMPUTED from the folded survivors — exact
    # by construction whatever mix of inserts/upserts/deletes the
    # delta set held (no correction-row arithmetic to carry forward)
    vocab = None
    if postings is not None:
        vocab = (postings.groupBy("tb", "token")
                 .agg(F.count(F.lit(1)).alias("df"))
                 .select("token", "df", "tb"))
    stats_row = (0, 0)
    if doclens is not None:
        srow = doclens.agg(F.count(F.lit(1)).alias("n"),
                           F.sum("dl").alias("t")).collect()[0]
        stats_row = (int(srow["n"]), int(srow["t"] or 0))
    new_name = lsm.next_gen_name(spark, path)
    new = path_join(path, new_name)
    fsutil.delete(spark, new)
    _write_tables(spark, new, postings, doclens, vocab, stats_row)
    # the manifest ACCUMULATES across compactions (see
    # ``lsm.compact_manifest``); publish, then GC with the
    # one-generation grace: keep the superseded generation and the
    # deltas IT still admits for readers that resolved the old
    # pointer; delete only the carried deltas, which both surviving
    # manifests exclude
    carried = lsm.compact_manifest(spark, path, base, new, deltas)
    _publish_base(spark, path, new_name, {new_name, cur_name}, carried,
                  expect_ptr=lsm.expected_ptr(cur_name))
    return {"n_docs": stats_row[0], "compacted_deltas": len(deltas)}
