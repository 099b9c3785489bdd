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
from cdc_data_pipeline_spark.operators.terms import score_bm25_postings
from cdc_data_pipeline_spark.sources import fsutil
from cdc_data_pipeline_spark.sources.fsutil import path_join

COMMIT = "_COMMIT"
BASE_PTR = "BASE"


def _tb(col, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def _meta(spark: SparkSession, path: str) -> dict:
    txt = fsutil.read_text(spark, path_join(path, "meta.json"))
    if txt is None:
        raise FileNotFoundError(f"not a text index (no meta.json): {path}")
    return json.loads(txt)


def _gen_name(gen: int) -> str:
    return f"base-{gen:010d}"


def _base_names(spark: SparkSession, path: str) -> list[str]:
    """Every staged-or-published base generation directory name,
    including a pre-pointer legacy ``base`` if one exists."""
    return [n for n in fsutil.list_names(spark, path)
            if n == "base" or n.startswith("base-")]


def _current_base_name(spark: SparkSession, path: str) -> str | None:
    """The published generation (pointer content), falling back to the
    legacy un-generationed ``base`` layout for indexes written before
    the pointer protocol."""
    ptr = fsutil.read_text(spark, path_join(path, BASE_PTR))
    if ptr is not None:
        return ptr.strip()
    if fsutil.exists(spark, path_join(path, "base")):
        return "base"
    return None


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
    """Delta directories that are committed AND not already folded
    into this base generation. The generation's ``compacted.json``
    manifest (staged inside the directory BEFORE the pointer publish)
    excludes folded deltas logically the instant the publish lands —
    their later deletion is garbage collection, so a crash between the
    publish and the GC loop can never double-count them."""
    folded = set()
    txt = fsutil.read_text(spark, path_join(base_root, "compacted.json"))
    if txt is not None:
        folded = set(json.loads(txt))
    root = path_join(path, "delta")
    return sorted(
        path_join(root, name) for name in fsutil.list_names(spark, root)
        if name not in folded
        and fsutil.exists(spark, path_join(root, name, COMMIT)))


def _root_pairs(spark: SparkSession, path: str,
                base_root: str) -> list[tuple[str, str]]:
    """(stable name, full path) for the readable roots: the resolved
    base generation plus its admitted deltas. The NAME (``base-<gen>``
    or ``delta/<digest>``) is what tombstones record as their victim
    root — path-prefix-free, so an index copied or mounted elsewhere
    keeps its kill set valid."""
    base_name = base_root.rstrip("/").rsplit("/", 1)[-1]
    out = [(base_name, base_root)]
    for d in _committed_deltas(spark, path, base_root):
        out.append(("delta/" + d.rstrip("/").rsplit("/", 1)[-1], d))
    return out


def _read_union(spark: SparkSession, roots: list[str], table: str,
                bucket_col: str | None = None,
                buckets: list[int] | None = None) -> DataFrame | None:
    """Union one sub-table across base + delta roots (absent dirs are
    skipped — an append whose batch was fully deduped away commits an
    empty directory). The bucket IN-filter applies per root, so the
    scan prunes unprobed partition directories in every root."""
    out = None
    for r in roots:
        p = path_join(r, table)
        if not fsutil.exists(spark, p):
            continue
        df = spark.read.parquet(p)
        if bucket_col is not None:
            df = df.filter(F.col(bucket_col).isin(buckets))
        out = df if out is None else out.unionByName(df)
    return out


def _read_union_tagged(spark: SparkSession, pairs: list[tuple[str, str]],
                       table: str, bucket_col: str | None = None,
                       buckets: list[int] | None = None) -> DataFrame | None:
    """``_read_union`` that stamps each row with its root's stable
    name (``__root``), the column tombstone kills match on."""
    out = None
    for name, r in pairs:
        p = path_join(r, table)
        if not fsutil.exists(spark, p):
            continue
        df = spark.read.parquet(p)
        if bucket_col is not None:
            df = df.filter(F.col(bucket_col).isin(buckets))
        df = df.withColumn("__root", F.lit(name))
        out = df if out is None else out.unionByName(df)
    return out


def _kills(spark: SparkSession, pairs: list[tuple[str, str]],
           dbs: list[int] | None, id_col: str) -> DataFrame | None:
    """The kill set: every ``(doc_id, __root)`` whose copy an upsert
    or delete tombstoned, unioned across roots and candidate-bounded
    by the same doc-hash bucket list as the doclens read (a tombstone
    only matters for a document that can otherwise surface). ``dbs``
    None means UNBOUNDED (the compaction fold). None result when no
    root carries tombstones — the append-only fast path."""
    paths = [p for _, p in pairs]
    t = _read_union(spark, paths, "tombstones") if dbs is None else \
        _read_union(spark, paths, "tombstones", "db", dbs)
    if t is None:
        return None
    return t.select(F.col(id_col), F.col("victim").alias("__root"))


def _visible(df: DataFrame | None, kills: DataFrame | None,
             id_col: str) -> DataFrame | None:
    """Apply the kill set to a ``__root``-tagged frame and drop the
    tag. An id appears in at most one LIVE root (the insert path
    anti-joins existing ids; the upsert path tombstones every prior
    visible copy), so after this filter per-id relations are unique
    again."""
    if df is None:
        return None
    if kills is not None:
        # no broadcast hint: the kill set is bounded by the candidate
        # doc-bucket list on the read path but unbounded on the
        # compaction path — let AQE pick the strategy per call site
        df = df.join(kills, [id_col, "__root"], "left_anti")
    return df.drop("__root")


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
    """Content digest naming the batch's delta directory: xor of row
    hashes (order-independent, overflow-free) + count. A pure function
    of the deduped batch content, so every redelivery of the same
    batch maps to the same directory. ``kind`` prefixes the name per
    operation ("b" insert, "u" upsert) so the same payload replayed
    through a DIFFERENT operation can never alias an existing
    directory's commit marker."""
    # structural multi-column hash: NULL text and separator characters
    # inside string ids cannot make distinct (id, text) rows collide
    # the way a concat-with-delimiter digest can
    # backtick-quote the identifiers: a column name with a space/hyphen/
    # reserved word would otherwise fail analysis with a confusing
    # parse error (the Column API quotes automatically; expr does not)
    qid = "`" + id_col.replace("`", "``") + "`"
    qtx = "`" + text_col.replace("`", "``") + "`"
    row = batch.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"bit_xor(xxhash64({qid}, {qtx}))")
        .alias("d")).collect()[0]
    return f"{kind}{row['n']}x{(row['d'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}"


def _ids_token(ids: DataFrame, id_col: str) -> str:
    """Content digest for an id-only batch (the delete shape)."""
    qid = "`" + id_col.replace("`", "``") + "`"
    row = ids.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"bit_xor(xxhash64({qid}))").alias("d")).collect()[0]
    return f"d{row['n']}x{(row['d'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}"


def _salt_past_manifest(spark: SparkSession, base: str, token: str) -> str:
    """A digest name the current generation's manifest has EXCLUDED
    must not be reused: a grace-retained folded directory may still
    carry a stale ``_COMMIT`` under it (see ``append_to_text_index``
    docstring). Deterministic given the manifest, so crash-replays
    against the same generation re-derive the same salted name."""
    folded_txt = fsutil.read_text(spark, path_join(base, "compacted.json"))
    folded = set(json.loads(folded_txt)) if folded_txt else set()
    while token in folded:
        token += "-r"
    return token


def _write_tombstones(spark: SparkSession, ddir: str, victims: DataFrame,
                      id_col: str, n_buckets: int) -> None:
    """Persist the delta's kill set, doc-hash-bucketed like doclens so
    search reads it candidate-bounded. ``victims`` is (id, __root)."""
    if victims.isEmpty():
        return
    (victims.select(F.col(id_col), F.col("__root").alias("victim"))
     .withColumn("db", _tb(F.col(id_col), n_buckets))
     .write.mode("overwrite").partitionBy("db")
     .parquet(path_join(ddir, "tombstones")))


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
                  keep: set[str], gc_deltas: list[str]) -> None:
    """Atomically publish ``new_name`` as the current generation, then
    garbage-collect: base generations outside ``keep`` and the named
    delta dirs. Everything deleted here is invisible to BOTH the new
    generation and the one it superseded (the grace generation), so a
    reader that resolved either pointer value never loses a directory
    it can reach — only a reader two compactions stale can."""
    fsutil.publish_text(spark, path_join(path, BASE_PTR), new_name)
    for name in _base_names(spark, path):
        if name not in keep:
            fsutil.delete(spark, path_join(path, name))
    for name in gc_deltas:
        fsutil.delete(spark, path_join(path, "delta", name))


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
    gens = [int(n[5:]) for n in _base_names(spark, path) if n != "base"]
    cur = _current_base_name(spark, path)
    new_name = _gen_name(max(gens, default=-1) + 1)
    new = path_join(path, new_name)
    fsutil.delete(spark, new)
    _write_tables(spark, new, postings, doclens, vocab, stats_row)
    # a rebuild supersedes every existing delta: exclude them all
    # logically before the publish. GC only the deltas the superseded
    # generation had ALREADY excluded — the rest stay one grace cycle
    # for readers still holding the old pointer, invisible to new
    # readers through the manifest either way
    stale = fsutil.list_names(spark, path_join(path, "delta"))
    fsutil.write_text(spark, path_join(new, "compacted.json"),
                      json.dumps(sorted(stale)))
    fsutil.write_text(spark, meta_path, json.dumps({"n_buckets": n_buckets}))
    gc: list[str] = []
    if cur is not None:
        prev = fsutil.read_text(
            spark, path_join(path, cur, "compacted.json"))
        gc = [n for n in (json.loads(prev) if prev else []) if n in stale]
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
    _write_tables(spark, ddir, None, None, None, (-n_kill, -len_kill))
    if victims is not None:
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
    gens = [int(n[5:]) for n in _base_names(spark, path) if n != "base"]
    new_name = _gen_name(max(gens, default=-1) + 1)
    new = path_join(path, new_name)
    fsutil.delete(spark, new)
    _write_tables(spark, new, postings, doclens, vocab, stats_row)
    # the manifest ACCUMULATES across compactions: a folded-but-not-
    # yet-GC'd delta from a previous cycle must stay excluded under
    # the new generation too (names of fully deleted deltas are
    # harmless residue, dropped here once their directory is gone)
    prev = fsutil.read_text(spark, path_join(base, "compacted.json"))
    carried = [n for n in (json.loads(prev) if prev else [])
               if fsutil.exists(spark, path_join(path, "delta", n))]
    newly = sorted(d.rsplit("/", 1)[-1] for d in deltas)
    fsutil.write_text(spark, path_join(new, "compacted.json"),
                      json.dumps(sorted(set(carried) | set(newly))))
    # publish, then GC with the one-generation grace: keep the
    # superseded generation and the deltas IT still admits (``newly``)
    # for readers that resolved the old pointer; delete only the
    # ``carried`` deltas, which both surviving manifests exclude
    _publish_base(spark, path, new_name, {new_name, cur_name}, carried)
    return {"n_docs": stats_row[0], "compacted_deltas": len(deltas)}
