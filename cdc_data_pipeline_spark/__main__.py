"""Command-line entry point: run any catalog query against a fixture
scale directory.

    python -m cdc_data_pipeline_spark list
    python -m cdc_data_pipeline_spark run pricing_summary --sf-dir /root/testdata/sf0.01 --limit 5
    python -m cdc_data_pipeline_spark oracle pricing_summary

The reference drives its pipeline through Dagster jobs and dbt CLI
invocations (`dagster_code/`, `dbt_project/`); this is the equivalent
operational surface for the Spark engine — every SURVEY §2 operator is
a named, runnable query.
"""

from __future__ import annotations

import argparse
import json
import sys


def _catalog():
    from cdc_data_pipeline_spark import catalog

    q = dict(catalog.queries())
    q.update(catalog.extra_queries())
    o = dict(catalog.oracles())
    o.update(catalog.extra_oracles())
    return q, o


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="cdc_data_pipeline_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list catalog entries")
    runp = sub.add_parser("run", help="run one catalog query")
    runp.add_argument("entry")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--json", action="store_true",
                      help="newline-delimited JSON instead of show()")
    orp = sub.add_parser("oracle", help="print an entry's DuckDB oracle SQL")
    orp.add_argument("entry")
    sub.add_parser("lineage", help="print the star-schema DAG edges as JSON")
    xp = sub.add_parser("explain", help="print an entry's physical plan")
    xp.add_argument("entry")
    xp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    bp = sub.add_parser(
        "build", help="materialize the star-schema DAG into versioned tables")
    bp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    bp.add_argument("--base-path", required=True)
    bp.add_argument("--select", default=None,
                    help="dbt-style selection, e.g. +fact_savings_transaction")
    rp = sub.add_parser(
        "runs", help="print the run-history manifest of a build base path")
    rp.add_argument("--base-path", required=True)
    sp = sub.add_parser(
        "sql", help="run ad-hoc Spark SQL over the fixture tables "
                    "(each parquet table is a view)")
    sp.add_argument("query")
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sp.add_argument("--limit", type=int, default=20)
    vp = sub.add_parser(
        "versions", help="list a versioned table's versions + current pointer")
    vp.add_argument("--table-path", required=True)
    rbp = sub.add_parser(
        "rollback", help="point a versioned table back to an older version (O(1))")
    rbp.add_argument("--table-path", required=True)
    rbp.add_argument("--to", type=int, required=True)
    vcp = sub.add_parser(
        "vacuum", help="delete all but the last N versions of a versioned table")
    vcp.add_argument("--table-path", required=True)
    vcp.add_argument("--keep", type=int, default=2)
    tsp = sub.add_parser(
        "table-stats", help="maintenance signal for a bucketed CDC "
                            "table: rows + skew per bucket, file "
                            "counts, per-bucket schema drift")
    tsp.add_argument("--path", required=True)
    tcp = sub.add_parser(
        "table-compact", help="rewrite a bucketed CDC table under its "
                              "current layout: unify post-evolution "
                              "footer schemas, cluster each bucket "
                              "into --files-per-bucket files")
    tcp.add_argument("--path", required=True)
    tcp.add_argument("--files-per-bucket", type=int, default=1)
    tcp.add_argument("--sort-by", default=None,
                     help="comma-separated columns to cluster rows by "
                          "inside each bucket (row-group data "
                          "skipping; the tracking column is the "
                          "natural choice)")
    tcp.add_argument("--lock", action="store_true",
                     help="serialize against other locked maintainers "
                          "via a sibling lock root")
    trp = sub.add_parser(
        "table-rebucket", help="grow a bucketed CDC table's layout "
                               "(one planned full rewrite; buckets "
                               "must stay executor-sized as the "
                               "table grows)")
    trp.add_argument("--path", required=True)
    trp.add_argument("--to", type=int, required=True,
                     help="new bucket count")
    trp.add_argument("--files-per-bucket", type=int, default=1)
    trp.add_argument("--lock", action="store_true",
                     help="serialize against other locked maintainers "
                          "via a sibling lock root")
    tchp = sub.add_parser(
        "table-changes", help="read a bucketed table's change data "
                              "feed (row-level insert/update/delete "
                              "deltas with _seq) newer than a "
                              "consumer watermark")
    tchp.add_argument("--path", required=True)
    tchp.add_argument("--since-seq", type=int, default=-1,
                      help="high-water _seq the consumer has already "
                           "applied (default: everything)")
    tchp.add_argument("--upto-seq", type=int, default=None,
                      help="inclusive upper bound (as-of slices); "
                           "commits outside the range are never opened")
    tap = sub.add_parser(
        "table-at", help="time travel: reconstruct a bucketed table "
                         "AS OF a change-feed commit (starts from the "
                         "newest snapshot anchor at or below the seq "
                         "when one exists; refuses a feed vacuumed "
                         "past the reachable base)")
    tap.add_argument("--path", required=True)
    tap.add_argument("--seq", type=int, required=True)
    tap.add_argument("--limit", type=int, default=20)
    tanp = sub.add_parser(
        "table-anchor", help="publish a snapshot anchor at the feed's "
                             "newest commit (the Delta-checkpoint "
                             "analogue): table-at then reconstructs "
                             "from the anchor instead of commit 0, and "
                             "vacuum may prune at/below it without "
                             "losing as-of reads above it")
    tanp.add_argument("--path", required=True)
    tanp.add_argument("--vacuum-keep", type=int, default=None,
                      metavar="K",
                      help="after anchoring, prune old anchors keeping "
                           "the newest K (each anchor is a full table "
                           "copy — pair a periodic anchor cadence with "
                           "this)")
    trcp = sub.add_parser(
        "table-recover", help="heal a crashed swap: restore a table "
                              "or bucket partition stranded in a "
                              ".__old__ sibling by a writer that died "
                              "between the swap's two renames")
    trcp.add_argument("--path", required=True)
    tfp = sub.add_parser(
        "table-fsck", help="READ-ONLY invariant audit of a bucketed "
                           "CDC table: layout, crash debris, commit "
                           "sequence density, pointer/anchor/vacuum "
                           "consistency; --deep adds the data-scan "
                           "equivalences (rows bucketed where their "
                           "keys hash; table == table_at(newest)). "
                           "Exit 1 on any error-severity finding")
    tfp.add_argument("--path", required=True)
    tfp.add_argument("--deep", action="store_true")
    ifp = sub.add_parser(
        "index-fsck", help="READ-ONLY invariant audit of a persisted "
                           "LSM index (any kind): BASE pointer "
                           "resolves, manifest parses, generations/"
                           "deltas/markers inventoried, lock "
                           "surfaced. Exit 1 on any error-severity "
                           "finding")
    ifp.add_argument("--path", required=True)
    vfp = sub.add_parser(
        "versioned-fsck", help="READ-ONLY invariant audit of a "
                               "versioned pointer table: pointer "
                               "parses and resolves, version dirs "
                               "inventoried, crashed-publish debris "
                               "surfaced; --deep verifies every "
                               "surviving version's parquet commit. "
                               "Exit 1 on any error-severity finding")
    vfp.add_argument("--path", required=True)
    vfp.add_argument("--deep", action="store_true")
    trxp = sub.add_parser(
        "table-reconcile", help="repair a change feed bricked by a "
                                "detected writer race (duplicate "
                                "sequence numbers): keep the "
                                "first-landed commit per seq, "
                                "quarantine the losers under "
                                "_changes/_conflict, repair _latest; "
                                "replicas/marts should be re-converged "
                                "afterwards (bootstrap-replica / "
                                "recompute)")
    trxp.add_argument("--path", required=True)
    tchp.add_argument("--limit", type=int, default=20)
    tchp.add_argument("--vacuum-before", type=int, default=None,
                      metavar="SEQ",
                      help="first prune commits with _seq <= SEQ "
                           "(run once every consumer is past it)")
    pp = sub.add_parser(
        "pipeline", help="run the whole CDC story end to end: orders "
                         "-> bronze bucketed table with a change data "
                         "feed (churn ticks with updates/inserts/hard "
                         "deletes, stale-protected) -> replica caught "
                         "up from the feed -> streaming IVM mart; "
                         "prints a JSON report with built-in "
                         "equivalence checks")
    pp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pp.add_argument("--base-path", required=True)
    pp.add_argument("--ticks", type=int, default=2,
                    help="number of churn batches after the initial load")
    ip = sub.add_parser(
        "index", help="build a persisted IVF similarity index from the "
                      "embeddings table (--pq adds PQ codes: the code "
                      "table replaces raw embeddings)")
    ip.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ip.add_argument("--path", required=True)
    ip.add_argument("--cells", type=int, default=16)
    ip.add_argument("--pq", action="store_true",
                    help="IVF-PQ: store m-int PQ codes per vector "
                         "instead of raw embeddings")
    ip.add_argument("--m", type=int, default=4)
    ip.add_argument("--ksub", type=int, default=8)
    ip.add_argument("--dim", type=int, default=64)
    ip.add_argument("--text", action="store_true",
                    help="build a persisted inverted TEXT index over "
                         "the documents table instead (BM25 postings)")
    qp = sub.add_parser(
        "search", help="top-k similarity search against a persisted "
                       "IVF index (query = every Nth embedding)")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    qp.add_argument("--path", required=True)
    qp.add_argument("--k", type=int, default=5)
    qp.add_argument("--nprobe", type=int, default=2)
    qp.add_argument("--query-mod", type=int, default=100)
    qp.add_argument("--pq", action="store_true",
                    help="search an IVF-PQ index (ADC over stored codes)")
    qp.add_argument("--dim", type=int, default=64)
    qp.add_argument("--text", action="store_true",
                    help="BM25 search a persisted inverted text index "
                         "(query = every Nth document)")
    stp = sub.add_parser(
        "stats", help="maintenance signal for a persisted index: "
                      "published generation, unfolded delta count "
                      "(per-query read amplification), tombstone "
                      "deltas — the inputs a compaction scheduler "
                      "needs")
    stp.add_argument("--path", required=True)
    mp = sub.add_parser(
        "compact", help="fold a persisted index's base + CDC deltas "
                        "into a fresh generation (text / IVF / IVF-PQ "
                        "/ LSH auto-detected from the index metadata) "
                        "and garbage-collect with the one-generation "
                        "grace")
    mp.add_argument("--path", required=True)
    mp.add_argument("--when-deltas-over", type=int, default=None,
                    metavar="N",
                    help="only compact when more than N committed "
                         "deltas are unfolded (lets a cron scheduler "
                         "run this unconditionally)")
    mp.add_argument("--lock", action="store_true",
                    help="serialize against other locked maintainers "
                         "via the index's lock file (hard exclusion "
                         "on local/HDFS; stale locks expire after "
                         "--lock-ttl)")
    mp.add_argument("--lock-ttl", type=float, default=3600.0,
                    metavar="SEC", help="age at which a crashed "
                         "holder's lock is expired (default 3600)")
    mp.add_argument("--lock-timeout", type=float, default=60.0,
                    metavar="SEC", help="max wait for the lock before "
                         "giving up (default 60)")
    rp = sub.add_parser(
        "retrain", help="drift response for a raw-vector IVF index: "
                        "compact + re-cluster around the corpus as it "
                        "is NOW, in one rebuild publish (IVF-PQ "
                        "refuses — codes are not invertible)")
    rp.add_argument("--path", required=True)
    rp.add_argument("--cells", type=int, default=None,
                    help="new cell count (default: keep the current "
                         "generation's)")
    rp.add_argument("--iters", type=int, default=3)
    rp.add_argument("--lock", action="store_true",
                    help="serialize against other locked maintainers")
    cp = sub.add_parser(
        "curate", help="run the full corpus-curation flow (quality -> "
                       "dedup -> mask -> decontaminate -> shards)")
    cp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    cp.add_argument("--out", default=None,
                    help="write shard directories here (optional)")
    cp.add_argument("--budget", type=int, default=4096,
                    help="tokens per output shard")
    cp.add_argument("--eval-mod", type=int, default=97,
                    help="every Nth doc stands in for the eval set")
    cp.add_argument("--normalize-unicode", default=None,
                    help="prepend the unicode cleanup stage (e.g. NFC)")
    cp.add_argument("--mixture", default=None,
                    help='JSON dict of domain -> target proportion, e.g. '
                         '\'{"src0": 0.5, "src1": 0.5}\'')
    args = ap.parse_args(argv)

    if args.cmd in ("versions", "rollback", "vacuum"):
        from cdc_data_pipeline_spark.sources import versioned as V

        if args.cmd == "versions":
            print(json.dumps({"versions": V.list_versions(args.table_path),
                              "current": V.current_version(args.table_path)}))
        elif args.cmd == "rollback":
            if args.to not in V.list_versions(args.table_path):
                print(f"unknown version: {args.to}", file=sys.stderr)
                return 2
            V.publish_pointer(args.table_path, args.to)
            print(json.dumps({"current": V.current_version(args.table_path)}))
        else:
            removed = V.vacuum_versions(args.table_path, keep_last=args.keep)
            print(json.dumps({"removed": removed,
                              "versions": V.list_versions(args.table_path)}))
        return 0

    if args.cmd == "pipeline":
        from pyspark.sql import functions as F

        from cdc_data_pipeline_spark.operators.incremental import (
            apply_changes, read_changes, table_stats, upsert_bucketed)
        from cdc_data_pipeline_spark.session import get_spark
        from cdc_data_pipeline_spark.sources.readers import read_table
        from cdc_data_pipeline_spark.sources.simulate import churn_batch
        from cdc_data_pipeline_spark.streaming.cdc import (
            stream_ivm_to_parquet)

        spark = get_spark("cdc-pipeline")
        cols = ["o_orderkey", "o_orderpriority", "o_totalprice",
                "o_orderdate"]
        base = read_table(spark, args.sf_dir, "orders").select(*cols)
        bronze = args.base_path.rstrip("/") + "/bronze_orders"
        replica = args.base_path.rstrip("/") + "/replica_orders"
        mart = args.base_path.rstrip("/") + "/mart_by_priority"
        ck = args.base_path.rstrip("/") + "/_ck_ivm"

        upsert_bucketed(spark, bronze, base, ["o_orderkey"],
                        "o_orderdate", n_buckets=8, emit_changes=True,
                        update_preimages=True)
        for tick in range(1, args.ticks + 1):
            churn = churn_batch(base, ["o_orderkey"], "o_orderdate",
                                tick, value_col="o_totalprice") \
                .withColumn("is_del", F.lit(False))
            dels = (base.withColumn(
                        "__h", F.xxhash64(F.col("o_orderkey"),
                                          F.lit(tick * 31)))
                    .orderBy("__h").limit(5).drop("__h")
                    .withColumn("o_orderdate",
                                F.col("o_orderdate")
                                + F.expr(f"INTERVAL {tick} DAY"))
                    .withColumn("is_del", F.lit(True)))
            upsert_bucketed(spark, bronze, churn.unionByName(dels),
                            ["o_orderkey"], "o_orderdate",
                            delete_col="is_del", emit_changes=True,
                            update_preimages=True, stale_protection=True)

        apply_changes(spark, read_changes(spark, bronze), replica,
                      ["o_orderkey"], n_buckets=8)
        q = stream_ivm_to_parquet(spark, bronze, mart,
                                  ["o_orderpriority"], ["o_totalprice"],
                                  ck)
        q.awaitTermination(600)

        b = spark.read.parquet(bronze).select(*cols)
        r = spark.read.parquet(replica).select(*cols)
        replica_ok = (b.exceptAll(r).isEmpty()
                      and r.exceptAll(b).isEmpty())
        want = b.groupBy("o_orderpriority").agg(
            F.round(F.sum("o_totalprice"), 2).alias("s"),
            F.count(F.lit(1)).alias("c"))
        got = spark.read.parquet(mart).select(
            "o_orderpriority",
            F.round("delta_o_totalprice", 2).alias("s"),
            F.col("delta_count").cast("long").alias("c"))
        mart_ok = (want.exceptAll(got).isEmpty()
                   and got.exceptAll(want).isEmpty())
        # anchor + vacuum + time travel: publish a snapshot anchor at
        # the newest commit, prune every commit below it, and the
        # as-of read at that seq must still equal bronze — the full
        # vacuum-and-time-travel-compose contract, self-verified
        from cdc_data_pipeline_spark.operators.incremental import (
            create_anchor, table_at, vacuum_changes)

        aseq = create_anchor(spark, bronze)
        vacuum_changes(spark, bronze, before_seq=aseq - 1)
        t = table_at(spark, bronze, aseq).select(*cols)
        travel_ok = (b.exceptAll(t).isEmpty()
                     and t.exceptAll(b).isEmpty())
        st = table_stats(spark, bronze)
        # closing invariant audit: the deep fsck re-derives the same
        # equivalences from DISK state alone (misbucket scan + feed
        # replay vs live table), so a green pipeline with a red fsck
        # means a protocol bug, not a pipeline bug
        from cdc_data_pipeline_spark.operators.incremental import fsck_table

        fsck = fsck_table(spark, bronze, deep=True)
        print(json.dumps({
            "bronze_rows": st["n_rows"],
            "feed_commits": args.ticks + 1,
            "replica_matches_bronze": replica_ok,
            "mart_matches_recompute": mart_ok,
            "anchored_seq": aseq,
            "time_travel_matches_bronze": travel_ok,
            "bucket_skew": st["bucket_skew"],
            "fsck_ok": fsck["ok"],
            "fsck_findings": fsck["findings"],
        }))
        return 0 if (replica_ok and mart_ok and travel_ok
                     and fsck["ok"]) else 1

    if args.cmd == "table-at":
        from cdc_data_pipeline_spark.operators.incremental import table_at
        from cdc_data_pipeline_spark.session import get_spark

        spark = get_spark("cdc-table")
        snap = table_at(spark, args.path, args.seq)
        snap.show(args.limit, truncate=False)
        print(json.dumps({"seq": args.seq, "rows": snap.count()}))
        return 0

    if args.cmd == "table-anchor":
        from cdc_data_pipeline_spark.operators.incremental import (
            create_anchor)
        from cdc_data_pipeline_spark.session import get_spark

        spark = get_spark("cdc-table")
        out = {"anchored_seq": create_anchor(spark, args.path)}
        if args.vacuum_keep is not None:
            from cdc_data_pipeline_spark.operators.incremental import (
                vacuum_anchors)

            out["anchors_vacuumed"] = vacuum_anchors(
                spark, args.path, keep=args.vacuum_keep)
        print(json.dumps(out))
        return 0

    if args.cmd == "table-recover":
        from cdc_data_pipeline_spark.operators.incremental import (
            recover_table)
        from cdc_data_pipeline_spark.session import get_spark

        spark = get_spark("cdc-table")
        print(json.dumps({"restored": recover_table(spark, args.path)}))
        return 0

    if args.cmd == "table-reconcile":
        from cdc_data_pipeline_spark.operators.incremental import (
            reconcile_changes)
        from cdc_data_pipeline_spark.session import get_spark

        spark = get_spark("cdc-table")
        print(json.dumps(reconcile_changes(spark, args.path)))
        return 0

    if args.cmd == "table-fsck":
        from cdc_data_pipeline_spark.operators.incremental import fsck_table
        from cdc_data_pipeline_spark.session import get_spark

        spark = get_spark("cdc-table")
        out = fsck_table(spark, args.path, deep=args.deep)
        print(json.dumps(out))
        return 0 if out["ok"] else 1

    if args.cmd == "index-fsck":
        from cdc_data_pipeline_spark.operators.lsm import fsck_index
        from cdc_data_pipeline_spark.session import get_spark

        spark = get_spark("cdc-index")
        out = fsck_index(spark, args.path)
        print(json.dumps(out))
        return 0 if out["ok"] else 1

    if args.cmd == "versioned-fsck":
        from cdc_data_pipeline_spark.session import get_spark
        from cdc_data_pipeline_spark.sources.versioned import \
            fsck_versioned

        spark = get_spark("cdc-versioned")
        out = fsck_versioned(spark, args.path, deep=args.deep)
        print(json.dumps(out))
        return 0 if out["ok"] else 1

    if args.cmd == "table-changes":
        from cdc_data_pipeline_spark.operators.incremental import (
            read_changes)
        from cdc_data_pipeline_spark.session import get_spark

        spark = get_spark("cdc-table")
        if args.vacuum_before is not None:
            from cdc_data_pipeline_spark.operators.incremental import (
                vacuum_changes)

            print(json.dumps({"vacuumed": vacuum_changes(
                spark, args.path, args.vacuum_before)}))
        got = read_changes(spark, args.path, since_seq=args.since_seq,
                           upto_seq=args.upto_seq)
        if got is None:
            print(json.dumps({"commits": 0, "rows": 0}))
            return 0
        got.orderBy("_seq").show(args.limit, truncate=False)
        print(json.dumps({
            "rows": got.count(),
            "max_seq": got.agg({"_seq": "max"}).first()[0]}))
        return 0

    if args.cmd in ("table-stats", "table-compact", "table-rebucket"):
        from cdc_data_pipeline_spark.operators import incremental as inc
        from cdc_data_pipeline_spark.session import get_spark

        spark = get_spark("cdc-table")
        if args.cmd == "table-compact":
            inc.compact_table(spark, args.path,
                              files_per_bucket=args.files_per_bucket,
                              sort_by=(args.sort_by.split(",")
                                       if args.sort_by else ()),
                              lock=args.lock)
        elif args.cmd == "table-rebucket":
            inc.rebucket(spark, args.path, args.to,
                         files_per_bucket=args.files_per_bucket,
                         lock=args.lock)
        print(json.dumps(inc.table_stats(spark, args.path)))
        return 0

    if args.cmd == "index":
        from cdc_data_pipeline_spark.operators.index import (
            build_ivf_index, build_ivfpq_index)
        from cdc_data_pipeline_spark.session import get_spark
        from cdc_data_pipeline_spark.sources.readers import read_table

        spark = get_spark("cdc-index")
        if args.text:
            from cdc_data_pipeline_spark.operators.text_index import (
                build_text_index)

            docs = read_table(spark, args.sf_dir, "documents")
            print(json.dumps(build_text_index(spark, docs, args.path)))
            return 0
        emb = read_table(spark, args.sf_dir, "embeddings")
        if args.pq:
            stats = build_ivfpq_index(spark, emb, args.path, dim=args.dim,
                                      n_cells=args.cells, m=args.m,
                                      ksub=args.ksub)
        else:
            stats = build_ivf_index(spark, emb, args.path, n_cells=args.cells)
        print(json.dumps(stats))
        return 0

    if args.cmd == "search":
        from pyspark.sql import functions as F

        from cdc_data_pipeline_spark.operators.index import (
            query_ivf_index, query_ivfpq_index)
        from cdc_data_pipeline_spark.session import get_spark
        from cdc_data_pipeline_spark.sources.readers import read_table

        spark = get_spark("cdc-search")
        if args.text:
            from cdc_data_pipeline_spark.operators.text_index import (
                search_text_index)

            docs = read_table(spark, args.sf_dir, "documents")
            queries = docs.filter(F.col("doc_id") % args.query_mod == 0)
            # queries are drawn from the corpus itself here: the
            # more-like-this shape, so suppress trivial self-hits
            out = search_text_index(spark, args.path, queries, k=args.k,
                                    exclude_self=True)
            out.orderBy("query_id", "rank").show(50, truncate=False)
            return 0
        emb = read_table(spark, args.sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") % args.query_mod == 0)
        if args.pq:
            out = query_ivfpq_index(spark, args.path, queries, dim=args.dim,
                                    k=args.k, nprobe=args.nprobe)
        else:
            out = query_ivf_index(spark, args.path, queries,
                                  k=args.k, nprobe=args.nprobe)
        out.orderBy("query_id", "rank").show(50, truncate=False)
        return 0

    if args.cmd == "stats":
        from cdc_data_pipeline_spark.operators import lsm
        from cdc_data_pipeline_spark.session import get_spark

        spark = get_spark("cdc-stats")
        print(json.dumps(lsm.index_stats(spark, args.path)))
        return 0

    if args.cmd == "compact":
        from cdc_data_pipeline_spark.operators import lsm
        from cdc_data_pipeline_spark.session import get_spark

        spark = get_spark("cdc-compact")
        if args.when_deltas_over is not None:
            st = lsm.index_stats(spark, args.path)
            if st["n_deltas"] <= args.when_deltas_over:
                print(json.dumps({"skipped": True, **st}))
                return 0
        try:
            out = lsm.compact_index(spark, args.path, lock=args.lock,
                                    lock_ttl_sec=args.lock_ttl,
                                    lock_timeout_sec=args.lock_timeout)
        except (ValueError, lsm.MaintenanceLockHeld) as ex:
            print(json.dumps({"error": str(ex)}))
            return 1
        print(json.dumps(out))
        return 0

    if args.cmd == "retrain":
        from cdc_data_pipeline_spark.operators import lsm
        from cdc_data_pipeline_spark.operators.index import retrain_ivf_index
        from cdc_data_pipeline_spark.session import get_spark

        spark = get_spark("cdc-retrain")
        try:
            if args.lock:
                with lsm.maintenance_lock(spark, args.path):
                    out = retrain_ivf_index(spark, args.path,
                                            n_cells=args.cells,
                                            iters=args.iters)
            else:
                out = retrain_ivf_index(spark, args.path,
                                        n_cells=args.cells,
                                        iters=args.iters)
        except (ValueError, lsm.MaintenanceLockHeld) as ex:
            print(json.dumps({"error": str(ex)}))
            return 1
        print(json.dumps(out))
        return 0

    if args.cmd == "curate":
        from pyspark.sql import functions as F

        from cdc_data_pipeline_spark.plans.curate import curate_corpus
        from cdc_data_pipeline_spark.session import get_spark
        from cdc_data_pipeline_spark.sources.readers import read_table

        spark = get_spark("cdc-curate")
        docs = read_table(spark, args.sf_dir, "documents")
        ev = docs.filter(F.col("doc_id") % args.eval_mod == 0)
        mixture = json.loads(args.mixture) if args.mixture else None
        _packed, funnel = curate_corpus(
            docs, ev, out_path=args.out, budget=args.budget,
            mixture=mixture, normalize_unicode=args.normalize_unicode)
        print(json.dumps(funnel))
        return 0

    if args.cmd == "sql":
        from cdc_data_pipeline_spark.session import get_spark
        from cdc_data_pipeline_spark.sources.readers import TABLES, read_table

        spark = get_spark("cdc-sql")
        for name in TABLES:
            read_table(spark, args.sf_dir, name).createOrReplaceTempView(name)
        df = spark.sql(args.query)
        if args.limit >= 0:
            df = df.limit(args.limit)
        df.show(truncate=False)
        return 0

    if args.cmd == "runs":
        from cdc_data_pipeline_spark.session import get_spark
        from cdc_data_pipeline_spark.sources.versioned import read_runs

        spark = get_spark("cdc-runs")
        rows = (read_runs(spark, args.base_path)
                .orderBy("published_at", "model").collect())
        for r in rows:
            print(json.dumps({
                "run_id": r["run_id"], "model": r["model"],
                "version": int(r["version"]), "rows": int(r["rows"]),
                "duration_sec": float(r["duration_sec"]),
                "published_at": str(r["published_at"]),
            }))
        return 0

    if args.cmd == "lineage":
        from cdc_data_pipeline_spark.plans.models import build_star_registry
        from cdc_data_pipeline_spark.session import get_spark

        spark = get_spark("cdc-lineage")
        reg, sources = build_star_registry(spark, "/root/testdata/sf0.001")
        edges = {name: list(deps)
                 for name, (deps, _fn) in sorted(reg._models.items())}
        print(json.dumps({"edges": edges, "sources": list(sources),
                          "topo": reg.topo_order()}))
        return 0

    if args.cmd == "build":
        from cdc_data_pipeline_spark.plans.models import build_star_registry
        from cdc_data_pipeline_spark.plans.registry import materialize
        from cdc_data_pipeline_spark.session import get_spark

        spark = get_spark("cdc-build")
        reg, sources = build_star_registry(spark, args.sf_dir)
        published = materialize(reg, spark, args.base_path,
                                select=args.select, sources=sources)
        print(json.dumps(published))
        return 0

    queries, oracles = _catalog()
    if args.cmd == "list":
        try:
            for name in sorted(queries):
                print(name)
        except BrokenPipeError:  # `... | head` is fine
            pass
        return 0
    if args.entry not in queries:
        print(f"unknown entry: {args.entry}", file=sys.stderr)
        return 2
    if args.cmd == "oracle":
        sql = oracles.get(args.entry)
        if sql is None:
            print(f"-- no SQL oracle for {args.entry}", file=sys.stderr)
            return 1
        print(sql.strip())
        return 0

    from cdc_data_pipeline_spark.session import get_spark

    spark = get_spark("cdc-cli")
    df = queries[args.entry](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
        return 0
    if args.limit >= 0:
        df = df.limit(args.limit)
    if args.json:
        for row in df.toJSON().collect():
            print(row)
    else:
        df.show(truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
