"""Deterministic sampling operators for training-data curation.

A 100 TB corpus is never trained on whole: it is split, subsampled,
and rebalanced. The operators here make every one of those decisions a
pure function of (row key, seed) via ``functions.hashing.uniform_hash``
— so a re-run, a backfill, or a different cluster selects the exact
same rows, and every sample has an exact SQL oracle.

- ``hash_sample``     — Bernoulli(p) by key hash. No shuffle: a pure
                        filter that pushes past the scan.
- ``split_column``    — named train/valid/test split from hash ranges;
                        one pass, no shuffle, mutually exclusive and
                        exhaustive by construction.
- ``stratified_sample_exact`` — exactly k rows per stratum, the k
                        smallest hashes (one shuffle on strata cols).
- ``weighted_sample_topk``    — Efraimidis–Spirakis A-ES weighted
                        sampling without replacement: key
                        -ln(u)/weight, keep the k smallest per
                        stratum. P(selection) proportional to weight.
- ``group_topk``      — exact per-group top-k with a map-local cut
                        first, so a hot group never fills one window
                        task (the skew-safe variant of the above).
- ``domain_caps``     — per-domain document cap built on it (no
                        single source exceeds N docs).

Scale: per-stratum top-k uses a rank window partitioned by the strata
columns — the shuffle carries only (strata, key, hash); with many
strata this parallelizes across them. For a GLOBAL top-k over few/one
strata, pre-reduce with a per-partition top-k (sort within partitions,
mapPartitions head-k) before the final window — the driver never sees
more than partitions*k rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.hashing import uniform_hash


def hash_sample(df: DataFrame, fraction: float, key_col: str,
                seed: int = 0, fast: bool = False) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows with u(key) < fraction.

    Unlike ``df.sample``, membership is a function of the key, not of
    partition layout — stable under repartitioning and re-runs.
    """
    return df.filter(uniform_hash(key_col, seed, fast=fast) < F.lit(fraction))


def split_column(key_col: str, splits: Sequence[tuple[str, float]],
                 seed: int = 0, fast: bool = False) -> Column:
    """A labeled split column from consecutive hash ranges.

    ``splits`` is [(name, fraction), ...]; fractions must sum to <= 1,
    remainder (if any) falls in the LAST split. Example:
    ``split_column("doc_id", [("test", .1), ("valid", .1), ("train", .8)])``.
    """
    fracs = [f for _, f in splits]
    assert sum(fracs) <= 1.0 + 1e-9, "split fractions exceed 1"
    u = uniform_hash(key_col, seed, fast=fast)
    expr = None
    edge = 0.0
    # CASE chain over cumulative hash edges: first matching edge wins
    for name, frac in splits[:-1]:
        edge += frac
        cond = u < F.lit(edge)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return F.lit(splits[-1][0]) if expr is None else expr.otherwise(F.lit(splits[-1][0]))


def stratified_sample_exact(df: DataFrame, strata_cols: Sequence[str], k: int,
                            key_col: str, seed: int = 0,
                            fast: bool = False) -> DataFrame:
    """EXACTLY min(k, |stratum|) rows per stratum: the k smallest
    key-hashes, ties broken by key (total order — fully deterministic).

    ``df.sampleBy`` gives only expected fractions and is layout-
    dependent; this gives exact counts and reproducibility. One shuffle
    on the strata columns.
    """
    u = uniform_hash(key_col, seed, fast=fast)
    w = Window.partitionBy(*strata_cols).orderBy(u.asc(), F.col(key_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= k).drop("__rn"))


def weighted_sample_topk(df: DataFrame, strata_cols: Sequence[str], k: int,
                         weight_col: str, key_col: str, seed: int = 0,
                         fast: bool = False) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): per stratum keep the k rows minimizing -ln(u)/w — each row's
    inclusion probability is proportional to its weight. The standard
    tool for quality-weighted corpus re-balancing (upweight high
    quality-score documents without discarding the tail entirely).

    Rows with weight <= 0 are excluded (zero probability).
    """
    u = uniform_hash(key_col, seed, fast=fast)
    es_key = -F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(*strata_cols).orderBy(es_key.asc(), F.col(key_col).asc())
    return (df.filter(F.col(weight_col) > 0)
              .withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= k).drop("__rn"))


def local_topk_cut(df: DataFrame, group_cols: Sequence[str], k: int,
                   order_cols: Sequence[tuple[str, bool]]) -> DataFrame:
    """Map-local per-group top-k cut — the pre-shuffle half of
    ``group_topk``, exposed so the ANN family's final rankings (and
    tests asserting shuffle headroom) can reuse it directly.

    Keeps at most k rows per group PER ARROW BATCH, so whatever ranks
    the survivors shuffles k * groups * batches rows — never a hot
    group's full row set. Null semantics match Spark's window exactly:
    a null group key forms its own group (pandas ``dropna=False`` —
    rows are never silently discarded), and null order values sort
    first on ascending / last on descending columns (Spark's
    ``asc()``/``desc()`` defaults), via one stable single-column sort
    per order key with a per-column ``na_position``.

    CAVEAT (floating-point order columns only): Arrow-to-pandas
    conversion maps BOTH SQL NULL and double NaN to pandas NaN, so the
    cut cannot give them Spark's distinct orderings (Spark sorts NaN
    as the LARGEST double but NULL by the asc/desc default). Exact
    window parity therefore requires NaN-free float order columns —
    true of every in-engine score (cosine is zero-guarded, distances
    are rounded finite values). Pass NaN-bearing columns through a
    ``nanvl``/flag normalization first if you need them ranked.
    """
    group_cols = list(group_cols)
    order_cols = list(order_cols)

    def _cut(batches):
        for pdf in batches:
            if len(pdf):
                # stable per-column sorts compose right-to-left into
                # the multi-key order; per-column na_position mirrors
                # Spark's nulls-first-asc / nulls-last-desc defaults
                for c, asc in reversed(order_cols):
                    pdf = pdf.sort_values(
                        c, ascending=asc, kind="mergesort",
                        na_position="first" if asc else "last")
                pdf = pdf.groupby(group_cols, sort=False, dropna=False).head(k)
            yield pdf

    return df.mapInPandas(_cut, schema=df.schema)


def group_topk(df: DataFrame, group_cols: Sequence[str], k: int,
               order_cols: Sequence[tuple[str, bool]],
               rank_col: str | None = None) -> DataFrame:
    """Exact per-group top-k that survives a pathologically hot group.

    A plain rank window moves EVERY row of a group into one task — at
    100 TB a group holding 10% of the corpus is a straggler that
    ``spark.sql.adaptive`` cannot split (windows aren't skew-join
    rewritable). This is the two-phase shape ``similarity.topk_cosine``
    uses, generalized: a map-local cut (``local_topk_cut``) keeps at
    most k rows per group per Arrow batch (so the shuffle carries
    k * groups * batches survivors, never the hot group's full row
    set), then an exact rank window over the survivors. ``order_cols``
    is [(col, ascending)] and must be a TOTAL order within a group
    (end with a unique tiebreak column) — then the global top-k is a
    subset of the union of the local top-ks and the cut loses nothing.
    Nulls: null group keys are their own group; null order values sort
    where Spark's asc()/desc() put them (first asc, last desc) in both
    phases.

    ``rank_col`` adds the final 1-based rank; None drops it.
    """
    partial = local_topk_cut(df, group_cols, k, order_cols)
    w = Window.partitionBy(*group_cols).orderBy(
        *[F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_cols])
    ranked = partial.withColumn("__rn", F.row_number().over(w)) \
                    .filter(F.col("__rn") <= k)
    if rank_col is None:
        return ranked.drop("__rn")
    return ranked.withColumnRenamed("__rn", rank_col)


def domain_caps(df: DataFrame, domain_col: str, cap: int, key_col: str,
                seed: int = 0, fast: bool = False) -> DataFrame:
    """Per-domain document cap (Common-Crawl-style curation: no single
    site/source may contribute more than ``cap`` documents). The kept
    set is the ``cap`` smallest key-hashes per domain — a uniform
    random-but-reproducible draw, robust to hot domains via
    ``group_topk``'s map-local cut (a domain with 10^9 docs never
    lands in one window task)."""
    u = uniform_hash(key_col, seed, fast=fast)
    capped = df.withColumn("__u", u)
    return group_topk(capped, [domain_col], cap,
                      [("__u", True), (key_col, True)]).drop("__u")


def mixture_sample(df: DataFrame, domain_col: str,
                   weights: dict[str, float], key_col: str,
                   seed: int = 0, fast: bool = False) -> DataFrame:
    """Fixed-mixture corpus builder: downsample so the kept corpus
    matches the target domain proportions ``weights`` exactly in
    expectation, keeping as much data as feasibility allows.

    The largest achievable mixed-corpus size is S = min_d(n_d / p_d)
    (the scarcest domain relative to its target binds everyone); each
    domain then keeps rate_d = p_d * S / n_d of its rows — the binding
    domain keeps everything, abundant domains downsample. Domains not
    in ``weights`` are dropped (weight 0). This is the standard
    pretraining-mixture shape (fixed per-source sampling proportions);
    ``temperature_resample`` is its exponent-parameterized sibling.

    Determinism: the keep decision is ``uniform_hash(key) < rate_d``
    (pure function of key+seed); rates derive from exact integer
    counts through IEEE-correctly-rounded ops an SQL oracle reproduces
    bit-identically. The only driver traffic is |weights| counts —
    the same scalar budget class as a watermark read.
    """
    doms = sorted(d for d, p in weights.items() if p > 0)
    if not doms:
        return df.limit(0)
    rows = (df.filter(F.col(domain_col).isin(doms))
            .groupBy(domain_col).agg(F.count(F.lit(1)).alias("n")).collect())
    n = {r[0]: r[1] for r in rows}
    present = [d for d in doms if n.get(d)]
    if not present:
        return df.limit(0)
    cap = min(n[d] / weights[d] for d in present)
    rates = {d: weights[d] * cap / n[d] for d in present}
    u = uniform_hash(key_col, seed, fast=fast)
    rate = None
    for d in present:
        branch = (rate if rate is not None else F.when(F.lit(False), F.lit(0.0)))
        rate = branch.when(F.col(domain_col) == d, F.lit(rates[d]))
    return df.filter(F.col(domain_col).isin(present)).filter(u < rate)


def mixture_repeat(df: DataFrame, domain_col: str,
                   weights: dict[str, float], key_col: str,
                   max_epochs: float = 2.0, seed: int = 0,
                   fast: bool = False) -> DataFrame:
    """Epoch-aware fixed-mixture builder: like ``mixture_sample`` but
    scarce domains may be REPEATED (rate > 1) up to ``max_epochs``
    passes — the standard pretraining recipe when the target mix
    demands more of a domain than one epoch of it contains (Llama-
    style up-sampling; ``mixture_sample`` can only downsample).

    The achievable mixed-corpus size is T = min_d(n_d * max_epochs /
    p_d) — the domain that would need more than ``max_epochs`` passes
    binds everyone; each domain then contributes rate_d = p_d * T /
    n_d copies per row (the binding domain repeats exactly
    ``max_epochs``x, abundant domains downsample below 1). A row
    yields floor(rate_d) certain copies plus one more when
    ``uniform_hash(key) < frac(rate_d)``; copies are numbered by an
    ``epoch`` column (0-based) so a trainer can interleave passes.
    ``max_epochs=1`` keeps at most one copy of anything and the kept
    SET equals ``mixture_sample``'s.

    Determinism: the copy count is a pure function of (key, seed) and
    exact integer counts through IEEE-correctly-rounded ops, so an SQL
    oracle reproduces the multiset bit-identically. Driver traffic is
    |weights| count scalars; the explode is row-local (no shuffle).
    """
    doms = sorted(d for d, p in weights.items() if p > 0)
    if not doms:
        return df.limit(0).withColumn("epoch", F.lit(0))
    rows = (df.filter(F.col(domain_col).isin(doms))
            .groupBy(domain_col).agg(F.count(F.lit(1)).alias("n")).collect())
    n = {r[0]: r[1] for r in rows}
    present = [d for d in doms if n.get(d)]
    if not present:
        return df.limit(0).withColumn("epoch", F.lit(0))
    cap = min(n[d] * max_epochs / weights[d] for d in present)
    rates = {d: weights[d] * cap / n[d] for d in present}
    u = uniform_hash(key_col, seed, fast=fast)
    rate = None
    for d in present:
        branch = (rate if rate is not None else F.when(F.lit(False), F.lit(0.0)))
        rate = branch.when(F.col(domain_col) == d, F.lit(rates[d]))
    copies = (F.floor(rate) +
              F.when(u < rate - F.floor(rate), F.lit(1)).otherwise(F.lit(0))
              ).cast("int")
    return (df.filter(F.col(domain_col).isin(present))
            .withColumn("__copies", copies)
            .filter(F.col("__copies") > 0)
            .withColumn("epoch", F.explode(
                F.sequence(F.lit(0), F.col("__copies") - 1)))
            .drop("__copies"))


def temperature_resample(df: DataFrame, domain_col: str, key_col: str,
                         alpha: float = 0.5, seed: int = 0,
                         fast: bool = False) -> DataFrame:
    """Temperature-flatten a multi-domain corpus: keep each row of
    domain d with probability ``(n_max / n_d) ** (alpha - 1)`` so the
    kept counts are proportional to ``n_d ** alpha`` (alpha=1 keeps
    everything, alpha=0 equalizes domains, alpha=0.5 is the standard
    multilingual-rebalancing temperature). The largest domain is the
    anchor (keep rate 1.0) — resampling only ever downsamples.

    Determinism at 100 TB: the keep decision is a pure function of
    (key, seed) via ``uniform_hash`` — stable across re-runs and
    cluster layouts. The rate is ``pow`` over two exact integer counts
    (for alpha=0.5, a single IEEE-correctly-rounded sqrt), so an SQL
    oracle reproduces it bit-identically — no float-sum order drift.

    Plan: one count aggregation (map-side combine, |domains| rows), a
    broadcast join of the rates, and a filter. No big-table shuffle.
    """
    from pyspark.sql.functions import broadcast

    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    n_max = counts.agg(F.max("__n").alias("m"))
    if alpha == 0.5:
        # sqrt and division are IEEE correctly-rounded (pow is not):
        # (m/n)^(-1/2) == sqrt(n/m) bit-exactly on every engine
        rate = F.sqrt(F.col("__n").cast("double") / F.col("m").cast("double"))
    else:
        rate = F.pow(F.col("m").cast("double") / F.col("__n").cast("double"),
                     F.lit(alpha - 1.0))
    rates = (counts.crossJoin(broadcast(n_max))
             .select(domain_col, rate.alias("__rate")))
    u = uniform_hash(key_col, seed, fast=fast)
    return (df.join(broadcast(rates), domain_col)
              .filter(u < F.col("__rate")).drop("__rate"))
