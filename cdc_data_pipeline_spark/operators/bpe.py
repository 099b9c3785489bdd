"""BPE tokenizer training at corpus scale (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The classic trainer never touches the raw corpus after ONE counting
pass: merges are learned from the (word, frequency) table, which is
VOCABULARY-sized — at 100 TB the corpus may hold 10^12 tokens but only
~10^7-10^8 distinct words, so every merge iteration is a small job
over the vocab table, not a corpus scan.

Plan shape per merge:
  1. pair counts: explode each word's adjacent symbol pairs, weighted
     by word frequency — groupBy(pair).sum (map-side combine; the
     shuffle carries distinct pairs, bounded by vocab * avg_word_len).
  2. best pair: orderBy(count desc, pair asc).limit(1) — Spark plans
     TakeOrderedAndProject (map-local partial top-1, no global sort).
     The lexicographic tiebreak makes training DETERMINISTIC.
  3. apply the merge to every word's symbol list (one Arrow batch
     pass over the vocab table) and localCheckpoint every few
     iterations so lineage stays flat across the loop.

Iterative by nature -> no single-statement SQL oracle (the driver
contract explicitly allows rows-only checks for iterative
algorithms); determinism is pinned by unit tests against the
hand-computable classic corpus, and `bpe_segment` round-trips are
property-tested.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.text import tokens

END = "</w>"   # end-of-word marker: merges never cross word boundaries


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): the ONLY corpus-wide pass of training."""
    return (df.select(F.explode(tokens(text_col)).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _init_symbols(words: DataFrame) -> DataFrame:
    """Each word as its character-symbol array + end-of-word marker."""
    return words.select(
        "word", "freq",
        F.concat(F.split(F.col("word"), ""),
                 F.array(F.lit(END))).alias("syms"))


def _pair_counts(symed: DataFrame) -> DataFrame:
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("syms"), i),
                        F.element_at(F.col("syms"), i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    return (symed.select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair").agg(F.sum("freq").alias("n")))


def _apply_one(s: list, a: str, b: str) -> list:
    """Replace every adjacent (a, b) in a symbol list with a+b —
    left-to-right, non-overlapping (the standard BPE apply order).
    The ONE definition both the trainer and the encoder use: the two
    must never diverge or learned merges stop applying."""
    out, i, n = [], 0, len(s)
    while i < n:
        if i + 1 < n and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _merge_udf(a: str, b: str):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def apply_merge(syms: pd.Series) -> pd.Series:
        return syms.map(lambda s: _apply_one(list(s), a, b))

    return apply_merge


def _train_bpe_local(rows, num_merges: int,
                     min_pair_count: int) -> list[tuple[str, str]]:
    """Driver-side Sennrich merge loop over a collected (word, freq)
    table, with INCREMENTAL pair-count maintenance: a pair→owning-word
    index restricts each merge's work to the words it touches, and a
    lazy max-heap (fresh entry pushed on every count change, stale
    entries discarded at the top) finds the next best pair without an
    O(|pairs|) scan per merge. This is what makes a real 32k-merge
    vocabulary tractable — the distributed loop's one-job-per-merge
    scheduler round-trip is hours of fixed latency at that size.

    Tiebreak identical to the distributed path (count desc, then the
    "a b" pair STRING ascending), so both paths learn the same merges
    on the same corpus."""
    import heapq
    from collections import defaultdict

    vocab: list[tuple[list, int]] = [
        (list(w) + [END], int(f)) for w, f in rows]
    counts: dict[tuple[str, str], int] = defaultdict(int)
    where: dict[tuple[str, str], set] = defaultdict(set)
    for wi, (s, f) in enumerate(vocab):
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            counts[p] += f
            where[p].add(wi)
    heap = [(-n, p[0] + " " + p[1], p) for p, n in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges:
        # discard entries whose recorded count is no longer current
        while heap and counts.get(heap[0][2], 0) != -heap[0][0]:
            heapq.heappop(heap)
        if not heap or -heap[0][0] < min_pair_count:
            break
        a, b = heap[0][2]
        merges.append((a, b))
        changed: set = set()
        for wi in where.pop((a, b), ()):
            s, f = vocab[wi]
            new = _apply_one(s, a, b)
            if new == s:  # stale index entry: word no longer has (a,b)
                continue
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] -= f
                changed.add(p)
                if counts[p] == 0:
                    del counts[p]
                    where.pop(p, None)
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                counts[p] += f
                changed.add(p)
                where[p].add(wi)
            vocab[wi] = (new, f)
        counts.pop((a, b), None)
        for p in changed:
            if p in counts:
                heapq.heappush(heap, (-counts[p], p[0] + " " + p[1], p))
    return merges


def train_bpe(df: DataFrame, num_merges: int = 50,
              text_col: str = "text", min_pair_count: int = 2,
              checkpoint_every: int = 8,
              local_vocab_limit: int = 2_000_000) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges. Returns the ordered merge list
    [(left, right), ...] — the tokenizer artifact.

    Stops early when no pair reaches ``min_pair_count``.

    The corpus-wide counting pass is always distributed; the merge
    LOOP runs driver-side whenever the distinct-word table fits
    (``local_vocab_limit`` rows — vocabulary-sized, ~10^7-10^8 words
    even at 100 TB, so the local path is the common case and the only
    wall-clock-sane one at real vocab sizes). Over the limit, the
    distributed loop takes over: driver traffic per iteration is ONE
    (pair, count) row, and the vocab table is checkpointed every
    ``checkpoint_every`` merges so the iteration count never deepens
    lineage unboundedly. Both paths share ``_apply_one`` and the
    (count desc, pair-string asc) tiebreak, so they learn identical
    merge lists; pass ``local_vocab_limit=0`` to force distributed.
    """
    wc = word_counts(df, text_col).localCheckpoint()
    if local_vocab_limit and wc.count() <= local_vocab_limit:
        return _train_bpe_local(
            [(r["word"], r["freq"]) for r in wc.collect()],
            num_merges, min_pair_count)
    symed = _init_symbols(wc)
    merges: list[tuple[str, str]] = []
    for it in range(num_merges):
        best = (_pair_counts(symed)
                .orderBy(F.col("n").desc(), F.col("pair").asc())
                .limit(1).collect())
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["pair"].split(" ")
        merges.append((a, b))
        symed = symed.withColumn("syms", _merge_udf(a, b)(F.col("syms")))
        if (it + 1) % checkpoint_every == 0:
            symed = symed.localCheckpoint()
    return merges


def bpe_segment(df: DataFrame, merges: Sequence[tuple[str, str]],
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge list: (id, n_words, n_bpe_tokens,
    segmented) where ``segmented`` is the per-word subword split
    (space-joined words, subwords '|'-separated). One Arrow-batched
    pass over the corpus — the broadcast artifact is the merge list
    (kilobytes), applied greedily in training order per word (the
    standard BPE encoder)."""
    from pyspark.sql.functions import pandas_udf

    mlist = [tuple(m) for m in merges]

    @pandas_udf("struct<n_words: long, n_tokens: long, segmented: string>")
    def seg(texts: pd.Series) -> pd.DataFrame:
        import re

        # SAME tokenization as the trainer's word_counts: Java's \s is
        # ASCII-only, so the Python split must be ASCII too — a plain
        # str.split() would break on unicode whitespace (NBSP) and
        # segment words the vocabulary never contained
        ws_re = re.compile(r"\s+", re.ASCII)

        # words repeat Zipf-style: encode each DISTINCT word once per
        # batch and reuse (same greedy merge application, so the
        # segmentation is identical — pure memoization)
        seen: dict[str, list] = {}

        def encode_word(w):
            got = seen.get(w)
            if got is None:
                s = list(w) + [END]
                for a, b in mlist:
                    if len(s) < 2:
                        break
                    s = _apply_one(s, a, b)
                seen[w] = got = s
            return got

        rows = []
        for t in texts:
            ws = [w for w in ws_re.split(t or "") if w]
            enc = [encode_word(w) for w in ws]
            rows.append((len(ws), sum(len(e) for e in enc),
                         " ".join("|".join(e) for e in enc)))
        return pd.DataFrame(rows, columns=["n_words", "n_tokens", "segmented"])

    out = df.select(F.col(id_col), seg(F.col(text_col)).alias("s"))
    return out.select(id_col, "s.n_words", "s.n_tokens", "s.segmented")
