"""Corpus-curation operators: decontamination, repetition filters,
PII scrubbing.

The filters every large-scale training-data pipeline runs between raw
text and training shards:

- ``contamination`` — benchmark decontamination by n-gram overlap
  (the GPT-3/Gopher approach: a training document sharing enough
  n-grams with an eval set is contaminated and must be dropped).
- ``repetition_metrics`` — Gopher-style repetition quality signals
  (Rae et al. 2021 §A1.1): fraction of duplicate tokens / duplicate
  n-grams / mass of the most frequent token. High values mean
  boilerplate or degenerate text.
- ``scrub_pii`` / ``pii_metrics`` — regex redaction of emails, IPv4s
  and phone-shaped numbers with per-document match counts. Pure
  ``regexp_replace``/``regexp_count`` — JVM-side, no UDFs, and the
  patterns are RE2-compatible so the SQL oracle reproduces them.

Scale notes: repetition and PII are per-row expressions (no shuffle,
pushes through any partitioning). Contamination builds the eval-side
n-gram set ONCE and broadcasts it when small (the common case — eval
suites are MBs against a 100 TB corpus); the corpus side streams
through explode → broadcast-semi-join → per-doc re-aggregate, one
shuffle keyed by doc id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.text import shingles, tokens

# RE2- and Java-regex-compatible PII patterns (no lookaround, no \b
# ambiguity across engines). IPv4 boundary: a non-digit-non-dot char,
# end of string, or a sentence-final dot — but never a dot followed by
# more digits, so '1.2.3.4.5' version strings stay untouched.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"(^|[^0-9.])((?:[0-9]{1,3}\.){3}[0-9]{1,3})([^0-9.]|\.$|$)"
PHONE_RE = r"\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"

PII_TOKENS = {"email": "<EMAIL>", "phone": "<PHONE>", "ip": "<IP>"}


# ------------------------------------------------------------ contamination

def contamination(corpus: DataFrame, eval_df: DataFrame, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  broadcast_eval: bool = True) -> DataFrame:
    """Per-corpus-document n-gram overlap against an eval set.

    Returns ``id_col, n_ngrams, n_hit, overlap`` (overlap = hit
    fraction of the document's DISTINCT n-grams; callers drop docs
    above a threshold, commonly 0.0 — any hit — for exact-match
    benchmarks, or ~0.5 for fuzzy ones).

    The eval n-gram set is deduplicated and (by default) broadcast;
    the corpus side is one explode + semi-ish left join + groupBy on
    the doc id. Documents shorter than n tokens contribute their whole
    text as one n-gram (same convention as ``shingles``).
    """
    ev = (eval_df.select(F.explode(shingles(text_col, n)).alias("g"))
                 .distinct())
    if broadcast_eval:
        ev = F.broadcast(ev)
    ev = ev.withColumn("__hit", F.lit(1))

    grams = (corpus
             .select(F.col(id_col), F.explode(shingles(text_col, n)).alias("g"))
             .distinct())
    joined = grams.join(ev, "g", "left")
    return (joined.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_ngrams"),
                 F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"))
            .select(id_col, "n_ngrams", "n_hit",
                    F.round(F.col("n_hit") / F.col("n_ngrams"), 6).alias("overlap")))


def decontaminate(corpus: DataFrame, eval_df: DataFrame, n: int = 8,
                  max_overlap: float = 0.0, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Corpus minus contaminated documents (overlap > max_overlap).
    Anti-join on the flagged id set — the flagged set is small, so the
    join broadcasts."""
    flagged = (contamination(corpus, eval_df, n, text_col, id_col)
               .filter(F.col("overlap") > max_overlap)
               .select(id_col))
    return corpus.join(F.broadcast(flagged), id_col, "left_anti")


# ------------------------------------------------------- repetition metrics

def dup_token_ratio(col: Column | str) -> Column:
    """1 - distinct/total tokens: repeated-word mass (Gopher-style)."""
    toks = tokens(col)
    n = F.size(toks)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - F.size(F.array_distinct(toks)) / n, 6))


def dup_ngram_ratio(col: Column | str, n: int = 2) -> Column:
    """1 - distinct/total n-grams: repeated-phrase mass."""
    grams = shingles(col, n)
    total = F.size(grams)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - F.size(F.array_distinct(grams)) / total, 6))


def top_token_ratio(col: Column | str) -> Column:
    """Mass of the single most frequent token. Computed with
    higher-order functions (per-distinct-token occurrence count, then
    array_max) — O(distinct * n) per row, all JVM-side, no shuffle."""
    toks = tokens(col)
    n = F.size(toks)
    counts = F.transform(
        F.array_distinct(toks),
        lambda d: F.size(F.filter(toks, lambda t: t == d)))
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.round(F.array_max(counts) / n, 6))


def repetition_metrics(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher repetition panel per document."""
    return df.select(
        F.col(id_col),
        dup_token_ratio(text_col).alias("dup_token_ratio"),
        dup_ngram_ratio(text_col, 2).alias("dup_2gram_ratio"),
        top_token_ratio(text_col).alias("top_token_ratio"),
    )


# ---------------------------------------------------------------- PII scrub

def scrub_pii(col: Column | str) -> Column:
    """Redact emails, phone-shaped numbers and IPv4s with typed
    placeholder tokens. Order matters: emails first (an email's domain
    must not be half-eaten by the IP rule), then phones, then IPs."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, EMAIL_RE, PII_TOKENS["email"])
    out = F.regexp_replace(out, PHONE_RE, PII_TOKENS["phone"])
    # IPV4_RE keeps its 1-char context groups; restore them around the token
    out = F.regexp_replace(out, IPV4_RE, "$1" + PII_TOKENS["ip"] + "$3")
    return out


def pii_metrics(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts + the scrubbed text's md5 (so an
    oracle can attest the redacted output without shipping it)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(c, F.lit(PHONE_RE)).alias("n_phone"),
        F.regexp_count(c, F.lit(IPV4_RE)).alias("n_ip"),
        F.md5(scrub_pii(text_col)).alias("scrubbed_md5"),
    )


# ------------------------------------------------- Gopher quality rules

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_words: int = 50,
                   max_words: int = 100_000,
                   stopwords: "tuple[str, ...]" = GOPHER_STOPWORDS,
                   min_stop_hits: int = 2) -> DataFrame:
    """The full Gopher document-quality rule panel (Rae et al. 2021,
    Appendix A) as native Column expressions — one projection, no
    shuffle, trivially map-parallel at 100 TB:

    - word count in [min_words, max_words]
    - mean word length in [3, 10]
    - symbol-to-word ratio (``#`` or ``...``) <= 0.1
    - < 90% of lines bullet-started; < 30% of lines ellipsis-ended
    - >= 80% of words contain an alphabetic character
    - >= 2 distinct Gopher stopwords present

    Returns the metric panel plus the combined ``passes`` flag, so the
    same output serves filtering (``.filter("passes")``) and corpus
    diagnostics (aggregate the ratios).
    """
    toks = tokens(text_col)
    n = F.size(toks)
    nz = F.greatest(n, F.lit(1))
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    # NULL (not 0.0) for token-less docs, matching SQL SUM-over-empty
    # semantics (DuckDB list_sum([]) = NULL) so oracles agree
    mean_len = F.when(n > 0, F.round(
        F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t)) / nz, 6))
    symbol_ratio = F.round(
        (F.regexp_count(F.col(text_col), F.lit(r"#"))
         + F.regexp_count(F.col(text_col), F.lit(r"\.\.\."))) / nz, 6)
    bullet_ratio = F.round(
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))) / n_lines, 6)
    ellipsis_ratio = F.round(
        F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$"))) / n_lines, 6)
    alpha_ratio = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / nz, 6)
    stop_hits = F.size(F.array_intersect(
        F.transform(toks, F.lower),
        F.array(*[F.lit(s) for s in stopwords])))
    out = df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    passes = (
        (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("bullet_ratio") < 0.9) & (F.col("ellipsis_ratio") < 0.3)
        & (F.col("alpha_ratio") >= 0.8)
        & (F.col("stop_hits") >= min_stop_hits))
    return out.withColumn("passes", passes)
