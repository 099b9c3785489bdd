"""Broadcast Bloom-filter membership: join pre-filtering at corpus scale.

The 100 TB decontamination/blocklist problem: drop (or keep) the rows
of a huge corpus whose key appears in a reference set that is too big
to ship as an exact broadcast hash set, while the corpus side must not
shuffle. A Bloom filter compresses the reference set to ``m`` BITS
(1.2 GB covers 1e9 keys at 1% FP) with zero false negatives, so:

    phase 1 (map-only): probe the broadcast bit array — no join, no
        shuffle; survivors ≈ true matches + fp_rate of the corpus.
    phase 2 (exact): semi-join ONLY the survivors against the
        reference to discharge false positives.

Net effect: the shuffle/join volume drops from |corpus| to
|matches| + fp*|corpus| while the RESULT IS EXACTLY the semi-join —
the filter is a plan optimization, not a semantics change (which is
why ``bloom_semi_join``/``bloom_anti_join`` carry exact SQL oracles).
Spark's own runtime bloom pruning (spark.sql.optimizer.runtime.
bloomFilter.enabled) applies the same idea inside one query; this
operator materializes it across queries and pipelines.

Determinism & the Python boundary: bit positions use Kirsch-
Mitzenmacher double hashing pos_i = (h1 + i*h2) mod m over two
JVM-side ``xxhash64`` values — hashing never happens in Python. The
probe UDF is an Arrow-batched numpy bit-test against the broadcast
packed array (vectorized; ~ns per probe).

Building is DISTRIBUTED: each partition maps its keys to
(word_index, bit_mask) pairs (the same ``_positions`` kernel the
probe uses, so build and probe are bit-identical by construction),
a ``groupBy(word).agg(bit_or)`` folds them with map-side combine,
and the driver collects only the packed 64-bit words — at most
m/64 rows no matter how many reference keys exist. Driver memory is
therefore O(filter size) (the same artifact it must broadcast
anyway), NOT O(reference keys): a 1e9-key blocklist at 1% FP
collects ≤150M words once, not 1e9 (h1, h2) pairs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_H1_SEED, _H2_SEED = 0x51ED, 0xC0FFEE


@dataclass(frozen=True)
class BloomModel:
    bits: bytes           # packed little-endian bit array, m/8 bytes
    m: int                # number of bits
    k: int                # number of hash probes
    n: int                # keys inserted (for fp-rate reporting)
    words_collected: int = 0  # rows the build collected (≤ ceil(m/64))

    @property
    def fp_rate(self) -> float:
        return (1.0 - math.exp(-self.k * self.n / self.m)) ** self.k


def _hash_cols(key: Column) -> tuple[Column, Column]:
    s = key.cast("string")
    return (F.xxhash64(s, F.lit(_H1_SEED)), F.xxhash64(s, F.lit(_H2_SEED)))


def _positions(h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing, uint64 wraparound."""
    a = h1.astype(np.uint64)[:, None]
    b = h2.astype(np.uint64)[:, None]
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((a + i * b) % np.uint64(m)).astype(np.int64)


def size_for(n: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for ``n`` keys at ``fpp``."""
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, round(m / n * math.log(2))) if n else 1
    return m, k


def kmv_n_keys(ref: DataFrame, key_col: str, k: int = 256,
               shards: int = 16) -> int:
    """Sketched distinct-key cardinality for sizing a Bloom filter:
    sharded KMV partials (``operators/sketches.py`` — per-shard window
    state stays bounded even though the group is global) merged into
    one estimate, rounded up. One cheap map-side-combined pass instead
    of ``distinct().count()``'s full-width exact shuffle; feed the
    result to ``build_bloom(n_keys=...)`` so the build scan is the
    only pass that touches every reference row. Bloom sizing is robust
    to the ±1/sqrt(k) (~6% at k=256) estimate error — ``m`` just lands
    a few percent off optimal."""
    from cdc_data_pipeline_spark.operators.sketches import kmv_merge, kmv_partials

    est = kmv_merge(kmv_partials(ref, (), key_col, k=k, shards=shards),
                    (), k=k).first()
    return max(1, int(math.ceil(est["distinct_est"]))) if est else 1


def build_bloom(ref: DataFrame, key_col: str, fpp: float = 0.01,
                n_keys: int | float | None = None) -> BloomModel:
    """Fully distributed bit set: hash JVM-side, position + word/mask
    in an Arrow batch (same ``_positions`` kernel as the probe, so
    build and probe agree bit-for-bit), fold with a map-side-combined
    ``bit_or`` per 64-bit word, and collect ONLY the set words —
    ≤ ceil(m/64) rows regardless of reference-key count (duplicate
    keys just re-set bits and vanish in the combine).

    ``n_keys`` sizes the bit array; pass an estimate (``kmv_n_keys``,
    or any KMV/HLL figure you already track) to skip the exact
    ``distinct().count()`` pre-pass — at scale the default two-scan
    path pays a full extra shuffle purely for sizing."""
    n = (max(1, int(math.ceil(n_keys))) if n_keys is not None
         else ref.select(key_col).distinct().count())
    m, k = size_for(n, fpp)
    h1c, h2c = _hash_cols(F.col(key_col))

    @F.pandas_udf("array<long>")
    def positions(h1: pd.Series, h2: pd.Series) -> pd.Series:
        pos = _positions(h1.to_numpy(), h2.to_numpy(), m, k)
        return pd.Series(list(pos))

    words = (
        ref.select(F.explode(positions(h1c, h2c)).alias("pos"))
        .select(
            F.expr("pos div 64").alias("word"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))")
             .alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .toPandas())

    n_words = (m + 63) // 64
    packed = np.zeros(n_words, dtype=np.uint64)
    if len(words):
        packed[words["word"].to_numpy()] = words["bits"].to_numpy().astype(np.int64).view(np.uint64)
    return BloomModel(bits=packed.astype("<u8").tobytes()[: (m + 7) // 8],
                      m=m, k=k, n=n, words_collected=len(words))


def might_contain(df: DataFrame, model: BloomModel, key_col: str,
                  out_col: str = "__maybe") -> DataFrame:
    """Adds a boolean column: False -> key DEFINITELY absent from the
    reference; True -> present or false positive. Map-only: the bit
    array rides the closure (Spark ships it once per executor)."""
    m, k, bits = model.m, model.k, model.bits

    @F.pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        arr = np.unpackbits(np.frombuffer(bits, dtype=np.uint8),
                            bitorder="little")[:m].astype(bool)
        pos = _positions(h1.to_numpy(), h2.to_numpy(), m, k)
        return pd.Series(arr[pos].all(axis=1))

    h1c, h2c = _hash_cols(F.col(key_col))
    return df.withColumn(out_col, probe(h1c, h2c))


def bloom_semi_join(big: DataFrame, ref: DataFrame, big_key: str,
                    ref_key: str | None = None, fpp: float = 0.01,
                    model: BloomModel | None = None) -> DataFrame:
    """EXACT left-semi join, bloom-accelerated: map-only prefilter
    discharges ~(1-fpp) of non-matching rows without a join, then the
    exact semi-join runs over the survivors only. Result rows and
    columns are identical to ``big.join(ref, ..., 'left_semi')``."""
    rk = ref_key or big_key
    bf = model if model is not None else build_bloom(ref, rk, fpp)
    survivors = (might_contain(big, bf, big_key)
                 .filter(F.col("__maybe")).drop("__maybe"))
    # exact verification: the optimizer (AQE) picks broadcast when the
    # distinct reference keys fit — no driver-side size probe needed
    return survivors.join(ref.select(F.col(rk).alias(big_key)).distinct(),
                          big_key, "left_semi")


def bloom_anti_join(big: DataFrame, ref: DataFrame, big_key: str,
                    ref_key: str | None = None, fpp: float = 0.01,
                    model: BloomModel | None = None) -> DataFrame:
    """EXACT left-anti join, bloom-accelerated: rows whose key is
    definitely absent pass through with NO join at all; only the
    ``maybe`` sliver (matches + false positives) is anti-joined, then
    unioned back. This is the decontamination shape: scrub a 100 TB
    corpus against an eval-set blocklist with join traffic
    proportional to the contamination rate, not the corpus."""
    rk = ref_key or big_key
    bf = model if model is not None else build_bloom(ref, rk, fpp)
    flagged = might_contain(big, bf, big_key)
    clean = flagged.filter(~F.col("__maybe")).drop("__maybe")
    maybe = flagged.filter(F.col("__maybe")).drop("__maybe")
    verified = maybe.join(ref.select(F.col(rk).alias(big_key)).distinct(),
                          big_key, "left_anti")
    return clean.unionByName(verified)
