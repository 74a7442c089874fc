"""Fuzzy entity linking: MinHash/LSH blocking + Arrow-vectorized candidate
scoring (the north-rule linking path for mentions that aren't exact
dictionary keys).

The reference links only by exact URI prefix (its sed address blocks,
JACQ.sh:434-812); at transcript scale, entity mentions also appear as
free-text names with typos and word-order variants. This operator links a
mention-name column against a dictionary of entity names without the
O(mentions × dictionary) cross product:

1. block: character-n-gram MinHash signatures, banded — mentions and
   dictionary entries sharing any band bucket become candidate pairs
   (same banded-LSH machinery as dedupe.minhash_lsh_pairs, same
   md5-portable hashing),
2. score: a vectorized pandas UDF computes n-gram Jaccard on the
   candidate pairs only (Arrow batches — the per-pair set intersection
   is the part Spark expressions do badly),
3. resolve: best score ≥ threshold wins per mention (max_by).

Shuffle budget: the dictionary side is tiny (broadcast through the
band-bucket join); one aggregation keyed by mention.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _char_ngrams(s: str, n: int = 3) -> set[str]:
    s = " " + s.lower().strip() + " "
    if len(s) < n:
        return {s}
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def _ngram_col(col, n: int = 3):
    padded = F.concat(F.lit(" "), F.lower(F.trim(col)), F.lit(" "))
    return F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(padded) - (n - 1), F.lit(1))),
        lambda i: F.substring(padded, i, n),
    ))


def _band_keys(col, k: int = 12, bands: int = 6, n: int = 3):
    """Banded minhash over character n-grams as array<string> of
    'band:sig' keys — identical hashing (md5 string minima) for any
    input column, engine-portable."""
    grams = _ngram_col(col, n)
    rows_per_band = k // bands
    minhashes = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(F.transform(
            grams, lambda g: F.md5(F.concat_ws("|", i.cast("string"), g)))),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.concat_ws(
            ":", b.cast("string"),
            F.array_join(F.slice(minhashes, b * rows_per_band + 1, rows_per_band), ",")),
    )


def fuzzy_link(mentions: DataFrame, names: DataFrame,
               mention_col: str = "mention", name_col: str = "name",
               id_col: str = "canonical_id",
               threshold: float = 0.5, k: int = 12, bands: int = 6,
               n: int = 3) -> DataFrame:
    """→ (mention, canonical_id, score): best dictionary match per
    distinct mention string with n-gram Jaccard ≥ threshold."""
    m = (mentions.select(F.col(mention_col).alias("mention")).distinct()
         .withColumn("bk", F.explode(_band_keys(F.col("mention"), k, bands, n))))
    d = (names.select(F.col(name_col).alias("name"), F.col(id_col).alias("cid"))
         .withColumn("bk", F.explode(_band_keys(F.col("name"), k, bands, n))))
    cands = (m.join(F.broadcast(d), "bk")
             .select("mention", "name", "cid").distinct())

    def score(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            a = pdf["mention"].map(lambda s: _char_ngrams(s, n))
            b = pdf["name"].map(lambda s: _char_ngrams(s, n))
            inter = [len(x & y) for x, y in zip(a, b)]
            union = [len(x | y) for x, y in zip(a, b)]
            pdf = pdf.assign(score=[round(i / u, 4) if u else 0.0
                                    for i, u in zip(inter, union)])
            yield pdf

    scored = cands.mapInPandas(
        score, schema="mention string, name string, cid string, score double")
    return (scored.filter(F.col("score") >= threshold)
            .groupBy("mention")
            .agg(F.max_by(F.struct("cid", "score", "name"), "score").alias("m"))
            .select("mention", F.col("m.cid").alias("canonical_id"),
                    F.col("m.score").alias("score")))
