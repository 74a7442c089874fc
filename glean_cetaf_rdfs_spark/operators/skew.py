"""Skew-handling utilities: salted aggregation and salted broadcast-side
join — the engine's explicit answer to hot keys (the reference randomizes
harvest order with ``shuf`` for the same reason, get_RDF4domain…:488;
north rule: "skew from hot entities and long conversations is handled
with salted repartitioning").

When to use which:
* hot GROUP BY keys → :func:`salted_count` / the two-phase pattern: add a
  deterministic salt, pre-aggregate on (key, salt), then merge — the hot
  key's rows spread over ``n_salts`` reducers. (Spark's map-side partial
  aggregation already does this for algebraic aggregates; the explicit
  form matters for exact-distinct style aggregations.)
* hot JOIN keys, big×small → replicate the small side per salt
  (:func:`salted_join_small`) so each hot-key shard joins locally.
* hot JOIN keys, big×big → leave to AQE skew-join (enabled in the
  session); salting both sides multiplies data.

Salts are deterministic (hash of a sibling column), never random — reruns
must be idempotent (checkpoint/resume contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_from: Column, n_salts: int = 16,
              col_name: str = "_salt") -> DataFrame:
    return df.withColumn(col_name, F.pmod(F.xxhash64(salt_from), F.lit(n_salts)))


def _stable_salt_src(df: DataFrame) -> Column:
    """Deterministic salt source: hash of the full row content MIXED with
    the row's position (partition id + intra-partition offset, i.e.
    monotonically_increasing_id). Content hash alone sent byte-identical
    duplicate rows of a hot key to ONE shard — degrading exactly in the
    duplicate-heavy case salting targets; the position term spreads them
    across shards. Reruns over the same input splits are stable (both
    terms are functions of the scan), and the salt only routes rows to
    intermediate shards — final aggregates/joins are salt-invariant, so
    the checkpoint/resume contract (identical RESULTS on rerun) holds
    under any partition layout."""
    return F.xxhash64(*[F.col(c) for c in df.columns],
                      F.monotonically_increasing_id())


def salted_count(df: DataFrame, key: str, n_salts: int = 16,
                 salt_from: Column | None = None) -> DataFrame:
    """groupBy(key).count() in two phases for skewed keys:
    (key, salt) partial counts → merge. → (key, n)."""
    salt_src = salt_from if salt_from is not None else _stable_salt_src(df)
    salted = with_salt(df, salt_src, n_salts)
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_n"))
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))


def salted_distinct(df: DataFrame, key: str, payload: str,
                    n_salts: int = 16) -> DataFrame:
    """distinct (key, payload) for skewed keys: dedupe within (key, salt)
    shards first (salt = hash of payload → same pair always lands in the
    same shard, so shard-local dedupe is exact), then globally.
    → distinct (key, payload)."""
    salted = with_salt(df, F.col(payload), n_salts)
    local = salted.dropDuplicates([key, payload, "_salt"]).drop("_salt")
    return local.dropDuplicates([key, payload])


def salted_join_small(big: DataFrame, small: DataFrame, key: str,
                      n_salts: int = 16, how: str = "inner") -> DataFrame:
    """big ⋈ small on a skewed key: salt the big side deterministically,
    replicate the small side once per salt, join on (key, salt). The hot
    key's rows spread across n_salts tasks instead of one straggler."""
    spark = big.sparkSession
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    big_s = with_salt(big, _stable_salt_src(big), n_salts)
    small_s = small.crossJoin(F.broadcast(salts))
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")
