"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship multi-join aggregation on sf0.001.
``queries()`` — one entry per implemented operator family (SURVEY.md §2)
plus the KG pipeline and training-data operators; each callable takes
(spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
genuinely non-SQL-expressible ops, which get rows-only checks).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from glean_cetaf_rdfs_spark.queries import RELATIONAL_QUERIES  # noqa: E402
from glean_cetaf_rdfs_spark.queries_data import DATA_QUERIES  # noqa: E402

_KG_SCALE = {"sf0.001": 60, "sf0.01": 400, "sf0.1": 2500}


def _kg_pipeline_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship KG pipeline (rows-only: transcripts aren't DuckDB views;
    exactness is pytest-asserted against the pure-Python oracle): run the
    full extract→canonicalize→link→enrich→dedupe plan over deterministic
    synthetic transcripts sized to the sf, count triples per predicate."""
    from glean_cetaf_rdfs_spark.data.synthetic import transcripts_df
    from glean_cetaf_rdfs_spark.plans.pipeline import build_triples

    n = 200
    for key, scale in _KG_SCALE.items():
        if sf_dir.rstrip("/").endswith(key):
            n = scale
    triples = build_triples(transcripts_df(spark, n))
    return (triples.groupBy("pred").agg(F.count(F.lit(1)).alias("n_triples"))
            .orderBy("pred"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue per nation — scan → broadcast dims → join → agg
    → order (exercises pushdown, broadcast join, partial agg)."""
    sf = "/root/testdata/sf0.001"
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    nation = spark.read.parquet(f"{sf}/nation.parquet")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n_items"))
            .orderBy(F.col("revenue").desc()))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for reg in (RELATIONAL_QUERIES, DATA_QUERIES):
        for name, (fn, _sql) in reg.items():
            out[name] = fn
    out["q32_kg_pipeline_predicates"] = _kg_pipeline_predicates
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for reg in (RELATIONAL_QUERIES, DATA_QUERIES):
        for name, (_fn, sql) in reg.items():
            if sql is not None:
                out[name] = sql
    return out
