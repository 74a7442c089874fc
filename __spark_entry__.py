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
    for name, (fn, _sql) in RELATIONAL_QUERIES.items():
        out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in RELATIONAL_QUERIES.items()
            if sql is not None}
