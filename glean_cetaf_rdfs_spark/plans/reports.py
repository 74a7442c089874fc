"""Reporting/audit utilities over the graph table — the engine's version
of the reference's reconciliation reports (SURVEY.md §5.4) and the
namespace-collision caveat (P8, reference README.md:317).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_graph_report(triples: DataFrame) -> DataFrame:
    """Per named-graph count + exemplar rows — the reference's post-import
    SPARQL accounting (doc/bin/count_cspp_title_all_20220822.json via
    print_markdown-table_from_json.sh): one row per graph with total
    triples, distinct subjects, and an exemplar subject."""
    return (triples.groupBy("graph")
            .agg(F.count(F.lit(1)).alias("n_triples"),
                 F.countDistinct("subj").alias("n_subjects"),
                 F.min("subj").alias("exemplar_subj"))
            .orderBy("graph"))


def progress_report(ckpt: DataFrame, run_id: str, n_buckets: int) -> DataFrame:
    """A8 ETA / running throughput (get_RDF4domain_from_urilist_with_
    ETA.sh:252-363: elapsed × remaining/done): derived from the lineage
    table's ``done`` rows per stage — buckets done, rows/sec since the
    first completion, and ETA seconds for the remaining buckets. The
    reference recomputes this per worker slot; here it is one small
    aggregation over the checkpoint table."""
    done = (ckpt.filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
            .groupBy("stage")
            .agg(F.countDistinct("partition_key").alias("n_done"),
                 F.sum("rows_out").cast("long").alias("rows_out"),
                 F.min("updated_ts").alias("t_first"),
                 F.max("updated_ts").alias("t_last")))
    elapsed = (F.unix_timestamp("t_last") - F.unix_timestamp("t_first")).cast("double")
    per_bucket = elapsed / F.greatest(F.col("n_done") - 1, F.lit(1))
    remaining = F.greatest(F.lit(n_buckets) - F.col("n_done"), F.lit(0))
    return done.select(
        "stage", "n_done", remaining.alias("n_remaining"), "rows_out",
        F.round(elapsed, 3).alias("elapsed_sec"),
        F.round(F.col("rows_out") / F.greatest(elapsed, F.lit(1e-9)), 1)
        .alias("rows_per_sec"),
        F.round(per_bucket * remaining, 3).alias("eta_sec"),
    ).orderBy("stage")


def namespace_report(triples: DataFrame) -> DataFrame:
    """Predicate-namespace histogram + collision check (P8 analog): the
    reference merges xmlns headers with `sort --unique` and documents
    that one prefix bound to two IRIs silently loses data
    (README.md:317). Relationally, the sanity check is: group predicate
    local-names by namespace and flag local-names appearing under
    multiple namespaces."""
    ns = F.concat(F.substring_index("pred", "#", 1),
                  F.when(F.col("pred").contains("#"), F.lit("#"))
                  .otherwise(F.lit("")))
    with_ns = triples.withColumn("ns", F.when(F.col("pred").contains("#"), ns)
                                 .otherwise(F.concat(
                                     F.expr("substring(pred, 1, length(pred) - length(substring_index(pred, '/', -1)))"))))
    local = F.coalesce(
        F.when(F.col("pred").contains("#"), F.substring_index("pred", "#", -1)),
        F.substring_index("pred", "/", -1))
    return (with_ns.withColumn("local_name", local)
            .groupBy("local_name")
            .agg(F.countDistinct("ns").alias("n_namespaces"),
                 F.count(F.lit(1)).alias("n_triples"))
            .withColumn("collision", F.col("n_namespaces") > 1)
            .orderBy("local_name"))
