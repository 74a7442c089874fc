"""Checkpoint / lineage table + resumable runner.

The reference resumes interrupted harvests with a sorted done-list diffed
against the new URI list (``comm -13`` — doc/JACQ/JACQ-import-to-
GRAPH_20220815.md:60-89) and tracks per-stage progress in side-channel
logs. The engine's equivalent is a checkpoint table (FIXTURES.md §5):

    (run_id, stage, partition_key, rows_in, rows_out, rows_dropped,
     status, updated_ts)

and a resumable runner that shards the conversation keyspace into hash
buckets, processes each bucket through the full pipeline, writes the
output under ``bucket=K`` and appends a ``done`` row. Resume = left-anti
join of buckets against the done set — a re-run after a crash re-executes
only unfinished buckets, and re-running a finished job is a no-op
(idempotence). Per-stage row counters come from ``Observation`` hooks on
the single write action (no extra passes over the data).
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

from ..plans.pipeline import build_triples

CKPT_SCHEMA = ("run_id string, stage string, partition_key string, "
               "rows_in long, rows_out long, rows_dropped long, "
               "status string, updated_ts timestamp")


def bucket_of(conv_id_col, n_buckets: int):
    return F.pmod(F.xxhash64(conv_id_col), F.lit(n_buckets))


def read_checkpoint(spark: SparkSession, ckpt_path: str) -> DataFrame:
    if os.path.exists(ckpt_path):
        return spark.read.parquet(ckpt_path)
    return spark.createDataFrame([], schema=CKPT_SCHEMA)


def _append_ckpt(spark: SparkSession, ckpt_path: str, run_id: str, stage: str,
                 key: str, rows_in: int, rows_out: int, dropped: int,
                 status: str) -> None:
    row = [(run_id, stage, key, rows_in, rows_out, dropped, status,
            dt.datetime.now(dt.timezone.utc).replace(tzinfo=None))]
    spark.createDataFrame(row, schema=CKPT_SCHEMA).write.mode("append").parquet(ckpt_path)


def done_buckets(spark: SparkSession, ckpt_path: str, run_id: str) -> set[int]:
    ckpt = read_checkpoint(spark, ckpt_path)
    rows = (ckpt.filter((F.col("run_id") == run_id) & (F.col("status") == "done")
                        & (F.col("stage") == "materialize"))
            .select("partition_key").distinct().collect())
    return {int(r["partition_key"]) for r in rows}


def run_resumable(spark: SparkSession, transcripts: DataFrame, out_path: str,
                  ckpt_path: str, run_id: str, n_buckets: int = 8,
                  fail_after_bucket: int | None = None) -> None:
    """Process transcripts bucket-by-bucket with checkpointing.

    ``fail_after_bucket`` is a test hook that raises after K buckets
    complete, simulating a mid-run crash for the resume tests.

    Entity-level enrichment is computed within a bucket (all turns of a
    conversation share a bucket, so per-turn semantics are exact; the
    reference similarly enriches per shard file). The final table is read
    with ``spark.read.parquet(out_path)`` — bucket subdirs are unified by
    partition discovery.

    INVARIANT (weaker than the one-shot path): entity-level triples for
    an entity mentioned in several buckets are physically duplicated
    across ``bucket=K`` partitions — the unified read is set-equal to the
    one-shot output but not row-unique. Run :func:`compact_buckets` once
    after all buckets are done to restore the
    ``dropDuplicates(graph,subj,pred,obj)`` invariant.
    """
    done = done_buckets(spark, ckpt_path, run_id)
    completed = 0
    for b in range(n_buckets):
        if b in done:
            continue
        part = transcripts.filter(bucket_of(F.col("conv_id"), n_buckets) == b)
        obs_in = Observation(f"in_{run_id}_{b}")
        part = part.observe(obs_in, F.count(F.lit(1)).alias("n"))
        final = build_triples(part)
        obs_out = Observation(f"out_{run_id}_{b}")
        final = final.observe(obs_out, F.count(F.lit(1)).alias("n"))
        (final.write.mode("overwrite")
         .partitionBy("graph")
         .parquet(f"{out_path}/bucket={b}"))
        rows_in = int(obs_in.get["n"])
        rows_out = int(obs_out.get["n"])
        _append_ckpt(spark, ckpt_path, run_id, "materialize", str(b),
                     rows_in, rows_out, 0, "done")
        completed += 1
        if fail_after_bucket is not None and completed >= fail_after_bucket:
            raise RuntimeError(f"injected failure after bucket {b}")


def compact_buckets(spark: SparkSession, bucketed_path: str,
                    final_path: str) -> DataFrame:
    """Cross-bucket compaction: one global
    ``dropDuplicates(graph,subj,pred,obj)`` over the unified bucketed
    output, rewritten as a flat graph table — restores the one-shot
    path's row-uniqueness invariant (entity-level enrichment triples can
    be physically duplicated across ``bucket=K`` partitions).

    The dedupe goes through :func:`finalize_triples` (round 6): the
    stored ``graph`` column is DROPPED before the exchange and re-derived
    from ``subj`` on the survivors — ``graph`` is the same deterministic
    host-prefix expression that produced it at bucket-write time, so the
    output is bit-identical while the compaction's one wide shuffle
    carries one fewer string column (the same ~quarter-payload narrowing
    finalize_triples gives the one-shot pipeline)."""
    from ..operators.materialize import finalize_triples, write_graph_table

    unified = finalize_triples(
        spark.read.parquet(bucketed_path)
        .select("subj", "pred", "obj", "obj_is_iri"))
    write_graph_table(unified, final_path)
    return spark.read.parquet(final_path)
