"""Incremental (cross-batch) NEAR-duplicate deduplication.

streaming/ingest.py's ``dedup_watermark`` gate drops EXACT cross-batch
replays (content-hash state in the streaming checkpoint). Near-dups —
re-crawled pages with a changed footer, re-exported docs with new
timestamps — survive it, and a growing corpus accretes them batch by
batch. This module is the incremental form of the batch MinHash-LSH
path (operators/dedupe.minhash_lsh_pairs): each micro-batch's band
signatures are checked against a persistent BAND STORE of everything
admitted so far; colliding docs are dropped, survivors' bands are
appended.

Semantics — candidate-level (blocking-only) dedup: a doc is dropped
when it shares ANY (band, band_sig) bucket with an admitted doc. That
is the LSH candidate test WITHOUT the exact-Jaccard verify step the
batch path runs, because verification against history would require
storing every admitted doc's shingle set — O(corpus tokens) state
instead of O(corpus × bands) rows. Tune precision/recall with
(n, k, bands) exactly as in minhash_lsh_pairs; with the defaults a
band collision needs k/bands consecutive minhash agreements, which for
dissimilar docs is vanishingly unlikely. Dropping on candidacy is the
conservative direction for curation (never admits a near-dup the
batch path would have caught).

Within a batch, collisions form an edge set resolved by connected
components (operators/cc.py) keeping the min-id doc per cluster — the
same survivor rule as the batch q41 APPLY path, so one batch replayed
through this gate equals the batch pipeline's output.

State layout (100 TB shape): the band store is parquet partitioned by
``epoch``; a batch joins against it shuffle-on-(band, band_sig) — no
broadcast assumption, the store grows with the corpus — and appends
its survivors' bands by OVERWRITING its own epoch partition (dynamic
partition overwrite). Replays are therefore idempotent: the store read
EXCLUDES the current epoch, so a half-written epoch from a crashed
attempt neither suppresses its own replay nor double-counts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cc import connected_components
from ..operators.dedupe import band_signatures

BAND_STORE_SCHEMA = "band int, band_sig string, epoch long"


def read_band_store(spark: SparkSession, path: str) -> DataFrame:
    if os.path.exists(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], schema=BAND_STORE_SCHEMA)


def incremental_near_dedup(spark: SparkSession, batch_df: DataFrame,
                           id_col: str, text_col: str,
                           band_store_dir: str, epoch_id: int,
                           n: int = 3, k: int = 8, bands: int = 4,
                           checkpoint_dir: str | None = None) -> DataFrame:
    """Admit the subset of ``batch_df`` that is not a near-duplicate of
    any previously admitted doc (band store) or of a smaller-id doc in
    the same batch (connected components over band-collision edges);
    persist the survivors' band signatures under ``epoch=epoch_id``;
    return the surviving rows with the input schema.

    Designed as the body of a ``foreachBatch`` writer
    (:func:`near_dedup_batch_writer`) but callable directly for
    batch-at-a-time incremental jobs. RETURNS AN EAGER RESULT: the
    band-store write materializes the survivor set, and the returned
    frame is read back from that decision (localCheckpoint) so callers
    can write it without recomputing the LSH plan. ``checkpoint_dir``
    feeds :func:`connected_components` (reliable checkpoints on a real
    cluster; default executor-local)."""
    bnd = band_signatures(batch_df, id_col, text_col, n, k, bands)
    bnd = bnd.localCheckpoint(eager=True)  # minhash once, joined thrice
    prior = (read_band_store(spark, band_store_dir)
             .filter(F.col("epoch") != epoch_id)
             .select("band", "band_sig").distinct())
    hit = bnd.join(prior, ["band", "band_sig"]).select("id").distinct()
    fresh_bnd = bnd.join(hit, "id", "left_anti")
    edges = (fresh_bnd.select(F.col("id").alias("src"), "band", "band_sig")
             .join(fresh_bnd.select(F.col("id").alias("dst"),
                                    "band", "band_sig"),
                   ["band", "band_sig"])
             .filter(F.col("src") < F.col("dst"))
             .select("src", "dst").distinct())
    comp = connected_components(edges, checkpoint_dir=checkpoint_dir)
    within_dup = (comp.filter(F.col("member") != F.col("canonical"))
                  .select(F.col("member").alias("id")))
    # freeze the survivor decision BEFORE touching the store: the band
    # write below overwrites this epoch's partition, and a lazy plan
    # re-reading the store afterwards would race its own output
    survivor_ids = (fresh_bnd.select("id").distinct()
                    .join(within_dup, "id", "left_anti")
                    .localCheckpoint(eager=True))
    (fresh_bnd.join(survivor_ids, "id")
     .select("band", "band_sig", F.lit(epoch_id).cast("long").alias("epoch"))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("epoch").parquet(band_store_dir))
    return batch_df.join(survivor_ids.withColumnRenamed("id", id_col)
                         .select(id_col), id_col)


def near_dedup_batch_writer(spark: SparkSession, id_col: str, text_col: str,
                            out_path: str, band_store_dir: str,
                            n: int = 3, k: int = 8, bands: int = 4):
    """foreachBatch body: gate the micro-batch through
    :func:`incremental_near_dedup` (epoch = Spark's ``epoch_id``, so a
    replayed batch overwrites its own band partition and appends the
    same survivors), append survivors to ``out_path``::

        (stream.writeStream
            .foreachBatch(near_dedup_batch_writer(spark, "doc_id",
                                                  "text", out, store))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start())

    Output append is not atomic with the store overwrite (standard
    foreachBatch at-least-once); exactly-once output needs the sink
    side keyed by (epoch, id) — e.g. partitionBy an ``_epoch`` column
    with the same dynamic-overwrite trick, which is what this writer
    does."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        kept = incremental_near_dedup(spark, batch_df, id_col, text_col,
                                      band_store_dir, epoch_id,
                                      n=n, k=k, bands=bands)
        (kept.withColumn("_epoch", F.lit(epoch_id).cast("long"))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_epoch").parquet(out_path))

    return write
