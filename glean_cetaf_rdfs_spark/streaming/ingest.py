"""Structured Streaming ingest — the incremental growth path.

The reference is batch but hand-rolls streaming concerns: interrupted
harvests resume from done-lists, new URI lists arrive per domain and are
diffed against processed state (SURVEY.md §2.10). The engine's batch
checkpoint (streaming/checkpoint.py) covers that; this module is the
native-streaming variant: new transcript files landing in a directory are
picked up exactly-once via Spark's streaming file source + checkpoint
location, run through the same extraction→canonicalization plan, and
appended to the graph table with ``foreachBatch`` (which allows the same
dedupe-within-batch + partitioned write as the batch path).

``Trigger.AvailableNow`` processes everything present and stops — the
idiomatic "catch up, then exit" mode for cron-style incremental jobs; a
long-running deployment would switch the trigger only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.canonicalize import canonicalize_triples
from ..operators.extract import extract_triples
from ..operators.materialize import finalize_triples
from ..sources.readers import TRANSCRIPT_SCHEMA


def stream_transcripts(spark: SparkSession, input_dir: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    reader = (spark.readStream.format("parquet")
              .schema(TRANSCRIPT_SCHEMA))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(input_dir)


def run_incremental(spark: SparkSession, input_dir: str, out_path: str,
                    checkpoint_dir: str, *,
                    dedup_watermark: str | None = "7 days") -> None:
    """Process all currently-available transcript files into the graph
    table, exactly once per file (streaming checkpoint), then stop.

    ``dedup_watermark`` (default 7 days) bounds CROSS-BATCH exact
    deduplication of input turns: a turn whose full row content replays
    in a later file/trigger is dropped before extraction
    (``dropDuplicatesWithinWatermark`` state keyed on the row hash,
    carried in the streaming checkpoint), so re-exported or
    double-landed input cannot append duplicate triples to the graph
    table — the round-3 gap where within-batch dedupe alone let
    cross-batch duplicates through.

    The watermark rides an ARRIVAL-time column (the micro-batch
    timestamp), NOT the event-time ``ts``: transcript files land in no
    event-time order, and an event-time watermark would silently DELETE
    late-arriving unique rows (standard late-data semantics — wrong for
    an ingestion gate). With arrival time, no row is ever "late":
    unique rows always pass, and a replay is dropped iff it arrives
    within the horizon of the first copy's arrival. State evicts after
    the horizon (bounded memory); replays arriving later than that are
    the job of the batch ``compact_buckets`` sweep
    (streaming/checkpoint.py). ``None`` disables the gate.

    Checkpoint compatibility: enabling the gate adds a stateful
    operator to the streaming plan. A checkpoint created WITHOUT it
    (pre-gate releases, or ``dedup_watermark=None``) cannot be resumed
    with the gate on (Spark validates the stateful-operator layout) —
    keep the setting stable per checkpoint_dir, or start a fresh one."""
    from pyspark.sql import functions as F

    stream = stream_transcripts(spark, input_dir)
    if dedup_watermark is not None:
        stream = (stream
                  .withColumn("_row_md5",
                              F.md5(F.to_json(F.struct(*stream.columns))))
                  .withColumn("_arrival", F.current_timestamp())
                  .withWatermark("_arrival", dedup_watermark)
                  .dropDuplicatesWithinWatermark(["_row_md5"])
                  .drop("_row_md5", "_arrival"))
    raw = extract_triples(stream)
    canonical, sameas = canonicalize_triples(raw)
    spo = (canonical.select("subj", "pred", "obj", "obj_is_iri")
           .unionByName(sameas.select("subj", "pred", "obj", "obj_is_iri")))

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        final = finalize_triples(batch_df)
        (final.write.mode("append").partitionBy("graph").parquet(out_path))

    q = (spo.writeStream
         .foreachBatch(write_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    try:
        q.awaitTermination()
    except Exception as e:  # noqa: BLE001 — re-raise with the real cause
        # the common upgrade trap surfaces as an opaque state-schema /
        # operator-layout streaming error: a checkpoint written before
        # the dedup gate existed (or with it off) cannot resume with the
        # default dedup_watermark='7 days' (see docstring)
        msg = str(e)
        if any(s in msg for s in ("state", "StateSchema", "operator")):
            raise RuntimeError(
                "streaming resume failed — if this checkpoint predates "
                "the cross-batch dedup gate, re-run with "
                "dedup_watermark=None (keep the setting stable per "
                "checkpoint_dir) or start a fresh checkpoint_dir. "
                f"Underlying error: {msg[:500]}") from e
        raise


def streaming_turn_rate(spark: SparkSession, input_dir: str,
                        window: str = "1 hour") -> DataFrame:
    """Windowed event-time aggregation with watermark (late data bounded
    at 1 day): turns per (window, role) — the streaming-native analog of
    the reference's running ETA/progress accounting (A8)."""
    from pyspark.sql import functions as F

    stream = stream_transcripts(spark, input_dir)
    return (stream
            .withWatermark("ts", "1 day")
            .groupBy(F.window("ts", window), "role")
            .agg(F.count(F.lit(1)).alias("n_turns")))


def conversation_progress_stream(stream: DataFrame) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-
    conversation running accumulator — turn count, first/last event time,
    mention count — updated incrementally as turn micro-batches arrive.
    The streaming-native form of the reference's per-domain harvest
    Done-table (doc/JACQ/JACQ-import-to-GRAPH_20220815.md:211-237):
    progress is queryable while ingest runs instead of reconstructed from
    logs afterwards. State is Arrow-batched per group; output mode
    'update' emits one snapshot row per touched conversation per batch.
    → (conv_id, n_turns, first_ts, last_ts, n_mentions)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ("conv_id string, n_turns long, first_ts timestamp, "
                  "last_ts timestamp, n_mentions long")
    state_schema = ("n_turns long, first_ts timestamp, last_ts timestamp, "
                    "n_mentions long")

    def update(key, pdfs, state):
        (conv_id,) = key
        n, first, last, ment = state.get if state.exists else (0, None, None, 0)
        for pdf in pdfs:
            n += len(pdf)
            ment += int(pdf["text"].str.count("https?://").sum())
            lo, hi = pdf["ts"].min(), pdf["ts"].max()
            first = lo if first is None else min(first, lo)
            last = hi if last is None else max(last, hi)
        state.update((n, first, last, ment))
        yield pd.DataFrame([{"conv_id": conv_id, "n_turns": n,
                             "first_ts": first, "last_ts": last,
                             "n_mentions": ment}])

    return (stream.groupBy("conv_id")
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def streaming_exact_dedup(stream: DataFrame, key_cols: list[str],
                          ts_col: str = "ts",
                          watermark: str = "1 hour") -> DataFrame:
    """Streaming exact deduplication: keep the FIRST arrival of each key,
    with dedup state bounded by the event-time watermark
    (``dropDuplicatesWithinWatermark`` — duplicates arriving within the
    watermark horizon of the first copy are dropped; state for keys older
    than the horizon is evicted). Bounded state is the only shape that
    survives 10^12 rows: plain streaming ``dropDuplicates`` retains every
    key forever. The batch analog is operators/dedupe.exact_dedup_groups;
    here the key is usually a content hash column
    (``F.md5(text)``) added upstream. → deduplicated stream."""
    return (stream.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols))
