"""Structured Streaming ingest tests: exactly-once file pickup via the
streaming checkpoint, incremental append to the graph table, windowed
watermark aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from glean_cetaf_rdfs_spark.data.synthetic import transcripts_pdf
from glean_cetaf_rdfs_spark.streaming.ingest import (
    run_incremental,
    stream_transcripts,
    streaming_turn_rate,
)


def _write_batch(spark, pdf, path):
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def test_incremental_ingest_exactly_once(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, transcripts_pdf(10), inp)
    run_incremental(spark, inp, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # no new files → no new rows (checkpoint remembers processed files)
    run_incremental(spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == n1

    # a second batch of conversations → only the delta is appended
    _write_batch(spark, transcripts_pdf(5, offset=10), inp)
    run_incremental(spark, inp, out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n2 > n1

    # subjects from batch 1 still present exactly once per triple
    final = spark.read.parquet(out)
    assert final.filter(F.col("subj").contains("conv-000000/")).count() > 0


def test_incremental_cross_batch_dedup(spark, tmp_path):
    """Replayed input across TRIGGERS must not duplicate graph rows: the
    second trigger re-lands every batch-1 turn (new file, identical
    content) plus a delta; the watermark-bounded input dedup gate must
    drop the replays so the graph table has no duplicate
    (graph, subj, pred, obj) row, while the delta's triples land."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pdf = transcripts_pdf(6)
    _write_batch(spark, pdf, inp)
    # default gate: arrival-time watermark, so the fixture's 30-day
    # event-ts spread is irrelevant — no unique row is ever "late"
    run_incremental(spark, inp, out, ckpt)
    n1 = spark.read.parquet(out).count()

    # trigger 2: full replay of batch 1 + 3 new conversations
    _write_batch(spark, pdf, inp)
    _write_batch(spark, transcripts_pdf(3, offset=6), inp)
    run_incremental(spark, inp, out, ckpt)

    final = spark.read.parquet(out)
    dup = (final.groupBy("graph", "subj", "pred", "obj")
           .count().filter(F.col("count") > 1).count())
    assert dup == 0
    assert final.count() > n1  # the delta appended
    assert final.filter(F.col("subj").contains("conv-000006/")).count() > 0


def test_streaming_watermark_agg(spark, tmp_path):
    inp = str(tmp_path / "in")
    _write_batch(spark, transcripts_pdf(20), inp)
    agg = streaming_turn_rate(spark, inp, window="6 hours")
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName("turn_rate")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM turn_rate").collect()
    assert rows and sum(r["n_turns"] for r in rows) == len(transcripts_pdf(20))
    roles = {r["role"] for r in rows}
    assert {"user", "assistant", "tool"} <= roles


def test_stream_schema(spark, tmp_path):
    inp = str(tmp_path / "in")
    _write_batch(spark, transcripts_pdf(2), inp)
    s = stream_transcripts(spark, inp)
    assert s.isStreaming
    assert [f.name for f in s.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_stateful_conversation_progress(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches: each
    conversation's turns are split over two files, processed one file per
    trigger — the SECOND snapshot must include the FIRST batch's counts
    (state carried), and the final counts must equal the batch totals."""
    from glean_cetaf_rdfs_spark.streaming.ingest import conversation_progress_stream

    inp = str(tmp_path / "in")
    pdf = transcripts_pdf(6)
    _write_batch(spark, pdf[pdf["turn_idx"] % 2 == 0], inp)
    _write_batch(spark, pdf[pdf["turn_idx"] % 2 == 1], inp)

    stream = stream_transcripts(spark, inp, max_files_per_trigger=1)
    prog = conversation_progress_stream(stream)
    q = (prog.writeStream.outputMode("update")
         .format("memory").queryName("conv_prog")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM conv_prog").collect()

    latest: dict[str, int] = {}
    snaps: dict[str, int] = {}
    for r in rows:
        latest[r["conv_id"]] = max(latest.get(r["conv_id"], 0), r["n_turns"])
        snaps[r["conv_id"]] = snaps.get(r["conv_id"], 0) + 1
    want = pdf.groupby("conv_id").size().to_dict()
    assert latest == want
    # state carried across micro-batches: conversations got ≥2 snapshots
    assert max(snaps.values()) >= 2


def test_streaming_exact_dedup_within_watermark(spark, tmp_path):
    """Duplicate rows (same content key) arriving in the same and in
    later micro-batches inside the watermark horizon collapse to one;
    distinct keys all survive."""
    from glean_cetaf_rdfs_spark.streaming.ingest import streaming_exact_dedup

    inp = str(tmp_path / "in")
    pdf = transcripts_pdf(4)
    _write_batch(spark, pdf, inp)        # originals
    _write_batch(spark, pdf.head(20), inp)  # exact duplicates, next file
    stream = stream_transcripts(spark, inp).withColumn("ckey", F.md5("text"))
    deduped = streaming_exact_dedup(stream, ["ckey"], ts_col="ts",
                                    watermark="7 days")
    q = (deduped.writeStream.outputMode("append")
         .format("memory").queryName("dedup_out")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT ckey FROM dedup_out").collect()
    keys = [r["ckey"] for r in got]
    assert len(keys) == len(set(keys))  # no duplicate key survived
    import hashlib
    want = {hashlib.md5(t.encode()).hexdigest() for t in pdf["text"]}
    assert set(keys) == want  # every distinct content key survived
