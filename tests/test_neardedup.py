"""Incremental cross-batch NEAR-dup gate tests: band-store admission,
within-batch connected-component survivor rule, idempotent epoch
replay, and the foreachBatch writer end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from glean_cetaf_rdfs_spark.streaming import neardedup as ND

BASE = ("the quick brown fox jumps over the lazy dog while the spark "
        "engine shuffles partitions across the cluster nodes every night")
OTHER = ("completely unrelated content about database query optimization "
         "and columnar storage formats with vectorized execution kernels")
THIRD = ("yet another standalone document discussing streaming watermarks "
         "and stateful operators inside structured streaming pipelines")


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_batch_near_dup_dropped(spark, tmp_path):
    store = str(tmp_path / "bands")
    b1 = _df(spark, [(1, BASE), (2, OTHER)])
    kept1 = ND.incremental_near_dedup(spark, b1, "doc_id", "text", store, 0)
    assert {r["doc_id"] for r in kept1.collect()} == {1, 2}
    # batch 2: a near-dup of doc 1 (one word appended) and a unique doc
    b2 = _df(spark, [(10, BASE + " tonight"), (11, THIRD)])
    kept2 = ND.incremental_near_dedup(spark, b2, "doc_id", "text", store, 1)
    assert {r["doc_id"] for r in kept2.collect()} == {11}
    # the store holds both epochs' survivor bands
    st = spark.read.parquet(store)
    assert {r["epoch"] for r in st.select("epoch").distinct().collect()} == {0, 1}


def test_within_batch_cluster_keeps_min_id(spark, tmp_path):
    store = str(tmp_path / "bands")
    batch = _df(spark, [(5, BASE), (3, BASE + " tonight"),
                        (9, BASE + " again"), (7, OTHER)])
    kept = ND.incremental_near_dedup(spark, batch, "doc_id", "text", store, 0)
    got = {r["doc_id"] for r in kept.collect()}
    # 3/5/9 band-collide into one component → min id 3 survives
    assert got == {3, 7}
    # exact-replay semantics: pushing the SAME batch again as a new
    # epoch admits nothing (every doc collides with epoch-0 bands)
    kept_again = ND.incremental_near_dedup(spark, batch, "doc_id", "text",
                                           store, 1)
    assert kept_again.count() == 0


def test_epoch_replay_idempotent(spark, tmp_path):
    store = str(tmp_path / "bands")
    ND.incremental_near_dedup(
        spark, _df(spark, [(1, BASE)]), "doc_id", "text", store, 0)
    b2 = _df(spark, [(10, OTHER), (11, OTHER + " extra")])
    kept_a = ND.incremental_near_dedup(spark, b2, "doc_id", "text", store, 1)
    n_store_a = spark.read.parquet(store).count()
    # replay of epoch 1 (crash-recovery path): same survivors, store
    # rows for the epoch overwritten not appended
    kept_b = ND.incremental_near_dedup(spark, b2, "doc_id", "text", store, 1)
    assert ({r["doc_id"] for r in kept_a.collect()}
            == {r["doc_id"] for r in kept_b.collect()} == {10})
    assert spark.read.parquet(store).count() == n_store_a


def test_foreachbatch_writer_end_to_end(spark, tmp_path):
    """Two files forced into two micro-batches (maxFilesPerTrigger=1):
    the second file's near-dup is dropped across batches, output lands
    partitioned by _epoch."""
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    store, ckpt = str(tmp_path / "bands"), str(tmp_path / "ckpt")
    _df(spark, [(1, BASE), (2, OTHER)]).coalesce(1).write.parquet(inp)
    _df(spark, [(10, BASE + " tonight"), (11, THIRD)]) \
        .coalesce(1).write.mode("append").parquet(inp)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(inp))
    q = (stream.writeStream
         .foreachBatch(ND.near_dedup_batch_writer(spark, "doc_id", "text",
                                                  out, store))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(out)
    ids = {r["doc_id"] for r in got.collect()}
    # both batch-1 docs admitted; batch 2 admits only the unique doc
    # (file→batch order is ingestion order with maxFilesPerTrigger=1)
    assert ids == {1, 2, 11}
    assert got.select("_epoch").distinct().count() == 2


def test_incremental_curation_writer_end_to_end(spark, tmp_path):
    """Streaming curation: gates + cross-batch near-dup in two forced
    micro-batches. Batch 1 drops its PII doc; batch 2 drops the
    near-dup of a batch-1 survivor and its repetitive doc; fresh clean
    docs pass. Exact dups are subsumed by the band gate."""
    from glean_cetaf_rdfs_spark.operators.repetition import GOPHER_THRESHOLDS
    from glean_cetaf_rdfs_spark.plans.curation import incremental_curation_writer

    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    store, ckpt = str(tmp_path / "bands"), str(tmp_path / "ckpt")
    _df(spark, [(1, BASE),
                (2, "write to bob@mail.example.org for details please now")]) \
        .coalesce(1).write.parquet(inp)
    _df(spark, [(10, BASE + " tonight"),
                (11, "spam spam spam spam spam spam spam spam spam spam"),
                (12, THIRD),
                (13, BASE)]) \
        .coalesce(1).write.mode("append").parquet(inp)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(inp))
    q = (stream.writeStream
         .foreachBatch(incremental_curation_writer(
             spark, "doc_id", "text", out, store,
             repetition_thresholds=GOPHER_THRESHOLDS))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(out)
    ids = {r["doc_id"] for r in got.collect()}
    # 2 = PII; 10 = near-dup of 1; 11 = Gopher repetition; 13 = exact
    # replay of 1 (caught by the band store, no separate exact stage)
    assert ids == {1, 12}
    assert got.select("_epoch").distinct().count() == 2


def test_bandless_docs_always_admitted(spark, tmp_path):
    """Docs too short to shingle (< n tokens) and NULL texts produce no
    bands, cannot collide, and must pass the gate untouched — they
    previously vanished from the survivor join entirely."""
    store = str(tmp_path / "bands")
    batch = _df(spark, [(1, BASE), (2, "tiny doc"), (3, None)])
    kept = ND.incremental_near_dedup(spark, batch, "doc_id", "text", store, 0)
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 3}
    # band-less docs leave no store memory (documented: nothing to
    # collide with), so a re-send in a later epoch passes again
    kept2 = ND.incremental_near_dedup(
        spark, _df(spark, [(9, "tiny doc")]), "doc_id", "text", store, 1)
    assert {r["doc_id"] for r in kept2.collect()} == {9}


def test_transitive_chain_dropped(spark, tmp_path):
    """A collides with stored S; B collides with A but NOT with S
    directly. Batch CC over {S, A, B} drops both — the incremental gate
    must match (previously B slipped through because store-hit docs
    were excluded from the edge set)."""
    from glean_cetaf_rdfs_spark.operators.dedupe import band_signatures

    X = "one two three four five six seven eight nine ten eleven twelve"
    Y = ("red orange yellow green blue indigo violet crimson amber teal "
         "navy gold")
    Z = "cat dog bird fish horse sheep goat cow duck goose mouse rabbit"
    W = "north south east west up down left right front back inner outer"
    S, A, B = X + " " + Y, Y + " " + Z, Z + " " + W
    # premise check (fails loudly if the md5 minhash ever changes):
    # A shares a band with S, B with A, B NOT with S
    sig = band_signatures(
        _df(spark, [(0, S), (1, A), (2, B)]), "doc_id", "text").collect()
    by = {}
    for r in sig:
        by.setdefault((r["band"], r["band_sig"]), set()).add(r["id"])
    def col(x, y):
        return any({x, y} <= s for s in by.values())
    assert col(0, 1) and col(1, 2) and not col(0, 2)

    store = str(tmp_path / "bands")
    kept0 = ND.incremental_near_dedup(
        spark, _df(spark, [(0, S)]), "doc_id", "text", store, 0)
    assert {r["doc_id"] for r in kept0.collect()} == {0}
    kept1 = ND.incremental_near_dedup(
        spark, _df(spark, [(1, A), (2, B)]), "doc_id", "text", store, 1)
    assert kept1.count() == 0
    # ...and the dropped docs' bands persist, so a LATER near-dup of B
    # (colliding with B only) is also caught
    kept2 = ND.incremental_near_dedup(
        spark, _df(spark, [(3, B + " extra")]), "doc_id", "text", store, 2)
    assert kept2.count() == 0


def _parquet_files(root):
    import os

    return [os.path.join(r, f) for r, _d, fs in os.walk(root)
            for f in fs if f.endswith(".parquet")]


def test_compact_band_store_preserves_decisions(spark, tmp_path):
    """Round-6 compaction (the VERDICT r5 scale gap): after folding
    committed epochs into the epoch=-1 partition, later batches make
    IDENTICAL admission decisions against a twin uncompacted store, and
    the compacted store holds fewer files/rows (duplicate bands across
    epochs collapse)."""
    store_a = str(tmp_path / "bands_compacted")
    store_b = str(tmp_path / "bands_plain")
    batches = [
        [(1, BASE), (2, OTHER)],
        [(10, BASE + " tonight"), (11, THIRD)],
        [(20, OTHER), (21, OTHER + " again")],   # exact replay of band set
    ]
    for e, rows in enumerate(batches):
        for store in (store_a, store_b):
            ND.incremental_near_dedup(spark, _df(spark, rows), "doc_id",
                                      "text", store, e)
    ND.compact_band_store(spark, store_a, upto_epoch=2)
    st = spark.read.parquet(store_a)
    assert ({r["epoch"] for r in st.select("epoch").distinct().collect()}
            == {ND.COMPACTED_EPOCH})
    # duplicate (band, band_sig) rows across epochs collapsed
    plain = spark.read.parquet(store_b)
    assert st.count() < plain.count()
    assert st.count() == plain.select("band", "band_sig").distinct().count()
    assert len(_parquet_files(store_a)) < len(_parquet_files(store_b))
    # the compacted band SET is identical
    assert ({(r["band"], r["band_sig"]) for r in st.collect()}
            == {(r["band"], r["band_sig"])
                for r in plain.select("band", "band_sig").distinct().collect()})
    # later batches decide identically on both stores: a near-dup of an
    # epoch-0 doc, a near-dup of a DROPPED epoch-1 doc, and a fresh doc
    nxt = [(30, BASE + " anew"), (31, BASE + " tonight ok"), (32,
            "entirely fresh words about glacier moraines and alpine flora "
            "surveyed during long field seasons")]
    kept_a = ND.incremental_near_dedup(spark, _df(spark, nxt), "doc_id",
                                       "text", store_a, 3)
    kept_b = ND.incremental_near_dedup(spark, _df(spark, nxt), "doc_id",
                                       "text", store_b, 3)
    assert ({r["doc_id"] for r in kept_a.collect()}
            == {r["doc_id"] for r in kept_b.collect()})
    # re-compaction folds the new epoch plus the old compacted partition
    ND.compact_band_store(spark, store_a, upto_epoch=3)
    st2 = spark.read.parquet(store_a)
    assert ({r["epoch"] for r in st2.select("epoch").distinct().collect()}
            == {ND.COMPACTED_EPOCH})


def test_writer_compacts_periodically(spark, tmp_path):
    """near_dedup_batch_writer(compact_every=2): after epoch 2 commits,
    epochs 0-1 live in the compacted partition, epoch 2 keeps its own
    (it may still replay), and replaying epoch 2 over the compacted
    store stays idempotent."""
    out = str(tmp_path / "out")
    store = str(tmp_path / "bands")
    write = ND.near_dedup_batch_writer(spark, "doc_id", "text", out, store,
                                       compact_every=2)
    write(_df(spark, [(1, BASE)]), 0)
    write(_df(spark, [(10, OTHER)]), 1)
    write(_df(spark, [(20, THIRD)]), 2)
    st = spark.read.parquet(store)
    assert ({r["epoch"] for r in st.select("epoch").distinct().collect()}
            == {ND.COMPACTED_EPOCH, 2})
    # crash-recovery replay of epoch 2: same survivors, same store rows
    n_before = st.count()
    write(_df(spark, [(20, THIRD)]), 2)
    assert spark.read.parquet(store).count() == n_before
    ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert ids == {1, 10, 20}
