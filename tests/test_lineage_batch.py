"""Batch-path lineage accounting (validateRDFs.sh:187-205 analog),
app-scoped scratch boundedness, cross-bucket compaction, and the A8
progress/ETA report."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from glean_cetaf_rdfs_spark.plans.pipeline import build_triples, run_pipeline
from glean_cetaf_rdfs_spark.plans.reports import progress_report
from glean_cetaf_rdfs_spark.session import _scratch_dir
from glean_cetaf_rdfs_spark.streaming.checkpoint import compact_buckets, run_resumable


def test_batch_lineage_rows_and_scratch_bounded(spark, tiny_df, tmp_path):
    out, ck = str(tmp_path / "graph"), str(tmp_path / "lineage")
    final = run_pipeline(spark, tiny_df, out, lineage_path=ck, run_id="t1")
    rows = {r["stage"]: r for r in spark.read.parquet(ck).collect()}
    # gate row is written even on a clean run (rows_dropped=0) so
    # consumers can tell "gate ran, zero quarantined" from "gate absent"
    assert set(rows) == {"gate", "extract_canonicalize", "materialize"}
    g = rows["gate"]
    assert g["rows_dropped"] == 0 and g["rows_in"] == g["rows_out"]
    ec = rows["extract_canonicalize"]
    assert ec["rows_in"] == ec["rows_out"] + ec["rows_dropped"]
    assert ec["rows_dropped"] > 0  # fixture always has P4/P5 drops
    mat = rows["materialize"]
    assert mat["rows_out"] == final.count()
    # the accounting invariant holds for EVERY stage row: materialize's
    # input is the observed pre-dedupe union, dropped = dedupe losses
    assert mat["rows_in"] == mat["rows_out"] + mat["rows_dropped"]
    assert mat["rows_dropped"] >= 0
    # scratch stays bounded: one app-scoped dir, reused across runs
    appid = spark.sparkContext.applicationId
    run_pipeline(spark, tiny_df, out, lineage_path=ck, run_id="t2")
    mine = [d for d in glob.glob(_scratch_dir() + "/kg_canon_*") if appid in d]
    assert len(mine) == 1


def test_compact_buckets_restores_uniqueness(spark, tiny_df, tmp_path):
    out, ck = str(tmp_path / "bkt"), str(tmp_path / "ck")
    run_resumable(spark, tiny_df, out, ck, run_id="c1", n_buckets=4)
    compacted = compact_buckets(spark, out, str(tmp_path / "flat"))
    one_shot = build_triples(tiny_df)
    cols = ["graph", "subj", "pred", "obj", "obj_is_iri"]
    assert compacted.count() == compacted.dropDuplicates(cols[:4]).count()
    got = {tuple(r) for r in compacted.select(*cols).collect()}
    want = {tuple(r) for r in one_shot.select(*cols).collect()}
    assert got == want
    assert compacted.count() == len(want)  # row-unique, not just set-equal


def test_progress_report_eta(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [("r1", "materialize", str(k), 100, 90, 10, "done",
             t0 + dt.timedelta(seconds=30 * k)) for k in range(3)]
    ckpt = spark.createDataFrame(
        rows, "run_id string, stage string, partition_key string, rows_in long, "
              "rows_out long, rows_dropped long, status string, updated_ts timestamp")
    rep = progress_report(ckpt, "r1", n_buckets=8).collect()[0]
    assert rep["n_done"] == 3 and rep["n_remaining"] == 5
    assert rep["elapsed_sec"] == 60.0
    assert rep["rows_per_sec"] == round(270 / 60.0, 1)
    assert rep["eta_sec"] == 150.0  # 30 s/bucket * 5 remaining


def test_run_pipeline_gates_malformed_input(spark, tiny_df, tmp_path):
    """Malformed transcript rows (null text, negative turn_idx) must be
    quarantined — written aside, counted to lineage with the stage
    invariant — and the triple output must equal a run over the clean
    subset alone (malformed rows never reach extraction)."""
    import datetime as dt

    bad = spark.createDataFrame([
        ("bad-1", 0, "user", None, None, dt.datetime(2024, 1, 1)),
        ("bad-2", -3, "user", "x", None, dt.datetime(2024, 1, 1)),
    ], schema=tiny_df.schema)
    mixed = tiny_df.unionByName(bad)
    out, ck = str(tmp_path / "g"), str(tmp_path / "lin")
    quar = str(tmp_path / "quarantine")
    final = run_pipeline(spark, mixed, out, lineage_path=ck, run_id="gate1",
                         quarantine_path=quar)
    clean = run_pipeline(spark, tiny_df, str(tmp_path / "g2"))
    cols = ["graph", "subj", "pred", "obj", "obj_is_iri"]
    assert ({tuple(r) for r in final.select(*cols).collect()}
            == {tuple(r) for r in clean.select(*cols).collect()})
    assert spark.read.parquet(quar).count() == 2
    rows = {r["stage"]: r for r in spark.read.parquet(ck).collect()}
    g = rows["gate"]
    assert g["rows_dropped"] == 2
    assert g["rows_in"] == g["rows_out"] + g["rows_dropped"]
