"""Source/sink operator tests (SURVEY.md §2.1)."""

from __future__ import annotations

from glean_cetaf_rdfs_spark.sources.readers import (
    gate_well_formed,
    read_transcripts,
    read_uri_list,
)
from glean_cetaf_rdfs_spark.sources.sinks import write_ntriples_text, write_shards


def test_read_uri_list(spark, tmp_path):
    p = tmp_path / "urilist.txt"
    p.write_text(
        "# comment line\n"
        "http://a.example/1\tInstA\tPlantae\r\n"
        "https://b.example/2 more words\n"
        "not a uri\n"
        "  http://c.example/3\n"
        "\n")
    got = [r["uri"] for r in read_uri_list(spark, str(p)).orderBy("uri").collect()]
    assert got == ["http://a.example/1", "http://c.example/3", "https://b.example/2"]


def test_gate_well_formed(spark):
    rows = [("c1", 0, "user", "hi", None, None),
            (None, 1, "user", "x", None, None),
            ("c1", -2, "user", "x", None, None),
            ("c1", 2, "user", None, None, None)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
    ok, bad = gate_well_formed(df)
    assert ok.count() == 1 and bad.count() == 3


def test_transcript_reader_roundtrip(spark, tiny_df, tmp_path):
    path = str(tmp_path / "t.parquet")
    tiny_df.write.parquet(path)
    back = read_transcripts(spark, path)
    assert back.schema["turn_idx"].dataType.typeName() == "integer"
    assert back.count() == tiny_df.count()


def test_ntriples_text_sink(spark, tmp_path):
    triples = spark.createDataFrame(
        [("http://s/1", "http://p", "http://o", True),
         ("http://s/1", "http://p", 'say "hi" \\ there', False)],
        "subj string, pred string, obj string, obj_is_iri boolean")
    out = str(tmp_path / "nt")
    write_ntriples_text(triples, out)
    lines = sorted(r["value"] for r in spark.read.text(out).collect())
    assert lines[0] == '<http://s/1> <http://p> "say \\"hi\\" \\\\ there" .'
    assert lines[1] == "<http://s/1> <http://p> <http://o> ."


def test_partitioned_shard_sink(spark, tmp_path):
    df = spark.createDataFrame([("g1", i) for i in range(10)] + [("g2", 1)],
                               "graph string, x int")
    out = str(tmp_path / "shards")
    write_shards(df, out, ["graph"], max_records_per_file=3)
    back = spark.read.parquet(out)
    assert back.count() == 11
    assert {r["graph"] for r in back.select("graph").distinct().collect()} == {"g1", "g2"}


def test_trig_subject_grouped_sink(spark, tmp_path):
    from glean_cetaf_rdfs_spark.sources.sinks import write_trig_text

    triples = spark.createDataFrame(
        [("http://g1", "http://s/1", "http://p/a", "http://o", True),
         ("http://g1", "http://s/1", "http://p/b", "lit", False),
         ("http://g1", "http://s/2", "http://p/a", "http://o2", True),
         ("http://g2", "http://s/3", "http://p/a", "http://o3", True)],
        "graph string, subj string, pred string, obj string, obj_is_iri boolean")
    out = str(tmp_path / "trig")
    write_trig_text(triples, out)
    back = spark.read.text(out + "/graph=http%3A%2F%2Fg1") \
        if False else spark.read.option("basePath", out).text(out)
    blocks = sorted("".join(r["value"] for r in back.collect()).split(" ."))
    # s/1's two predicates share ONE block, ';'-separated, sorted
    joined = [b for b in blocks if "s/1" in b]
    assert len(joined) == 1
    assert '<http://p/a> <http://o> ;' in joined[0]
    assert '<http://p/b> "lit"' in joined[0]
