"""Round-6 optimization measurement harness (bench.py is frozen for the
driver's measurement; everything exploratory lives here).

Modes:
  python bench_extra.py headline [q...]   - per-query wall (1 warm + median-of-3
                                            collect, same method as bench.py)
  python bench_extra.py plans <tag> [q...] - write .explain("formatted") for each
                                            query to plans/r06/<q>_<tag>.txt
  python bench_extra.py kgprofile         - stage-level KG pipeline profile with
                                            noop sinks (guide §1.4): generate,
                                            extract, annotate+stage-write, full
  python bench_extra.py noop [q...]       - per-query noop-sink wall (isolates
                                            computation from collect)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "q01_pricing_summary", "q03_status_histogram", "q06_done_anti_join",
    "q07_broadcast_lookup_join", "q10_topk_per_group", "q16_sessionize",
    "q17_dedup_exact", "q18_ngram_jaccard", "q19_minhash_lsh",
    "q21_embedding_dup_pairs", "q22_cosine_topk", "q23_lsh_bucket_histogram",
    "q24_lsh_bucket_topk", "q25_token_count", "q28_fingerprint",
    "q30_multimodal_metadata", "q32_kg_pipeline_predicates",
    "q37_dup_clusters_cc", "q39_ivf_topk", "q40_lsh_multiprobe_topk",
    "q46_repeated_span_stats", "q47_pii_scan", "q48_contamination_scan",
    "q49_bpe_token_count", "q50_span_removed_texts", "q51_curation_funnel",
    "q52_stratified_sample", "q53_token_packing", "q55_repetition_signals",
]


def _spark():
    from glean_cetaf_rdfs_spark.session import get_spark

    return get_spark("bench_extra", master=f"local[{CPUS}]",
                     extra_conf={"spark.driver.extraJavaOptions": "-Xms16g"})


def _queries():
    import __spark_entry__ as entrymod

    return entrymod.bench_queries()


def _timed(fn, n=3):
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return round(statistics.median(walls), 3), [round(w, 3) for w in walls]


def cmd_headline(names):
    spark = _spark()
    qs = _queries()
    names = names or HEADLINE
    # warm the JVM/codegen like bench.py
    qs["q03_status_histogram"](spark, SF_DIR).collect()
    warm = str(Path(SF_DIR).parent / "sf0.01")
    qs["q32_kg_pipeline_predicates"](spark, warm).collect()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bx:{name}")
        qs[name](spark, SF_DIR).collect()  # warm run (codegen/files)
        med, walls = _timed(lambda: qs[name](spark, SF_DIR).collect())
        out[name] = med
        print(json.dumps({"q": name, "median": med, "walls": walls}), flush=True)
    print(json.dumps({"detail": "headline_extra", "queries": out,
                      "total": round(sum(out.values()), 3)}))


def cmd_noop(names):
    spark = _spark()
    qs = _queries()
    names = names or HEADLINE

    def run(name):
        (qs[name](spark, SF_DIR).write.format("noop")
         .mode("overwrite").save())

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bx-noop:{name}")
        run(name)
        med, walls = _timed(lambda: run(name))
        out[name] = med
        print(json.dumps({"q": name, "median": med, "walls": walls}), flush=True)
    print(json.dumps({"detail": "noop_extra", "queries": out}))


def cmd_plans(tag, names):
    spark = _spark()
    qs = _queries()
    names = names or HEADLINE
    dest = REPO / "plans" / "r06"
    dest.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        (dest / f"{name}_{tag}.txt").write_text(txt)
        print(f"wrote {name}_{tag}.txt ({txt.count('Exchange')} Exchange)")


def cmd_kgprofile():
    from glean_cetaf_rdfs_spark.data.synthetic import transcripts_df
    from glean_cetaf_rdfs_spark.operators.canonicalize import annotate_canonical
    from glean_cetaf_rdfs_spark.operators.extract import extract_triples
    from glean_cetaf_rdfs_spark.plans.pipeline import build_triples

    spark = _spark()
    n = int(os.environ.get("SPARK_GRAFT_KGPROF_CONVS", "20000"))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    stages = {
        "generate": lambda: noop(transcripts_df(spark, n)),
        "gen+extract": lambda: noop(extract_triples(transcripts_df(spark, n))),
        "gen+extract+annotate": lambda: noop(
            annotate_canonical(extract_triples(transcripts_df(spark, n)))),
        "full_build_count": lambda: build_triples(transcripts_df(spark, n)).count(),
    }
    out = {}
    for name, fn in stages.items():
        spark.sparkContext.setJobDescription(f"kgprof:{name}")
        fn()  # warm
        med, walls = _timed(fn, n=3)
        out[name] = med
        print(json.dumps({"stage": name, "median": med, "walls": walls}),
              flush=True)
    print(json.dumps({"detail": "kg_profile", "n_convs": n, "stages": out}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "headline"
    if mode == "headline":
        cmd_headline(sys.argv[2:])
    elif mode == "noop":
        cmd_noop(sys.argv[2:])
    elif mode == "plans":
        cmd_plans(sys.argv[2], sys.argv[3:])
    elif mode == "kgprofile":
        cmd_kgprofile()
    else:
        raise SystemExit(f"unknown mode {mode}")
