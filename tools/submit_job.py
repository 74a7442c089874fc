"""spark-submit entry point — the north rule's ship mode:

    spark-submit --py-files glean_cetaf_rdfs_spark.zip tools/submit_job.py \
        <n_convs> <out_path>

Runs the full KG pipeline on deterministically generated transcripts and
writes the partitioned graph table. The package must come from --py-files
(this script asserts it imports), proving the job is self-contained for a
multi-executor cluster.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kg_submit_out"

    spark = (SparkSession.builder.appName("kg-submit")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())

    from glean_cetaf_rdfs_spark.data.synthetic import transcripts_df
    from glean_cetaf_rdfs_spark.operators.materialize import write_graph_table
    from glean_cetaf_rdfs_spark.plans.pipeline import build_triples

    final = build_triples(transcripts_df(spark, n_convs))
    write_graph_table(final, out)
    n = spark.read.parquet(out).count()
    print(f"SUBMIT_OK triples={n} out={out}")
    spark.stop()


if __name__ == "__main__":
    main()
