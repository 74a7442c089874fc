"""Source operators (SURVEY.md §2.1 S1-S7).

The reference's sources are text pipelines: URI lists (S1), gzip'd RDF/XML
shards (S3), MIME-gated inputs (S4), JDBC URI queries (S7). Spark gives
the mechanics (decompression, pushdown, schema) for free; what carries
over is the *semantics*: filter-then-project before fan-out, malformed
input counted not fatal, schema validation on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

TRANSCRIPT_SCHEMA = Ty.StructType([
    Ty.StructField("conv_id", Ty.StringType(), False),
    Ty.StructField("turn_idx", Ty.IntegerType(), False),
    Ty.StructField("role", Ty.StringType(), True),
    Ty.StructField("text", Ty.StringType(), True),
    Ty.StructField("tool", Ty.StringType(), True),
    Ty.StructField("ts", Ty.TimestampType(), True),
])


def read_uri_list(spark: SparkSession, path: str) -> DataFrame:
    """S1 — URI-list scan (get_RDF4domain_from_urilist_with_ETA.sh:475):
    read text (gz transparent), strip CR, keep http(s) lines, project the
    first URL token; trailing comment columns dropped. → (uri)."""
    return (spark.read.text(path)
            .select(F.regexp_replace("value", "\r", "").alias("line"))
            .filter(F.col("line").rlike(r"^\s*https?://"))
            .select(F.regexp_extract("line", r"^\s*(https?://\S+)", 1).alias("uri"))
            .filter(F.col("uri") != ""))


def read_uri_list_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S1 variant — TSV URI list with metadata columns
    (doc/Finland/urilist…tsv): uri + institution + free comment."""
    df = spark.read.csv(path, sep="\t", header=False)
    cols = df.columns
    out = df.select(
        F.regexp_replace(F.col(cols[0]), "\r", "").alias("uri"),
        *[F.col(c).alias(f"meta_{i}") for i, c in enumerate(cols[1:])],
    )
    return out.filter(F.col("uri").rlike(r"^https?://"))


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Primary input: the transcript table (Iceberg at scale; parquet
    fallback here — the Iceberg runtime jar isn't in this image).
    Explicit schema — schema-on-read validation, never inference."""
    fmt = "parquet"
    try:  # Iceberg if the catalog is on the classpath
        if spark.conf.get("spark.sql.catalog.spark_catalog", None):
            fmt = "iceberg"
    except Exception:  # noqa: BLE001
        pass
    reader = spark.read.format(fmt)
    if fmt == "parquet":
        reader = reader.schema(TRANSCRIPT_SCHEMA)
    return reader.load(path)


def gate_well_formed(transcripts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """S4 — input gate (fixRDF…:287,319-334 MIME check): split rows that
    violate the input contract (null key, negative turn_idx, null text)
    into a quarantine frame counted to lineage instead of failing the job
    (the reference warns + skips non-text/xml shards)."""
    ok = (F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
          & (F.col("turn_idx") >= 0) & F.col("text").isNotNull())
    return transcripts.filter(ok), transcripts.filter(~ok)


def read_jdbc_uri_list(spark: SparkSession, url: str, table: str,
                       predicate: str | None = None, **options) -> DataFrame:
    """S7 — JDBC URI-list source (doc/JACQ/JACQ-import-to-GRAPH…md:13-27,
    MS-SQL SELECT occurrenceID FROM cetaf_ids WHERE inst LIKE …).
    Thin wrapper: driver jars aren't in this image, so this is exercised
    only when a JDBC URL is actually reachable; the call shape (pushdown
    predicate included) is the contract."""
    reader = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", table))
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load()
    return df.filter(predicate) if predicate else df
