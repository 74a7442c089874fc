"""End-to-end corpus-curation plan — the training-data analog of the KG
``build_triples`` plan (plans/pipeline.py): compose the curation
operators into ONE lazy DataFrame funnel

    input docs
      → PII gate           (operators/piiscan.pii_gate — quarantine split)
      → exact dedup        (md5 fingerprint, keep lowest id — the
                            q41 survivor convention)
      → span removal       (operators/spandedup.remove_repeated_spans)
      → quality gate       (integer-exact punct/token thresholds,
                            operators/textops.quality_counts)

Exact dedup MUST precede span removal: a byte-identical duplicate pair
shares every k-shingle, so with the order reversed the span remover
sees each copy's full text as "common" and erases BOTH documents to
empty strings (caught by the planted-duplicate test). Dedup-first is
also the cheap-stage-first order a production pipeline wants.

returning the curated corpus plus a funnel-accounting DataFrame, the
same rows_in/rows_out discipline as the KG pipeline's lineage (the
reference tallies every drop stage, validateRDFs.sh:187-205).

Scale shape: the gates are filtered scans (no shuffle); span removal
shuffles shingle hits once; dedup is one hash-partitioned groupBy on
the fingerprint with map-side partials. Nothing here collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.piiscan import pii_gate
from ..operators.spandedup import remove_repeated_spans
from ..operators.textops import quality_counts


# md5(NULL) is NULL; a NULL fingerprint would fall out of the equi-join
# below and silently DROP every NULL-text doc (contradicting pii_gate's
# documented NULL contract). A sentinel no real md5 hex can collide with
# gives NULL texts their own dedup group — exactly the DuckDB oracle's
# GROUP BY md5(t) semantics (NULLs group together, apart from '').
_NULL_FP = "null-text"


def curate_corpus(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", *,
                  k: int = 5, min_docs: int = 2,
                  pii_max_hits: int = 0, min_tokens: int = 5,
                  max_punct_permille: int = 100,
                  contamination_canaries: list[str] | None = None,
                  repetition_thresholds: dict[str, float] | None = None,
                  intermediate: str = "parquet",
                  temp_dir: str | None = None,
                  ) -> tuple[DataFrame, DataFrame]:
    """→ (curated, funnel).

    ``curated``: (id, source, text_clean) — survivors of all four
    stages, span-rewritten text. ``funnel``: (stage, n) with the row
    count after each stage (plus total span-removed tokens), ordered by
    the stage prefix — the report a pipeline owner reads to see where
    documents go. The quality gate is integer-exact (punct*1000 ≤
    chars*max_punct_permille), matching the q44 convention.

    The stages are sequential by design: span commonality (min_docs)
    is computed on the POST-gate, POST-dedup corpus, so a quarantined
    document cannot vote a span into the removable set and a duplicate
    pair cannot vote its full text in (see module docstring).

    ``intermediate="parquet"`` (default): the two expensive stage
    frames — the PII-gated+fingerprinted corpus and the span-rewritten
    corpus — are written once to scratch storage (same pattern and
    rotation as plans/pipeline.build_triples) and every funnel branch
    plus ``curated`` scans the files. The PII regex scan, the dedup
    shuffle, and the span rewrite each execute EXACTLY once no matter
    how many consumers run — the round-4 lazy funnel re-executed the
    span stage per aggregate (a 4-5× corpus recompute at scale).
    ``intermediate="none"``: fully lazy, recomputed per consumer (toy
    inputs / plan-inspection only).

    Opt-in gates (both ``None``-off by default, preserving the q51
    oracle funnel): ``contamination_canaries`` inserts the literal
    benchmark-contamination gate (operators/piiscan.contamination_gate)
    right after the PII gate — another pure-predicate filtered scan, so
    the two compose into the same scan region; adds funnel stage
    ``01b_decontaminated``. ``repetition_thresholds`` appends the
    Gopher repetition gate (operators/repetition.repetition_gate; pass
    ``repetition.GOPHER_THRESHOLDS`` for the published defaults — here
    ``None`` means the stage is OFF, not default-thresholds) AFTER the quality
    gate, on the span-rewritten text (repetition is a property of the
    text that would actually ship); adds funnel stage
    ``05_repetition_pass``."""
    spark = docs.sparkSession
    src_cols = [F.col(id_col).alias("id"), F.col("source"),
                F.col(text_col)]
    base = docs.select(*src_cols)

    pii_clean, _quarantined = pii_gate(base, text_col,
                                       max_hits=pii_max_hits)
    clean0 = pii_clean
    obs01 = None
    if contamination_canaries is not None:
        from ..operators.piiscan import contamination_gate

        if intermediate == "parquet":
            # the funnel's 01 count must be PRE-contamination, but the
            # materialized fp files are post-both-gates; an Observation
            # between the two filters counts the pii-clean rows on the
            # fp write itself — no second regex pass over the corpus
            # (the module's each-stage-executes-once invariant)
            import uuid

            from pyspark.sql.observation import Observation

            obs01 = Observation(f"pii01_{uuid.uuid4().hex}")
            pii_clean = pii_clean.observe(
                obs01, F.count(F.lit(1)).alias("n"))
        clean0, _contam = contamination_gate(pii_clean, "id", text_col,
                                             canaries=contamination_canaries)
    fp = clean0.withColumn(
        "_fp", F.coalesce(F.md5(text_col), F.lit(_NULL_FP)))

    stage_base = None
    if intermediate == "parquet":
        from .pipeline import _stage_scratch

        stage_base = _stage_scratch(spark, temp_dir, name="curation")
        fp.write.mode("overwrite").parquet(f"{stage_base}/fp")
        fp = spark.read.parquet(f"{stage_base}/fp")

    unique = (fp.groupBy("_fp").agg(F.min("id").alias("id"))
              .join(fp, ["_fp", "id"])
              .select("id", "source", text_col))

    rewritten = remove_repeated_spans(unique, "id", text_col,
                                      k=k, min_docs=min_docs)
    staged = (unique.select("id", "source")
              .join(rewritten, "id"))
    if stage_base is not None:
        staged.write.mode("overwrite").parquet(f"{stage_base}/staged")
        staged = spark.read.parquet(f"{stage_base}/staged")

    qc = quality_counts(staged, "id", "text_clean")
    gated = (staged.join(qc, "id")
             .filter((F.col("n_punct") * 1000
                      <= F.greatest(F.col("n_chars"), F.lit(1))
                      * max_punct_permille)
                     & (F.col("n_tokens") >= min_tokens))
             .select("id", "source", "text_clean"))
    final = gated
    if repetition_thresholds is not None:
        from ..operators.repetition import repetition_gate

        final, _rep_bad = repetition_gate(gated, "id", "text_clean",
                                          thresholds=repetition_thresholds)

    # Funnel branches read the materialized stages (parquet mode):
    # 00 is a raw-input count (no regex), 01/02 are footer-cheap counts
    # of the stage files (the span rewrite preserves rows, so the
    # staged count IS the post-dedup count), 03/04 are single filtered
    # scans of the staged files.
    # with the contamination gate ON, the materialized fp files are
    # post-BOTH-gates; 01 comes from the Observation captured on the
    # fp write (parquet mode — zero extra passes) or, fully-lazy, from
    # a live re-run of the pii predicate (plan-inspection mode only)
    if contamination_canaries is None:
        row01 = (fp.agg(F.count(F.lit(1)).alias("n"))
                 .select(F.lit("01_pii_clean").alias("stage"), "n"))
    elif obs01 is not None:
        row01 = spark.createDataFrame(
            [("01_pii_clean", int(obs01.get["n"]))], "stage string, n long")
    else:
        row01 = (pii_clean.agg(F.count(F.lit(1)).alias("n"))
                 .select(F.lit("01_pii_clean").alias("stage"), "n"))
    funnel = (
        base.agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("00_input").alias("stage"), "n")
        .unionByName(row01)
        .unionByName(
            staged.agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("02_unique").alias("stage"), "n"))
        .unionByName(
            staged.agg(F.coalesce(F.sum("n_tokens_removed"), F.lit(0))
                       .alias("n"))
            .select(F.lit("03_span_tokens_removed").alias("stage"), "n"))
        .unionByName(
            gated.agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("04_quality_pass").alias("stage"), "n"))
    )
    if contamination_canaries is not None:
        funnel = funnel.unionByName(
            fp.agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("01b_decontaminated").alias("stage"), "n"))
    if repetition_thresholds is not None:
        funnel = funnel.unionByName(
            final.agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("05_repetition_pass").alias("stage"), "n"))
    return final, funnel


def run_curation(spark, docs: DataFrame, out_path: str, *,
                 lineage_path: str | None = None, run_id: str = "curate",
                 **curate_kwargs) -> DataFrame:
    """Materialize the curated corpus and account for it — the curation
    analog of ``run_pipeline`` (plans/pipeline.py): write the survivors
    partitioned by source, and when ``lineage_path`` is given append one
    lineage row per funnel stage in the engine's standard
    (rows_in, rows_out, rows_dropped) schema with the
    rows_in == rows_out + rows_dropped invariant per row (the span
    stage rewrites text without dropping rows, so it reports
    dropped=0; its token accounting lives in the funnel/q51). Returns
    the written table."""
    curated, funnel = curate_corpus(docs, **curate_kwargs)
    curated.write.mode("overwrite").partitionBy("source").parquet(out_path)
    if lineage_path is not None:
        from ..streaming.checkpoint import _append_ckpt

        f = {r["stage"]: r["n"] for r in funnel.collect()}
        # consecutive count-stage pairs become lineage rows; the two
        # opt-in gates (01b / 05) slot in when present
        stage_names = {"01_pii_clean": "pii_gate",
                       "01b_decontaminated": "contamination_gate",
                       "02_unique": "exact_dedup",
                       "04_quality_pass": "quality_gate",
                       "05_repetition_pass": "repetition_gate"}
        chain = [(s, f[s]) for s in
                 ("00_input", "01_pii_clean", "01b_decontaminated",
                  "02_unique", "04_quality_pass", "05_repetition_pass")
                 if s in f]
        for (_, n0), (s1, n1) in zip(chain, chain[1:]):
            _append_ckpt(spark, lineage_path, run_id, stage_names[s1],
                         "all", n0, n1, n0 - n1, "done")
            if s1 == "02_unique":
                # span rewrite preserves rows; its token accounting
                # lives in the funnel/q51
                _append_ckpt(spark, lineage_path, run_id, "span_rewrite",
                             "all", n1, n1, 0, "done")
    return spark.read.parquet(out_path)


def incremental_curation_writer(spark, id_col: str, text_col: str,
                                out_path: str, band_store_dir: str, *,
                                pii_max_hits: int = 0,
                                contamination_canaries: list[str] | None = None,
                                repetition_thresholds: dict[str, float] | None = None,
                                n: int = 3, k: int = 8, bands: int = 4):
    """Streaming curation: a ``foreachBatch`` body composing the
    row-local gates with the cross-batch near-dup store — the
    incremental form of :func:`curate_corpus` for corpora that GROW
    (new crawl drops landing as files)::

        (stream.writeStream
            .foreachBatch(incremental_curation_writer(spark, "doc_id",
                          "text", out, band_store))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start())

    Per micro-batch: PII gate → optional contamination gate → optional
    repetition gate (all row-local, so batch-at-a-time application is
    EXACTLY the batch semantics), then the cross-batch near-duplicate
    gate (streaming/neardedup.incremental_near_dedup — band store,
    epoch-idempotent). Exact duplicates need no separate stage here:
    byte-identical texts share every MinHash band, so the near-dup
    gate subsumes exact dedup (min-id within a batch, first-admitted
    across batches). Survivors append to ``out_path`` partitioned by
    ``_epoch`` with the same dynamic-overwrite replay idempotence as
    the band store.

    Deliberately absent: SPAN removal — repeated-span commonality is a
    corpus-GLOBAL statistic (a boilerplate footer is invisible until
    enough carriers arrive), so rewriting per batch would under-remove
    early and non-deterministically. The production shape is this
    incremental gate chain plus a periodic batch
    :func:`curate_corpus`-style span sweep over the accumulated
    corpus — same division as the reference's per-harvest fixes vs
    corpus-wide normalize passes."""
    from ..operators.piiscan import contamination_gate, pii_gate
    from ..operators.repetition import repetition_gate
    from ..streaming.neardedup import incremental_near_dedup

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        clean, _bad = pii_gate(batch_df, text_col, max_hits=pii_max_hits)
        if contamination_canaries is not None:
            clean, _c = contamination_gate(clean, id_col, text_col,
                                           canaries=contamination_canaries)
        if repetition_thresholds is not None:
            clean, _r = repetition_gate(clean, id_col, text_col,
                                        thresholds=repetition_thresholds)
        kept = incremental_near_dedup(spark, clean, id_col, text_col,
                                      band_store_dir, epoch_id,
                                      n=n, k=k, bands=bands)
        (kept.withColumn("_epoch", F.lit(int(epoch_id)).cast("long"))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_epoch").parquet(out_path))

    return write
