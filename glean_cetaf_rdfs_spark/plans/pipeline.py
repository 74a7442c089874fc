"""End-to-end KG-construction plan: transcripts → graph table.

One DataFrame DAG replacing the reference's 5 shell stages and their 8
filesystem round-trips (master_RDF_fix-validate-normalize.sh:178-201):

    scan transcripts
      → extract (mapInPandas, narrow)
      → canonicalize (codegen'd regexp chain, narrow)
      → link entities (broadcast dict join; 2 small shuffles)
      → enrich (generated rows, unions)
      → finalize (dedupe shuffle) → write partitionBy(graph)

plus the owl:sameAs alias edges feeding connected-components for the
entity→canonical map (written alongside the graph table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.canonicalize import (
    annotate_canonical,
    canonicalize_triples,
    split_canonical,
)
from ..operators.cc import connected_components
from ..operators.enrich import enrich_triples
from ..operators.extract import extract_triples
from ..operators.link import event_entities, link_entities
from ..operators.materialize import finalize_triples


def build_triples(transcripts: DataFrame, dict_df: DataFrame | None = None,
                  intermediate: str = "parquet",
                  temp_dir: str | None = None) -> DataFrame:
    """Plan for the final deduped (graph, subj, pred, obj, obj_is_iri).

    The extraction output fans out to ~8 consumers (canonical stream,
    sameAs edges, linking, event flags, wikidata/viaf flags). How the
    fan-out point is materialized matters:

    * ``intermediate="parquet"`` (default): write the canonicalize-
      annotated triple stage (raw + obj_canon) to scratch storage and
      read it back — the pandas extraction AND the 12-rule regexp chain
      each run exactly once, and every branch scans columnar files in
      parallel. This is also the cluster-scale pattern (stage tables
      between pipeline phases). Measured alternatives: BlockManager
      ``persist`` serializes under 32-thread contention (2.5x wall), and
      no materialization re-runs extraction + regexps per branch (the
      regexp chain re-execution was the top CPU sink: 2.2k CPU-seconds
      at 310k-turn scale).
    * ``intermediate="persist"``: Dataset cache (MEMORY_AND_DISK).
    * ``intermediate="none"``: fully lazy — recomputed per branch.
    """
    annotated = annotate_canonical(extract_triples(transcripts))
    if intermediate == "persist":
        from pyspark.storagelevel import StorageLevel

        annotated = annotated.persist(StorageLevel.MEMORY_AND_DISK)
    elif intermediate == "parquet":
        import uuid

        from ..session import _scratch_dir

        path = f"{temp_dir or _scratch_dir()}/kg_canon_{uuid.uuid4().hex}"
        annotated.write.mode("overwrite").parquet(path)
        annotated = transcripts.sparkSession.read.parquet(path)
    canonical, sameas = split_canonical(annotated)
    spo = canonical.select("subj", "pred", "obj", "obj_is_iri")
    links = link_entities(spo, dict_df)
    events = event_entities(spo)
    generated = enrich_triples(spo, links, events)
    all_triples = (spo
                   .unionByName(sameas.select("subj", "pred", "obj", "obj_is_iri"))
                   .unionByName(generated))
    return finalize_triples(all_triples)


def build_canonical_map(transcripts: DataFrame) -> DataFrame:
    """Alias-resolution map via connected components over the owl:sameAs
    edge set: (member, canonical)."""
    raw = extract_triples(transcripts)
    _, sameas = canonicalize_triples(raw)
    edges = sameas.select("subj", "obj").toDF("src", "dst")
    return connected_components(edges)


def run_pipeline(spark: SparkSession, transcripts: DataFrame, out_path: str,
                 dict_df: DataFrame | None = None) -> DataFrame:
    final = build_triples(transcripts, dict_df)
    from ..operators.materialize import write_graph_table
    write_graph_table(final, out_path)
    return spark.read.parquet(out_path)
