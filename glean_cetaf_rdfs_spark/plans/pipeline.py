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

from ..operators.canonicalize import canonicalize_triples
from ..operators.cc import connected_components
from ..operators.enrich import enrich_triples
from ..operators.extract import extract_triples
from ..operators.link import event_entities, link_entities
from ..operators.materialize import finalize_triples


def build_triples(transcripts: DataFrame, dict_df: DataFrame | None = None) -> DataFrame:
    """Lazy plan for the final deduped (graph, subj, pred, obj, obj_is_iri)."""
    raw = extract_triples(transcripts)
    canonical, sameas = canonicalize_triples(raw)
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
