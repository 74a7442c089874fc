"""Enrichment stage — the reference's per-subject triple grafting (G1-G5,
SURVEY.md §2.4), re-expressed as row generation + union instead of sed
pattern-space accumulation (JACQ.sh:434-812).

Net semantics (SURVEY.md §2.4): output = canonicalized triples − drops
∪ generated triples, deduped. The generated side:

* G1 ``dwc:institutionID <ROR/VIAF>``            (JACQ.sh:440-441)
* G2 ``dcterms:conformsTo <CSPP>`` unless the entity is Event-typed
                                                  (JACQ.sh:443; Finland.sh:443,462,515)
* G3 ``dcterms:isPartOf <umbrella>`` + ``<http://domain>``
                                                  (JACQ.sh:444-445; wikidata JACQ.sh:823-829)
* G4 ``dcterms:hasPart <wikidata|viaf root>`` on turns whose mentions point
  into wikidata/viaf                              (JACQ.sh:446-447)
* G5 ``dcterms:publisher <IRIs>``                 (JACQ.sh:626-627, 776-777)

Shape: ONE conditional-array generate + explode per input frame — a
single narrow pass over the (small) link table plus a single narrow pass
over the mention stream, one left join for the Event flag. Earlier
versions used 8 separate select/join branches; at 36k-turn scale that
cost 20s in stage overhead vs ~2s for this form, and at cluster scale it
multiplies scans of the triple stream. Duplicate generated rows are NOT
deduped here — materialize's dropDuplicates is the single dedupe point
(mirrors the reference's one duplicate-removal step, JACQ.sh:441).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..data import vocab as V
from ..functions.uri import url_domain_col

_TRIPLE_STRUCT = ["subj", "pred", "obj"]


def _triple(subj: Column, pred: str, obj: Column) -> Column:
    return F.struct(subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj"))


def _explode_triples(df: DataFrame, arr: Column) -> DataFrame:
    return (df.select(F.explode(F.filter(arr, lambda t: t.isNotNull())).alias("t"))
            .select(F.col("t.subj").alias("subj"), F.col("t.pred").alias("pred"),
                    F.col("t.obj").alias("obj"), F.lit(True).alias("obj_is_iri")))


def enrich_triples(triples: DataFrame, links: DataFrame,
                   event_ents: DataFrame) -> DataFrame:
    """→ generated (subj, pred, obj, obj_is_iri) rows (duplicates allowed;
    deduped once at materialization)."""
    ent = F.col("entity")
    flagged = links.join(
        event_ents.select("entity", F.lit(True).alias("is_event")),
        "entity", "left")
    ent_arr = F.array(
        F.when(F.col("canonical_id").isNotNull(),
               _triple(ent, V.P_INSTITUTION_ID, F.col("canonical_id"))),
        F.when(F.col("add_conforms_to") & F.col("is_event").isNull(),
               _triple(ent, V.P_CONFORMS_TO, F.lit(V.O_CSPP))),
        F.when(F.col("umbrella").isNotNull(),
               _triple(ent, V.P_IS_PART_OF, F.col("umbrella"))),
        _triple(ent, V.P_IS_PART_OF,
                F.concat(F.lit("http://"), url_domain_col(ent))),
        F.when(F.col("publisher").isNotNull(),
               _triple(ent, V.P_PUBLISHER, F.col("publisher"))),
    )
    from_links = _explode_triples(flagged, ent_arr)

    # wikidata entities get isPartOf <wikidata root> wherever they appear
    # (JACQ.sh:823-829); hasPart back-links are grafted ONLY on subjects
    # with dwciri:recordedBy into wikidata/viaf (JACQ.sh:446-447) — a
    # plain mention does not trigger them.
    ments = (triples.filter(F.col("pred").isin(V.P_MENTIONS, V.P_RECORDED_BY))
             .select(F.col("subj").alias("turn"), F.col("obj").alias("ent"),
                     F.col("pred").alias("via")))
    is_wd = F.col("ent").startswith(V.O_WIKIDATA_ROOT)
    is_viaf = F.col("ent").startswith(V.O_VIAF_ROOT)
    is_rb = F.col("via") == V.P_RECORDED_BY
    mention_arr = F.array(
        F.when(is_wd, _triple(F.col("ent"), V.P_IS_PART_OF, F.lit(V.O_WIKIDATA_ROOT))),
        F.when(is_wd & is_rb, _triple(F.col("turn"), V.P_HAS_PART, F.lit(V.O_WIKIDATA_ROOT))),
        F.when(is_viaf & is_rb, _triple(F.col("turn"), V.P_HAS_PART, F.lit(V.O_VIAF_ROOT))),
    )
    from_mentions = _explode_triples(ments, mention_arr)

    return from_links.unionByName(from_mentions)
