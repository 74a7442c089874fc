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
* G5 ``dcterms:publisher <IRI>``                  (JACQ.sh:626-627, 776-777)

All inputs to this stage are small relative to the triple stream (linked
entities, flag sets); the only joins are on ``entity`` and are
AQE-managed. No window functions needed — the sibling-triple conditions
(G2, G4) are anti-join / semi-join shaped.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..data import vocab as V
from ..functions.uri import url_domain_col


def _gen(df: DataFrame, subj_col: str, pred: str, obj_col) -> DataFrame:
    return df.select(
        F.col(subj_col).alias("subj"),
        F.lit(pred).alias("pred"),
        obj_col.alias("obj"),
        F.lit(True).alias("obj_is_iri"),
    )


def enrich_triples(triples: DataFrame, links: DataFrame,
                   event_ents: DataFrame) -> DataFrame:
    """→ generated (subj, pred, obj, obj_is_iri) rows (no conv_id —
    entity-level facts span conversations)."""
    links = links.cache()

    parts: list[DataFrame] = []

    # G1: institution id
    parts.append(_gen(links.filter(F.col("canonical_id").isNotNull()),
                      "entity", V.P_INSTITUTION_ID, F.col("canonical_id")))

    # G2: conformsTo CSPP unless Event-typed (left anti on the flag set)
    conforms = (links.filter(F.col("add_conforms_to"))
                .join(event_ents, "entity", "left_anti"))
    parts.append(_gen(conforms, "entity", V.P_CONFORMS_TO, F.lit(V.O_CSPP)))

    # G3: isPartOf umbrella + isPartOf http://<domain>
    parts.append(_gen(links.filter(F.col("umbrella").isNotNull()),
                      "entity", V.P_IS_PART_OF, F.col("umbrella")))
    parts.append(_gen(links, "entity", V.P_IS_PART_OF,
                      F.concat(F.lit("http://"), url_domain_col(F.col("entity")))))

    # G3-wikidata: mentioned wikidata entities belong to the wikidata graph
    wd_entities = (triples
                   .filter((F.col("pred") == V.P_MENTIONS)
                           & F.col("obj").startswith(V.O_WIKIDATA_ROOT))
                   .select(F.col("obj").alias("entity")).distinct())
    parts.append(_gen(wd_entities, "entity", V.P_IS_PART_OF, F.lit(V.O_WIKIDATA_ROOT)))

    # G4: turns that mention wikidata/viaf get a hasPart back-link
    for root in (V.O_WIKIDATA_ROOT, V.O_VIAF_ROOT):
        turns = (triples
                 .filter((F.col("pred") == V.P_MENTIONS) & F.col("obj").startswith(root))
                 .select(F.col("subj").alias("turn")).distinct())
        parts.append(_gen(turns, "turn", V.P_HAS_PART, F.lit(root)))

    # G5: publisher
    parts.append(_gen(links.filter(F.col("publisher").isNotNull()),
                      "entity", V.P_PUBLISHER, F.col("publisher")))

    return reduce(lambda a, b: a.unionByName(b), parts)
