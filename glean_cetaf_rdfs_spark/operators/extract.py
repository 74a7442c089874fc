"""Extraction stage: transcripts → raw (subj, pred, obj, obj_is_iri) rows.

Arrow-vectorized ``mapInPandas`` (UDTF-shaped: one turn row → N triple
rows), the engine's replacement for the reference's per-file JVM
``rdfparse`` subprocess (convertRDF4import_normal-files_JACQ.sh:355).
Narrow transformation — no shuffle: each input partition yields its
triples in place, so throughput scales linearly with cores (the
scaling-efficiency criterion rides on this stage staying embarrassingly
parallel).

``conv_id`` is carried through for lineage/resume bucketing and dropped at
materialization.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.extraction_rules import extract_turn_triples

TRIPLE_COLS = ["conv_id", "subj", "pred", "obj", "obj_is_iri"]
TRIPLE_SCHEMA = "conv_id string, subj string, pred string, obj string, obj_is_iri boolean"


def _extract_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: list[tuple] = []
        # itertuples over the Arrow batch: the regex work is the payload;
        # the loop is per-turn, not per-triple, and stays inside one task
        for r in pdf.itertuples(index=False):
            for t in extract_turn_triples(r.conv_id, int(r.turn_idx), r.role,
                                          r.text, r.tool, r.ts):
                rows.append((r.conv_id, *t))
        yield pd.DataFrame(rows, columns=TRIPLE_COLS)


def extract_triples(transcripts: DataFrame) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → raw triples."""
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    return transcripts.select(*cols).mapInPandas(_extract_batches, schema=TRIPLE_SCHEMA)
