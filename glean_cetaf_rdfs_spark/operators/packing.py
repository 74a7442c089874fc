"""Greedy sequence packing — assembling training examples from
documents under a fixed context-window token budget.

Packing is inherently sequential WITHIN a pack stream (each decision
depends on the running total), so it cannot be a window expression;
but it is embarrassingly parallel ACROSS streams. The operator
therefore runs one greedy pass per group via ``applyInPandas`` (Arrow
batches, one pandas loop per group) — the designated Python-stage
pattern of this engine (SURVEY.md §2 UDF rows).

Scale shape: groups = (stratum, shard). Packing only needs LOCAL
greediness — two documents in different shards never needed to share a
pack — so a huge stratum is split across ``n_shards`` deterministic
hash shards (operators/sampling.hash_bucket) and each shard packs
independently: no straggler group, no global sort. Determinism: docs
pack in id order within their shard; pack ids are
``{stratum}/{shard}/{seq}``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket


def pack_greedy_py(counts: list[int], budget: int) -> list[int]:
    """Pure greedy first-fit-in-order over counts (callers supply them
    already in pack order): pack index per count. A doc that would
    overflow the running pack starts a new one; a doc alone larger than
    the budget gets its own (overfull) pack — callers decide whether to
    truncate downstream. Reference implementation for both the Spark
    stage and the frozen oracle."""
    packs, total, cur = [], 0, 0
    for c in counts:
        if total > 0 and total + c > budget:
            cur += 1
            total = 0
        total += c
        packs.append(cur)
    return packs


def pack_sequences(df: DataFrame, id_col: str, tokens_col: str,
                   strata_col: str, budget: int = 2048,
                   n_shards: int = 1,
                   carry_tokens: bool = False) -> DataFrame:
    """→ (id, stratum, pack_id, pack_pos): greedy packing of each
    stratum's docs (id order) into packs of ≤ ``budget`` tokens.
    ``n_shards`` > 1 splits big strata into deterministic hash shards
    that pack independently (see module docstring).

    ``carry_tokens=True`` appends the input token count as ``n_tokens``
    so downstream fill accounting can aggregate the packing OUTPUT
    directly instead of re-joining the token table — without it the q53
    shape re-executed the (Python) token-count stage per consumer: the
    count plan fed both the packing input and the fill join, and Spark
    materializes common subplans per action, not per plan (the round-6
    before-plan shows MapInPandas ×3 / FlatMapGroupsInPandas ×2 for one
    query)."""
    base = df.select(F.col(id_col).alias("id"),
                     F.col(strata_col).alias("stratum"),
                     F.col(tokens_col).alias("_n"))
    if n_shards > 1:
        base = base.withColumn("_shard",
                               hash_bucket(F.col("id"), "pack",
                                           n_shards))
    else:
        base = base.withColumn("_shard", F.lit(0))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        if pdf["_n"].isna().any():
            # a NULL count becomes NaN here, every `total + c > budget`
            # comparison goes False, and the whole shard would silently
            # pack into one unbounded pack — fail loudly instead
            bad = pdf.loc[pdf["_n"].isna(), "id"].head(3).tolist()
            raise ValueError(
                f"pack_sequences: NULL token count for ids {bad} in "
                f"stratum {pdf['stratum'].iat[0]!r}; fill or drop NULL "
                f"counts before packing")
        packs = pack_greedy_py(pdf["_n"].tolist(), budget)
        stratum, shard = pdf["stratum"].iat[0], int(pdf["_shard"].iat[0])
        pos = []
        seen: dict[int, int] = {}
        for p in packs:
            pos.append(seen.get(p, 0))
            seen[p] = pos[-1] + 1
        out = {
            "id": pdf["id"],
            "stratum": pdf["stratum"],
            "pack_id": [f"{stratum}/{shard}/{p}" for p in packs],
            "pack_pos": pos,
        }
        if carry_tokens:
            out["n_tokens"] = pdf["_n"]
        return pd.DataFrame(out)

    schema = "id long, stratum string, pack_id string, pack_pos int"
    if carry_tokens:
        schema += ", n_tokens long"
    return (base.groupBy("stratum", "_shard")
            .applyInPandas(run, schema=schema))
