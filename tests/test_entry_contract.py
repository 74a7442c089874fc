"""Driver-contract consistency checks (no Spark execution needed)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as E  # noqa: E402


def test_registry_shapes():
    qs = E.queries()
    sqls = E.oracle_sql()
    assert len(qs) >= 30
    assert set(sqls) <= set(qs)
    # most queries must carry a DuckDB oracle; rows-only is the exception
    assert len(sqls) >= 0.75 * len(qs)
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in sqls.items():
        assert "SELECT" in sql.upper(), name


def test_rows_only_queries_are_the_documented_ones():
    qs, sqls = E.queries(), E.oracle_sql()
    rows_only = set(qs) - set(sqls)
    assert rows_only == set()  # every query carries a DuckDB oracle


def test_contract_fits_driver_cap_and_order():
    """The driver grades only the FIRST 50 queries() entries
    (CORRECTNESS_r04: 54 registered → exactly 50 graded, flagship q32
    silently dropped). The contract must stay ≤50 with the flagship
    first and the previously-ungraded queries ahead of the tail; the
    folded-out implementations stay benchmarked via bench_queries()."""
    from glean_cetaf_rdfs_spark.queries_data import CONTRACT_FOLDED_OUT

    qs = E.queries()
    names = list(qs)
    assert len(names) <= 50
    assert names[0] == "q32_kg_pipeline_predicates"
    head = set(names[:5])
    assert {"q53_token_packing", "q30_multimodal_metadata",
            "q31_frame_sample_plan", "q51_curation_funnel"} <= head
    assert CONTRACT_FOLDED_OUT.isdisjoint(names)
    bench = E.bench_queries()
    assert CONTRACT_FOLDED_OUT <= set(bench)
    # the folds really exercise both paths: folded keys stay present
    for folded_key in ("q24_lsh_bucket_topk", "q39_ivf_topk",
                       "q25_token_count"):
        assert folded_key in names and folded_key in bench


def test_q29_frozen_oracle_matches_python_winnow():
    """The frozen VALUES oracle shipped for q29 must equal fingerprint
    counts freshly derived from the pure-Python winnow over the driver's
    correctness-sf documents table — fixture or scheme drift fails here
    before it can hash-fail at the driver."""
    import duckdb
    import pytest

    from glean_cetaf_rdfs_spark.operators.textops import winnow_py
    from glean_cetaf_rdfs_spark.queries_data import _Q29_NFPS_SF001

    path = "/root/testdata/sf0.01/documents.parquet"
    if not Path(path).exists():
        pytest.skip("driver testdata not present")
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{path}' ORDER BY doc_id").fetchall()
    got = [len(winnow_py(t or "")) for _, t in rows]
    assert got == _Q29_NFPS_SF001


def test_q49_frozen_oracle_matches_python_bpe():
    """The frozen VALUES oracle shipped for q49 must equal per-source
    subword totals freshly derived from the pure-Python greedy-BPE
    encoder over the driver's correctness-sf documents table — vocab or
    fixture drift fails here before it can hash-fail at the driver."""
    import duckdb
    import pytest

    from glean_cetaf_rdfs_spark.operators.textops import bpe_count_py
    from glean_cetaf_rdfs_spark.queries_data import _Q49_ORACLE_ROWS

    path = "/root/testdata/sf0.01/documents.parquet"
    if not Path(path).exists():
        pytest.skip("driver testdata not present")
    rows = duckdb.sql(
        f"SELECT source, text FROM '{path}' ORDER BY source").fetchall()
    agg: dict[str, list[int]] = {}
    for src, text in rows:
        n_docs, n_toks = agg.setdefault(src, [0, 0])
        agg[src] = [n_docs + 1, n_toks + bpe_count_py(text or "")]
    got = sorted((s, d, t) for s, (d, t) in agg.items())
    assert got == sorted(_Q49_ORACLE_ROWS)


def test_q53_frozen_oracle_matches_python_packing():
    """The frozen VALUES oracle shipped for q53 must equal per-source
    greedy-pack stats freshly derived from the pure-Python packer over
    pure-Python BPE counts at the driver's correctness sf, replaying
    q53's 8-way deterministic md5 shard split (the no-straggler scale
    shape — packing.py module docstring)."""
    import hashlib

    import duckdb
    import pytest

    from glean_cetaf_rdfs_spark.operators.packing import pack_greedy_py
    from glean_cetaf_rdfs_spark.operators.textops import bpe_count_py
    from glean_cetaf_rdfs_spark.queries_data import _Q53_ORACLE_ROWS

    path = "/root/testdata/sf0.01/documents.parquet"
    if not Path(path).exists():
        pytest.skip("driver testdata not present")

    def shard(did: int, salt: str = "pack", n: int = 8) -> int:
        # pure-Python replay of operators/sampling.hash_bucket
        return int(hashlib.md5((salt + str(did)).encode())
                   .hexdigest()[:8], 16) % n

    rows = duckdb.sql(
        f"SELECT source, doc_id, text FROM '{path}' "
        "ORDER BY source, doc_id").fetchall()
    by_shard: dict[tuple[str, int], list[tuple[int, int]]] = {}
    for src, did, text in rows:
        by_shard.setdefault((src, shard(did)), []).append(
            (did, bpe_count_py(text or "")))
    agg: dict[str, tuple[int, int, int]] = {}
    for (src, _sh), docs in by_shard.items():
        counts = [c for _, c in sorted(docs)]
        packs = pack_greedy_py(counts, 512)
        fill: dict[int, int] = {}
        for p, c in zip(packs, counts):
            fill[p] = fill.get(p, 0) + c
        d, pk, mx = agg.get(src, (0, 0, 0))
        agg[src] = (d + len(counts), pk + max(packs) + 1,
                    max(mx, max(fill.values())))
    got = sorted((s, d, p, m) for s, (d, p, m) in agg.items())
    assert got == sorted(_Q53_ORACLE_ROWS)


def test_pack_greedy_semantics():
    """Greedy first-fit-in-order: overflow starts a new pack; an
    oversized doc gets its own pack; empty input packs to nothing."""
    from glean_cetaf_rdfs_spark.operators.packing import pack_greedy_py

    assert pack_greedy_py([300, 300, 100], 512) == [0, 1, 1]
    assert pack_greedy_py([700, 10], 512) == [0, 1]   # oversize alone
    assert pack_greedy_py([512, 512, 1], 512) == [0, 1, 2]
    assert pack_greedy_py([], 512) == []


def test_bpe_greedy_longest_match_semantics():
    """Greedy longest-match: 'the table' → ['the', ' ', 'table'] (not
    th+e / ta+ble splits); unknown characters fall back to single-char
    tokens so any text tokenizes; empty text → 0."""
    from glean_cetaf_rdfs_spark.operators.textops import bpe_count_py

    assert bpe_count_py("the table") == 3
    assert bpe_count_py("zzz") == 3          # fallback singles
    assert bpe_count_py("") == 0
    assert bpe_count_py("tables") == 2       # 'table' + 's'
    assert bpe_count_py("streaming") == 2    # 'stream' + 'ing'


def test_q32_frozen_oracle_matches_python_oracle():
    """The frozen VALUES oracle shipped for q32 must equal the predicate
    counts freshly derived from the independent pure-Python rule oracle
    at the driver's correctness scale (400 convs = sf0.01) — any rule or
    fixture drift fails here before it can hash-fail at the driver."""
    from collections import Counter

    from glean_cetaf_rdfs_spark.data.synthetic import transcripts_pdf
    from glean_cetaf_rdfs_spark.oracle import oracle_triples

    c = Counter(p for _, _, p, _, _ in oracle_triples(transcripts_pdf(400)))
    assert sorted(c.items()) == E._Q32_ORACLE_ROWS


def test_probe_bucket_sql_derivation_matches_python():
    """The q40 oracle derives the multi-probe bucket set IN SQL (margin-
    ordered single-bit flips); it must match probe_buckets() for random
    query vectors — a probe-set mismatch would hash-fail q40 only on
    data where the extra bucket matters, so check the derivation
    directly across many vectors."""
    import duckdb
    import numpy as np

    from glean_cetaf_rdfs_spark.operators.similarity import (
        plane_weights,
        probe_buckets,
    )

    planes = plane_weights(64, 4)
    rows = ", ".join(f"({j}, {list(w)})" for j, w in enumerate(planes))
    rng = np.random.RandomState(3)
    for _ in range(25):
        q = [float(x) for x in rng.randn(64)]
        want = probe_buckets(q, planes, n_probe=3)
        got = [r[0] for r in duckdb.sql(f"""
WITH q AS (SELECT {list(q)}::DOUBLE[] AS qv),
proj AS (SELECT j, list_dot_product(qv, w::DOUBLE[]) AS s
         FROM q, (VALUES {rows}) planes(j, w)),
base AS (SELECT string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, ''
                           ORDER BY j) AS b FROM proj),
probes AS (
  SELECT b AS bucket, -1.0 AS m, -1 AS j FROM base
  UNION ALL
  SELECT substr(b, 1, CAST(j AS INT))
         || (CASE WHEN substr(b, CAST(j AS INT) + 1, 1) = '1'
                  THEN '0' ELSE '1' END)
         || substr(b, CAST(j AS INT) + 2),
         abs(s), CAST(j AS INT)
  FROM base, proj)
SELECT bucket FROM probes ORDER BY m, j LIMIT 3
""").fetchall()]
        assert got == want, (got, want)


def test_scaling_merge_pools_walls_and_keeps_min():
    """bench_scaling._merge must pool wall samples across measurement
    passes and recompute rates from the min (the noisy-host estimator
    the scaling artifact documents)."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parents[1] / "tools"))
    from bench_scaling import _merge

    a = {"cores": 2, "n_turns": 100, "n_triples": 1000,
         "wall_sec": 10.0, "walls": [12.0, 10.0],
         "triples_per_sec": 100.0, "turns_per_sec": 10.0}
    b = dict(a, wall_sec=8.0, walls=[8.0, 9.0],
             triples_per_sec=125.0, turns_per_sec=12.5)
    m = _merge(a, b)
    assert m["walls"] == [12.0, 10.0, 8.0, 9.0]
    assert m["wall_sec"] == 8.0
    assert m["triples_per_sec"] == 125.0
    assert m["n_triples"] == 1000 and m["cores"] == 2
