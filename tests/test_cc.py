"""Connected-components tests (FIXTURES.md §4): chains, a hot star
(skew fixture), 2-node islands — verified against a plain union-find."""

from __future__ import annotations

import random

from glean_cetaf_rdfs_spark.operators.cc import connected_components


def _union_find(edges):
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = lexicographic min of component
    comps: dict[str, set[str]] = {}
    for n in list(parent):
        comps.setdefault(find(n), set()).add(n)
    return {n: min(members | {root}) for root, members in comps.items() for n in members}


def _fixture_edges():
    rnd = random.Random(7)
    edges = []
    # chains a→b→c (length 2..6)
    for i in range(20):
        chain = [f"chain{i:02d}-n{j}" for j in range(2 + i % 5)]
        edges += list(zip(chain, chain[1:]))
    # hot star: one entity with 1000 aliases (skew)
    edges += [("hub", f"alias-{k:04d}") for k in range(1000)]
    # 2-node islands
    edges += [(f"isl{i}-a", f"isl{i}-b") for i in range(30)]
    # a few duplicate + reversed edges for dedup/symmetry handling
    edges += [(b, a) for a, b in edges[:15]]
    rnd.shuffle(edges)
    return edges


def test_cc_matches_union_find(spark):
    edges = _fixture_edges()
    want = _union_find(edges)
    df = spark.createDataFrame(edges, schema="src string, dst string")
    got = {r["member"]: r["canonical"] for r in connected_components(df).collect()}
    assert got == want


def test_cc_idempotent_on_star_output(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "c")], schema="src string, dst string")
    got = {r["member"]: r["canonical"] for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_cc_reliable_checkpoint_matches_local(spark, tmp_path):
    """The reliable-storage checkpoint variant (the cluster-scale option:
    localCheckpoint blocks die with their executor) must produce the
    identical component map."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("m", "m2"), ("m2", "m3")],
        "src string, dst string")
    local = {(r["member"], r["canonical"])
             for r in connected_components(edges).collect()}
    reliable = {(r["member"], r["canonical"])
                for r in connected_components(
                    edges, checkpoint_dir=str(tmp_path / "ck")).collect()}
    assert reliable == local
    assert {c for _, c in local} == {"a", "x", "m"}


def test_driver_and_distributed_paths_identical(spark):
    """The small-graph driver union-find must produce EXACTLY the
    distributed fixpoint's mapping — on chains, stars, multi-component
    graphs, strings, and the empty set."""
    from glean_cetaf_rdfs_spark.operators.cc import connected_components

    cases = [
        ("long", [(2, 1), (3, 2), (5, 4), (9, 9)],),
        ("long", [(7, 3), (3, 1), (10, 7), (2, 8)],),
        ("string", [("b", "a"), ("c", "b"), ("z", "y")],),
        ("long", [],),
    ]
    for typ, pairs in cases:
        e = spark.createDataFrame(pairs, f"src {typ}, dst {typ}") \
            if pairs else spark.createDataFrame([], f"src {typ}, dst {typ}")
        drv = {(r["member"], r["canonical"]) for r in
               connected_components(e).collect()}
        dist = {(r["member"], r["canonical"]) for r in
                connected_components(e, driver_threshold=0).collect()}
        assert drv == dist, (typ, pairs)
