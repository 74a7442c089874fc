"""Driver-contract queries for the training-data operators (dedup,
similarity search, text analysis, multimodal) — each a thin adapter over
the package operator plus a DuckDB oracle where the semantics are
SQL-expressible. Winnowing (rolling hash — not SQL-expressible) is
oracle-checked through frozen VALUES generated from its pure-Python
form, drift-guarded in pytest.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedupe as D
from .operators import multimodal as MM
from .operators import similarity as S
from .operators import textops as T


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# shared SQL fragment: distinct word 3-gram shingles per doc
_SQL_SHINGLES = """
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT DISTINCT doc_id AS id,
              unnest([array_to_string(ws[i:i+2], ' ')
                      for i in range(1, greatest(len(ws) - 2, 0) + 1)]) AS shingle
       FROM words)
"""


# --- dedup family -----------------------------------------------------------

def q17_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash (hash-groupBy): survivor + copy count.
    Keyed on a normalized prefix so the fixture produces real groups."""
    return (D.exact_dedup_groups(_docs(spark, sf_dir), "doc_id",
                                 F.substring(F.lower(F.col("text")), 1, 40))
            .orderBy("content_key"))


SQL_Q17 = """
SELECT md5(substr(lower(text), 1, 40)) AS content_key,
       min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY content_key
"""


def q18_ngram_jaccard(spark, sf_dir):
    """n-gram Jaccard near-dup pairs (threshold 0.2), shipped WITH the
    stop-shingle cap (max_doc_freq=20): shingles in >20 docs are dropped
    before the self-join — they generate O(df²) candidate rows at scale
    but can't push dissimilar docs over the threshold. The oracle applies
    the identical HAVING filter, so both sides compute the same sets."""
    return (D.ngram_jaccard_pairs(_docs(spark, sf_dir), "doc_id", "text",
                                  n=3, threshold=0.2, max_doc_freq=20)
            .orderBy("id_a", "id_b"))


SQL_Q18 = f"""
WITH {_SQL_SHINGLES},
keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 20),
shf AS (SELECT sh.id, sh.shingle FROM sh JOIN keep USING (shingle)),
sizes AS (SELECT id, count(*) AS n_sh FROM shf GROUP BY id),
common AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
           FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.id < b.id
           GROUP BY a.id, b.id)
SELECT id_a, id_b,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) >= 0.2
ORDER BY id_a, id_b
"""


def q19_minhash_lsh(spark, sf_dir):
    """MinHash (md5-portable) + banded LSH blocking + exact-Jaccard
    verification of candidates (threshold 0.2)."""
    return (D.minhash_lsh_pairs(_docs(spark, sf_dir), "doc_id", "text",
                                n=3, k=8, bands=4, verify_threshold=0.2)
            .orderBy("id_a", "id_b"))


# shared chain: shingles → minhash sig → bands → candidates → verified
# pairs(id_a, id_b, jaccard ≥ 0.2). Threshold applied on the ROUNDED
# value — exactly what the engine filters on.
_SQL_MINHASH_PAIRS = f"""{_SQL_SHINGLES},
hs AS (SELECT unnest(range(0, 8)) AS i),
sig AS (SELECT id, i,
               min(md5(concat(CAST(i AS VARCHAR), '|', shingle))) AS minh
        FROM sh, hs GROUP BY id, i),
banded AS (SELECT id, CAST(i // 2 AS INT) AS band,
                  string_agg(concat(CAST(i AS VARCHAR), ':', minh), ','
                             ORDER BY concat(CAST(i AS VARCHAR), ':', minh)) AS band_sig
           FROM sig GROUP BY id, band),
cands AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.band_sig = b.band_sig AND a.id < b.id),
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
common AS (SELECT c.id_a, c.id_b, count(*) AS n_common
           FROM cands c
           JOIN sh a ON a.id = c.id_a
           JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
           GROUP BY c.id_a, c.id_b),
pairs AS (SELECT id_a, id_b,
                 round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
          FROM common
          JOIN sizes sa ON sa.id = id_a
          JOIN sizes sb ON sb.id = id_b
          WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) >= 0.2)"""

SQL_Q19 = f"""
WITH {_SQL_MINHASH_PAIRS}
SELECT id_a, id_b, jaccard FROM pairs ORDER BY id_a, id_b
"""


def q37_dup_clusters_cc(spark, sf_dir):
    """Duplicate clusters = connected components over the MinHash-LSH
    near-dup pair graph — the north rule's canonicalization union-find
    (large-star/small-star iterative joins) exercised end-to-end with a
    DuckDB recursive-CTE oracle: every member maps to its component's
    minimum doc_id."""
    from .operators.cc import connected_components

    pairs = D.minhash_lsh_pairs(_docs(spark, sf_dir), "doc_id", "text",
                                n=3, k=8, bands=4, verify_threshold=0.2)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    return connected_components(edges).orderBy("member")


SQL_Q37 = f"""
WITH RECURSIVE {_SQL_MINHASH_PAIRS},
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL
          SELECT id_b AS src, id_a AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst
)
SELECT id AS member, min(r) AS canonical FROM reach GROUP BY id ORDER BY member
"""


def q20_simhash_near_pairs(spark, sf_dir):
    """SimHash near-dup pairs. max_hamming=7 stays inside the 8-chunk
    pigeonhole guarantee (n_chunks > d), so the blocked join is EXACT —
    and the md5-portable token hash makes it oracle-checkable."""
    return (D.simhash_near_pairs(_docs(spark, sf_dir), "doc_id", "text",
                                 max_hamming=7)
            .orderBy("id_a", "id_b"))


# Same fingerprints bit-for-bit: token hash = top-16-hex-chars of md5 as
# UBIGINT; fingerprint built as signed BIGINT (bit 63 = -2^63 term, the
# two's-complement value Spark's shiftleft(1,63) wraps to); hamming via
# xor+bit_count. The oracle's pair join is quadratic — fine at oracle sf.
SQL_Q20 = """
WITH tok AS (SELECT doc_id AS id,
                    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
             FROM documents),
h AS (SELECT id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h FROM tok),
bpos AS (SELECT unnest(range(0, 64)) AS b),
bits AS (SELECT id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
         FROM h, bpos GROUP BY id, b),
fp AS (SELECT id, sum(CASE WHEN s > 0 THEN
                        CASE WHEN b = 63 THEN (-9223372036854775807 - 1)
                             ELSE (1::BIGINT << CAST(b AS INT)) END
                      ELSE 0 END)::BIGINT AS f
       FROM bits GROUP BY id)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.f, b.f)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.id < b.id
WHERE bit_count(xor(a.f, b.f)) <= 7
ORDER BY id_a, id_b
"""


def q21_embedding_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs through BANDED sign-LSH blocking
    (the scale path — per-band bucket equi-joins, no cross product; the
    exact pairwise form stays available as the verification baseline).
    4 bands × 4 planes: OR-amplification lifts pair recall at cos 0.9
    from ≈0.54 (the round-2 single-bucket form) to ≈0.97; recall vs the
    exact baseline is asserted in test_dataops. The oracle applies the
    identical literal-plane banded candidate restriction."""
    return (D.embedding_cosine_pairs_bucketed(
                _embs(spark, sf_dir), "vec_id", "embedding",
                threshold=0.9, n_planes=4, n_bands=4)
            .orderBy("id_a", "id_b"))


def sql_q21(dim: int) -> str:
    # 16 planes = 4 bands × 4 planes, band = j // 4; string_agg ORDER BY j
    # inside a band concatenates the same plane order as the engine
    planes = S.plane_weights(dim, 16)
    return f"""
WITH bk AS (SELECT vec_id, CAST(j // 4 AS INT) AS band,
                   string_agg(CASE WHEN list_dot_product(embedding, w::DOUBLE[]) > 0
                                   THEN '1' ELSE '0' END, '' ORDER BY j) AS bucket
            FROM embeddings, {_planes_sql(planes)} GROUP BY vec_id, band),
cand AS (SELECT DISTINCT ba.vec_id AS id_a, bb.vec_id AS id_b
         FROM bk ba JOIN bk bb
           ON ba.band = bb.band AND ba.bucket = bb.bucket
          AND ba.vec_id < bb.vec_id)
SELECT c.id_a, c.id_b,
       round(list_dot_product(a.embedding, b.embedding)
             / (sqrt(list_dot_product(a.embedding, a.embedding))
                * sqrt(list_dot_product(b.embedding, b.embedding))), 4) AS cos
FROM cand c
JOIN embeddings a ON a.vec_id = c.id_a
JOIN embeddings b ON b.vec_id = c.id_b
WHERE round(list_dot_product(a.embedding, b.embedding)
            / (sqrt(list_dot_product(a.embedding, a.embedding))
               * sqrt(list_dot_product(b.embedding, b.embedding))), 4) >= 0.9
ORDER BY id_a, id_b
"""


# --- similarity search ------------------------------------------------------

def _query_vec(spark, sf_dir) -> list[float]:
    row = (_embs(spark, sf_dir).filter(F.col("vec_id") == 0)
           .select("embedding").first())
    return [float(x) for x in row["embedding"]]


def q22_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline (query = vector 0)."""
    return S.cosine_topk(_embs(spark, sf_dir), "vec_id", "embedding",
                         _query_vec(spark, sf_dir), k=10)


SQL_Q22 = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id AS id,
       round(list_dot_product(embedding, qv)
             / (sqrt(list_dot_product(embedding, embedding))
                * sqrt(list_dot_product(qv, qv))), 4) AS cos
FROM embeddings, q
ORDER BY cos DESC, id LIMIT 10
"""


def _planes_sql(planes: list[list[int]]) -> str:
    rows = ", ".join(f"({j}, {list(w)})" for j, w in enumerate(planes))
    return f"(VALUES {rows}) planes(j, w)"


def q23_lsh_bucket_histogram(spark, sf_dir):
    """Sign-LSH bucketing of the embedding table (the ANN scale path):
    bucket histogram — literal integer planes, engine-portable."""
    emb = _embs(spark, sf_dir)
    dim = len(_query_vec(spark, sf_dir))
    planes = S.plane_weights(dim, 4)
    return (emb.select(S.lsh_bucket_of(F.col("embedding"), planes).alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("bucket"))


def sql_q23(dim: int) -> str:
    planes = S.plane_weights(dim, 4)
    return f"""
WITH proj AS (
  SELECT vec_id, j, list_dot_product(embedding, w::DOUBLE[]) AS s
  FROM embeddings, {_planes_sql(planes)}),
bits AS (
  SELECT vec_id,
         string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS bucket
  FROM proj GROUP BY vec_id)
SELECT bucket, count(*) AS n FROM bits GROUP BY bucket ORDER BY bucket
"""


def q24_lsh_bucket_topk(spark, sf_dir):
    """Approximate top-k restricted to the query's LSH bucket. Oracle-
    checked: the SQL derives the query's bucket from the same literal
    integer planes and applies the identical bucket filter + top-k."""
    return S.lsh_bucket_topk(_embs(spark, sf_dir), "vec_id", "embedding",
                             _query_vec(spark, sf_dir), k=10, n_planes=4)


def sql_q24(dim: int) -> str:
    planes = S.plane_weights(dim, 4)
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qb AS (SELECT string_agg(CASE WHEN list_dot_product(qv, w::DOUBLE[]) > 0
                              THEN '1' ELSE '0' END, '' ORDER BY j) AS qbucket
       FROM q, {_planes_sql(planes)}),
bk AS (SELECT vec_id,
              string_agg(CASE WHEN list_dot_product(embedding, w::DOUBLE[]) > 0
                              THEN '1' ELSE '0' END, '' ORDER BY j) AS bucket
       FROM embeddings, {_planes_sql(planes)} GROUP BY vec_id)
SELECT e.vec_id AS id,
       round(list_dot_product(e.embedding, q.qv)
             / (sqrt(list_dot_product(e.embedding, e.embedding))
                * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos
FROM embeddings e, q, qb, bk
WHERE bk.vec_id = e.vec_id AND bk.bucket = qb.qbucket
ORDER BY cos DESC, id LIMIT 10
"""


def q36_ann_bucket_scan(spark, sf_dir):
    """Top-k probe against the MATERIALIZED bucket table (the 100 TB ANN
    path): embeddings written partitionBy(bucket) once per session, probe
    reads only the query's bucket directory (partition pruning). Same
    semantics as q24 → same oracle SQL shape."""
    import os

    from .session import app_scratch_path

    path = app_scratch_path(spark, f"ann_buckets_{os.path.basename(sf_dir.rstrip('/'))}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        S.write_bucketed_embeddings(_embs(spark, sf_dir), "vec_id", "embedding",
                                    path, n_planes=4)
    return S.bucketed_table_topk(spark, path, _query_vec(spark, sf_dir), k=10,
                                 n_planes=4)


def q39_ivf_topk(spark, sf_dir):
    """IVF-style ANN: deterministic coarse quantizer (centroids =
    vec_id < 8), nearest-list probe, exact cosine top-k within the
    probed list — the second ANN family next to sign-LSH (q23/q24/q36).
    Oracle reproduces the same assignment argmin in SQL."""
    return S.ivf_topk(_embs(spark, sf_dir), "vec_id", "embedding",
                      _query_vec(spark, sf_dir), k=10, k_centroids=8,
                      n_probe=1)


SQL_Q39 = """
WITH c AS (SELECT vec_id AS j, embedding AS cv FROM embeddings WHERE vec_id < 8),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qd AS (SELECT j, list_dot_product(qv, qv) - 2 * list_dot_product(qv, cv)
              + list_dot_product(cv, cv) AS l2 FROM q, c),
qa AS (SELECT min(j) AS qlist FROM qd WHERE l2 = (SELECT min(l2) FROM qd)),
d AS (SELECT e.vec_id, c.j,
             list_dot_product(e.embedding, e.embedding)
             - 2 * list_dot_product(e.embedding, c.cv)
             + list_dot_product(c.cv, c.cv) AS l2
      FROM embeddings e, c),
m AS (SELECT vec_id, min(l2) AS ml FROM d GROUP BY vec_id),
a AS (SELECT d.vec_id, min(d.j) AS list_id
      FROM d JOIN m ON d.vec_id = m.vec_id AND d.l2 = m.ml GROUP BY d.vec_id)
SELECT e.vec_id AS id,
       round(list_dot_product(e.embedding, q.qv)
             / (sqrt(list_dot_product(e.embedding, e.embedding))
                * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos
FROM embeddings e, q, qa, a
WHERE a.vec_id = e.vec_id AND a.list_id = qa.qlist
ORDER BY cos DESC, id LIMIT 10
"""


# --- text analysis ----------------------------------------------------------

def q25_token_count(spark, sf_dir):
    return (T.token_count(_docs(spark, sf_dir), "doc_id", "text")
            .orderBy("id"))


SQL_Q25 = """
SELECT doc_id AS id,
       len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
       CAST(ceil(length(text) / 4.0) AS INT) AS n_subwords_est
FROM documents ORDER BY id
"""


def q26_quality_score(spark, sf_dir):
    return (T.quality_score(_docs(spark, sf_dir), "doc_id", "text")
            .orderBy("id"))


SQL_Q26 = """
WITH t AS (SELECT doc_id AS id, text,
                  list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents)
SELECT id,
       len(toks) AS n_tokens,
       round(length(text) / greatest(len(toks), 1), 4) AS avg_token_len,
       round(len(list_filter(toks, x -> x IN ('the','and','of','to','a')))
             / greatest(len(toks), 1), 4) AS stopword_ratio,
       round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
             / greatest(length(text), 1), 4) AS punct_ratio
FROM t ORDER BY id
"""


def q27_lang_id(spark, sf_dir):
    return (T.lang_id(_docs(spark, sf_dir), "doc_id", "text")
            .orderBy("id"))


SQL_Q27 = """
WITH t AS (SELECT doc_id AS id,
                  list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
s AS (SELECT id,
             len(list_filter(toks, x -> x IN ('the','and','of','to','a'))) AS s_en,
             len(list_filter(toks, x -> x IN ('der','die','und','das','ein'))) AS s_de,
             len(list_filter(toks, x -> x IN ('le','la','et','les','des'))) AS s_fr,
             len(list_filter(toks, x -> x IN ('el','los','que','una','y'))) AS s_es
      FROM t),
b AS (SELECT *, greatest(s_en, s_de, s_fr, s_es) AS best FROM s)
SELECT id,
       CASE WHEN best = 0 THEN 'und'
            WHEN s_de = best THEN 'de'
            WHEN s_en = best THEN 'en'
            WHEN s_es = best THEN 'es'
            WHEN s_fr = best THEN 'fr'
            ELSE 'und' END AS lang_pred
FROM b ORDER BY id
"""


def q28_fingerprint(spark, sf_dir):
    return (T.md5_fingerprint(_docs(spark, sf_dir), "doc_id", "text")
            .orderBy("id"))


SQL_Q28 = """
SELECT doc_id AS id,
       md5(trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
FROM documents ORDER BY id
"""


# Frozen golden for q29 from the pure-Python winnow oracle
# (:func:`glean_cetaf_rdfs_spark.operators.textops.winnow_py`) over
# /root/testdata/sf0.01/documents.parquet — doc_ids are contiguous
# 0..499, so the list index IS the id. Drift-guarded in
# tests/test_entry_contract.py (recomputed from the parquet every run).
_Q29_NFPS_SF001 = [
    33, 96, 45, 24, 50, 58, 11, 82, 97, 86, 45, 61, 71, 69, 102, 42, 16,
    84, 92, 7, 77, 44, 90, 37, 102, 101, 8, 73, 68, 39, 30, 51, 113, 48,
    30, 92, 24, 77, 38, 23, 90, 70, 71, 32, 27, 97, 102, 42, 31, 49, 51,
    72, 11, 33, 64, 41, 123, 94, 80, 21, 107, 65, 85, 104, 27, 23, 72, 75,
    33, 69, 108, 70, 45, 111, 7, 64, 76, 65, 48, 11, 32, 69, 50, 14, 86,
    28, 27, 26, 64, 27, 26, 86, 26, 22, 33, 61, 102, 70, 117, 38, 104, 48,
    107, 110, 50, 70, 12, 47, 11, 75, 9, 110, 65, 89, 39, 21, 15, 47, 87,
    16, 41, 36, 21, 29, 67, 37, 105, 93, 96, 93, 28, 56, 67, 105, 27, 120,
    67, 43, 73, 53, 31, 88, 108, 86, 14, 86, 25, 96, 38, 31, 54, 112, 44,
    91, 91, 82, 24, 18, 16, 76, 54, 102, 95, 54, 21, 18, 64, 106, 44, 83,
    22, 68, 17, 114, 74, 31, 108, 57, 42, 108, 37, 22, 79, 16, 93, 64, 89,
    100, 51, 43, 90, 22, 22, 33, 31, 64, 66, 118, 52, 31, 64, 65, 98, 24,
    19, 75, 25, 79, 21, 45, 109, 51, 50, 101, 12, 116, 113, 71, 92, 35,
    117, 42, 53, 98, 102, 92, 24, 94, 98, 86, 67, 29, 60, 100, 73, 44, 12,
    85, 55, 28, 81, 104, 79, 32, 74, 96, 35, 98, 97, 88, 51, 115, 53, 37,
    17, 26, 10, 21, 81, 50, 24, 96, 55, 89, 116, 58, 49, 96, 42, 103, 102,
    60, 106, 29, 107, 5, 114, 32, 81, 57, 101, 37, 35, 105, 55, 101, 53,
    21, 34, 44, 117, 88, 105, 79, 106, 37, 73, 64, 36, 105, 46, 101, 106,
    90, 39, 9, 91, 67, 17, 51, 32, 105, 84, 15, 46, 101, 90, 82, 97, 108,
    85, 58, 52, 65, 42, 67, 35, 31, 100, 69, 68, 64, 41, 35, 102, 68, 82,
    51, 18, 37, 52, 97, 18, 30, 88, 67, 82, 51, 22, 91, 95, 80, 108, 63,
    103, 74, 73, 53, 9, 64, 96, 71, 12, 72, 55, 13, 66, 46, 12, 57, 51,
    73, 26, 70, 37, 66, 72, 46, 68, 81, 97, 74, 27, 51, 17, 84, 98, 47,
    69, 32, 29, 49, 28, 99, 86, 103, 50, 56, 20, 60, 24, 92, 35, 97, 40,
    65, 101, 18, 15, 52, 80, 83, 82, 96, 89, 62, 57, 111, 96, 20, 97, 93,
    76, 80, 87, 25, 89, 95, 61, 114, 80, 68, 74, 35, 90, 31, 56, 93, 31,
    32, 49, 118, 95, 57, 83, 59, 28, 108, 54, 35, 25, 18, 75, 114, 31, 7,
    25, 36, 67, 76, 52, 84, 68, 100, 37, 66, 106, 77, 43, 7, 44, 69, 40,
    62, 77, 13, 13, 27, 56, 82, 69, 13, 32, 49, 39, 31, 31, 64, 40, 67,
    59, 76, 10, 96, 41, 82, 95, 20, 97, 33,
]

SQL_Q29 = ("SELECT CAST(id AS BIGINT) AS id, CAST(n_fps AS INT) AS n_fps FROM (VALUES "
           + ", ".join(f"({i}, {n})".format(i=i, n=n)
                       for i, n in enumerate(_Q29_NFPS_SF001))
           + ") t(id, n_fps) ORDER BY id")


def q29_winnow_fingerprint(spark, sf_dir):
    """Rolling-hash winnowing fingerprints (pandas/Arrow stage). Oracle =
    frozen VALUES from the pure-Python winnow at the driver's correctness
    sf (see _Q29_NFPS_SF001; drift-guarded in test_entry_contract)."""
    return (T.winnow_fingerprints(_docs(spark, sf_dir), "doc_id", "text")
            .select("id", F.size("fps").cast("int").alias("n_fps"))
            .orderBy("id"))


# --- multimodal -------------------------------------------------------------

def q30_multimodal_metadata(spark, sf_dir):
    """Binary-asset metadata extraction through the mapInPandas decode
    stage (FakeCodec). sha256/n_bytes are oracle-checkable; the derived
    width/height are pytest-verified."""
    assets = MM.assets_from_documents(_docs(spark, sf_dir))
    return (MM.extract_metadata(assets)
            .select("asset_id", "kind", "n_bytes", "sha256")
            .orderBy("asset_id"))


SQL_Q30 = """
SELECT doc_id AS asset_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha256
FROM documents ORDER BY asset_id
"""


def q31_frame_sample_plan(spark, sf_dir):
    """Video frame-sampling plan (sequence+explode over decoded
    durations). Oracle-checked: FakeCodec's duration is sha256-derived
    (100 + int(hex[:8],16) % 600000), which DuckDB reproduces."""
    assets = MM.assets_from_documents(_docs(spark, sf_dir))
    meta = MM.extract_metadata(assets)
    return (MM.frame_sample_plan(meta, every_ms=60000)
            .groupBy("asset_id").agg(F.count(F.lit(1)).alias("n_frames"))
            .orderBy("asset_id"))


# kind = video ⇔ doc_id % 3 = 2 (assets_from_documents cycling);
# n_frames = len(sequence(0, duration, 60000)) = duration // 60000 + 1;
# empty payloads decode to null duration → no frames (length(text) > 0)
SQL_Q31 = """
SELECT doc_id AS asset_id,
       CAST(((100 + ('0x' || substr(sha256(text), 1, 8))::UBIGINT % 600000)
             // 60000) + 1 AS BIGINT) AS n_frames
FROM documents
WHERE doc_id % 3 = 2 AND length(text) > 0
ORDER BY asset_id
"""


DATA_QUERIES: dict[str, tuple[Callable, str | None]] = {
    "q17_dedup_exact": (q17_dedup_exact, SQL_Q17),
    "q18_ngram_jaccard": (q18_ngram_jaccard, SQL_Q18),
    "q19_minhash_lsh": (q19_minhash_lsh, SQL_Q19),
    "q20_simhash_near_pairs": (q20_simhash_near_pairs, SQL_Q20),
    "q37_dup_clusters_cc": (q37_dup_clusters_cc, SQL_Q37),
    "q21_embedding_dup_pairs": (q21_embedding_dup_pairs, sql_q21(64)),
    "q22_cosine_topk": (q22_cosine_topk, SQL_Q22),
    "q23_lsh_bucket_histogram": (q23_lsh_bucket_histogram, sql_q23(64)),
    "q24_lsh_bucket_topk": (q24_lsh_bucket_topk, sql_q24(64)),
    "q36_ann_bucket_scan": (q36_ann_bucket_scan, sql_q24(64)),
    "q39_ivf_topk": (q39_ivf_topk, SQL_Q39),
    "q25_token_count": (q25_token_count, SQL_Q25),
    "q26_quality_score": (q26_quality_score, SQL_Q26),
    "q27_lang_id": (q27_lang_id, SQL_Q27),
    "q28_fingerprint": (q28_fingerprint, SQL_Q28),
    "q29_winnow_fingerprint": (q29_winnow_fingerprint, SQL_Q29),
    "q30_multimodal_metadata": (q30_multimodal_metadata, SQL_Q30),
    "q31_frame_sample_plan": (q31_frame_sample_plan, SQL_Q31),
}
