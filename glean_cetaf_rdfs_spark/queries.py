"""Driver-contract queries: one per operator family from SURVEY.md §2,
each with a DuckDB-runnable ANSI-SQL oracle.

Every entry maps a reference operator (cited) onto the driver's TPC-H-ish
tables. Column aliases match between the Spark plan and the SQL exactly —
the driver hash-compares values after sorting columns by name. Floating
aggregates are rounded (2 dp on large sums, 4-5 dp on ratios) so
summation-order differences between engines can't flip the hash.

Spark-side plans are written for scale: filters first (pushdown), joins
hinted broadcast where one side is dimension-sized, aggregations
expressed so map-side partial aggregation applies.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# A. scans / filters / projections (P1, P2 — get_RDF4domain…:475)
# ---------------------------------------------------------------------------

def q02_filter_regex_project(spark, sf_dir):
    """rlike filter + regexp_extract projection (URI-list scan analog)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.filter(F.col("props").rlike(r'"k": \d+'))
            .select(
                "event_id",
                F.regexp_extract("props", r'"k": (\d+)', 1).cast("int").alias("k_value"),
            ))


SQL_Q02 = """
SELECT event_id,
       CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS k_value
FROM events
WHERE regexp_matches(props, '"k": \\d+')
"""

# ---------------------------------------------------------------------------
# B. aggregations (A1-A6)
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shaped groupBy multi-agg (headline; A-family)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
                F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus"))


SQL_Q01 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                            AS sum_qty,
       round(sum(l_extendedprice), 2)                       AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)    AS sum_disc_price,
       round(avg(l_quantity), 4)                            AS avg_qty,
       round(avg(l_discount), 4)                            AS avg_disc,
       count(*)                                             AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q03_status_histogram(spark, sf_dir):
    """sort|uniq -c status histogram (A2 — README.md:216-218)."""
    return (_t(spark, sf_dir, "events")
            .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("event_type"))


SQL_Q03 = "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type"


def q04_code_classify(spark, sf_dir):
    """awk HTTP-code classifier analog (get_RDF4domain…:239): bucket a
    numeric column into OK/ERROR classes, count per class."""
    ev = _t(spark, sf_dir, "events")
    return (ev.withColumn("status_class",
                          F.when((F.col("value") >= 100) & (F.col("value") < 150), "OK")
                          .otherwise("ERROR"))
            .groupBy("status_class").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("status_class"))


SQL_Q04 = """
SELECT CASE WHEN value >= 100 AND value < 150 THEN 'OK' ELSE 'ERROR' END AS status_class,
       count(*) AS n
FROM events GROUP BY 1 ORDER BY 1
"""


def q05_domain_histogram(spark, sf_dir):
    """per-domain URI histogram (A3 — doc/JACQ…md:99-136)."""
    # CAST/.cast symmetry: DuckDB types sum(int) as HUGEINT (hashes as
    # float via pandas); Spark returns long — pin both to BIGINT so the
    # driver's value hash agrees (CORRECTNESS_r01 q05 artifact).
    return (_t(spark, sf_dir, "documents")
            .groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"),
                                   F.sum("n_chars").cast("long").alias("total_chars"))
            .orderBy("source"))


SQL_Q05 = ("SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars "
           "FROM documents GROUP BY source ORDER BY source")


def q14_exemplar_agg(spark, sf_dir):
    """per-graph count + exemplar row (A6 — count_cspp…json)."""
    return (_t(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("event_id").alias("first_event"),
                 F.min("ts").alias("first_ts"))
            .orderBy("event_type"))


SQL_Q14 = ("SELECT event_type, count(*) AS n, min(event_id) AS first_event, "
           "min(ts) AS first_ts FROM events GROUP BY event_type ORDER BY event_type")

# ---------------------------------------------------------------------------
# C. joins (J1-J3)
# ---------------------------------------------------------------------------

def q06_done_anti_join(spark, sf_dir):
    """done-list resume anti-join (J3 — comm -13, doc/JACQ…md:60-89):
    customers with no orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .select("c_custkey", "c_name").orderBy("c_custkey"))


SQL_Q06 = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
"""


def q07_broadcast_lookup_join(spark, sf_dir):
    """institution-dictionary lookup (J1 — JACQ.sh:434-812) as an explicit
    broadcast hash join: fact lineitem × dim part."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n_items"))
            .orderBy("p_brand"))


SQL_Q07 = """
SELECT p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
"""


def q08_conditional_literal_join(spark, sf_dir):
    """conditional link on a literal (J2 — Finland.sh:471-522): join key is
    (fk, literal predicate) — orders of BUILDING-segment customers."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    return (orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("o_orderpriority"))


SQL_Q08 = """
SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

# ---------------------------------------------------------------------------
# D. windows / sibling-triple flags (§2.6, G2/G4)
# ---------------------------------------------------------------------------

def q09_sibling_flag(spark, sf_dir):
    """subject-level flag from sibling rows (G2 retraction — Finland.sh:443):
    customers having at least one 'F'-status order, via grouped max-flag."""
    orders = _t(spark, sf_dir, "orders")
    return (orders.groupBy(F.col("o_custkey").alias("custkey"))
            .agg(F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("has_f"))
            .filter(F.col("has_f") == 1)
            .select("custkey").orderBy("custkey"))


SQL_Q09 = """
SELECT o_custkey AS custkey FROM orders
GROUP BY o_custkey
HAVING max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) = 1
ORDER BY custkey
"""


def q10_topk_per_group(spark, sf_dir):
    """stable turn ordering / top-k per group (§2.6): 3 latest events per
    user by (ts, event_id) window rank."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("user_id", "event_id", "rn")
            .orderBy("user_id", "rn"))


SQL_Q10 = """
SELECT user_id, event_id, rn FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn <= 3 ORDER BY user_id, rn
"""

# ---------------------------------------------------------------------------
# E. sorts / limits / set ops (O1-O5, U1-U3)
# ---------------------------------------------------------------------------

def q11_topk(spark, sf_dir):
    """top-1/top-k largest (O4 — import…:87-90)."""
    return (_t(spark, sf_dir, "orders")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
            .limit(10))


SQL_Q11 = ("SELECT o_orderkey, round(o_totalprice, 2) AS totalprice FROM orders "
           "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10")


def q12_union_distinct(spark, sf_dir):
    """union + distinct (U1/U3 — README.md:250-268, fixRDF…:350)."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.union(b).distinct().orderBy("custkey")


SQL_Q12 = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
UNION
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY custkey
"""


def q13_round_cast(spark, sf_dir):
    """decimal typing + rounding (P15/P16 — JACQ.sh:368-374, 390-395).

    Rounding digits chosen so the true decimal value never sits at a
    rounding half-boundary (price has 2 dp, quantity is integral → the
    product has exactly 2 dp): engines disagree on binary half-cases
    (Spark BigDecimal HALF_UP vs DuckDB multiply-round), the reference's
    perl sprintf %.5f has the same caveat."""
    li = _t(spark, sf_dir, "lineitem")
    # ORDER BY includes every output column: (l_orderkey, l_linenumber)
    # is NOT unique in the synthetic lineitem, and a non-total sort +
    # LIMIT lets the two engines pick different boundary rows
    return (li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * F.col("l_quantity"), 2).alias("charge"),
        F.round(F.col("l_discount") * 100, 0).cast("int").alias("disc_pct"),
        F.col("l_quantity").cast("int").alias("qty_int"),
    ).orderBy("l_orderkey", "l_linenumber", "charge", "disc_pct", "qty_int")
     .limit(500))


SQL_Q13 = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * l_quantity, 2) AS charge,
       CAST(round(l_discount * 100, 0) AS INT) AS disc_pct,
       CAST(l_quantity AS INT) AS qty_int
FROM lineitem
ORDER BY l_orderkey, l_linenumber, charge, disc_pct, qty_int LIMIT 500
"""


def q15_ordered_scan(spark, sf_dir):
    """version-sort determinism (O1 — fixRDF…:280): ordered projection."""
    return (_t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderdate")
            .orderBy("o_orderdate", "o_orderkey").limit(100))


SQL_Q15 = ("SELECT o_orderkey, o_orderdate FROM orders "
           "ORDER BY o_orderdate, o_orderkey LIMIT 100")


def q16_sessionize(spark, sf_dir):
    """sessionization (streaming analog §2.10): per-user session count with
    a 30-minute inactivity gap — lag + cumulative sum."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # one named lag column: two inline F.lag(...).over(w) references
    # produce two identical window expressions (_we0/_we1) — Catalyst
    # does not dedupe them (round-6 plan audit)
    gap = (F.unix_timestamp("ts") - F.unix_timestamp("_prev")) > 1800
    return (ev.withColumn("_prev", F.lag("ts").over(w))
            .withColumn("new_sess",
                        F.when(gap | F.col("_prev").isNull(), 1).otherwise(0))
            .groupBy("user_id").agg(F.sum("new_sess").cast("long").alias("n_sessions"))
            .orderBy("user_id"))


# CAST to BIGINT: DuckDB sum(int) is HUGEINT → float64 via pandas → hash
# mismatch vs Spark's long (CORRECTNESS_r01 q16 artifact)
SQL_Q16 = """
SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions FROM (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
GROUP BY user_id ORDER BY user_id
"""

def q33_except(spark, sf_dir):
    """set difference (U2 — the reference's comm -13 done-diff besides the
    anti-join): custkeys with open orders minus custkeys with F orders."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b).orderBy("custkey")  # EXCEPT (distinct) semantics


SQL_Q33 = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY custkey
"""


def q34_intersect(spark, sf_dir):
    """set intersection (U4 — 'available free' per SURVEY §2.8)."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b).orderBy("custkey")


SQL_Q34 = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY custkey
"""


def q33_set_ops_fused(spark, sf_dir):
    """EXCEPT and INTERSECT (U2 + U4) as one contract row: both set ops
    over the same two order-status keysets, legs tagged by ``set_op`` —
    the q24/q39-style fold that freed a driver slot for
    q55_repetition_signals."""
    orders = _t(spark, sf_dir, "orders")
    a = (orders.filter(F.col("o_orderstatus") == "O")
         .select(F.col("o_custkey").alias("custkey")))
    b = (orders.filter(F.col("o_orderstatus") == "F")
         .select(F.col("o_custkey").alias("custkey")))
    ex = a.subtract(b).select(F.lit("except").alias("set_op"), "custkey")
    it = a.intersect(b).select(F.lit("intersect").alias("set_op"), "custkey")
    return ex.unionByName(it).orderBy("set_op", "custkey")


SQL_Q33_FUSED = """
SELECT 'except' AS set_op, custkey FROM (
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT 'intersect' AS set_op, custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
ORDER BY set_op, custkey
"""


def q38_salted_count(spark, sf_dir):
    """Skew-safe two-phase aggregation (north rule 'skew from hot
    entities … salted repartitioning'; the reference load-spreads with
    `shuf`, get_RDF4domain…:488): salted partial counts merged — result
    identical to a plain GROUP BY, which is exactly what the oracle
    checks."""
    from .operators.skew import salted_count

    ev = _t(spark, sf_dir, "events")
    return (salted_count(ev, "user_id", n_salts=16)
            .select(F.col("user_id"), F.col("n").cast("long").alias("n"))
            .orderBy("user_id"))


SQL_Q38 = ("SELECT user_id, count(*) AS n FROM events "
           "GROUP BY user_id ORDER BY user_id")


def q35_deterministic_shuffle(spark, sf_dir):
    """randomized work order (O3 — the reference's seeded `shuf -r` load
    spreading, get_RDF4domain…:488): deterministic 'random' permutation by
    hashing the key (portable across engines, unlike rand(seed))."""
    return (_t(spark, sf_dir, "orders")
            .select("o_orderkey", F.md5(F.col("o_orderkey").cast("string")).alias("slot"))
            .orderBy("slot", "o_orderkey").limit(50))


SQL_Q35 = """
SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS slot
FROM orders ORDER BY slot, o_orderkey LIMIT 50
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

RELATIONAL_QUERIES: dict[str, tuple[Callable, str | None]] = {
    "q01_pricing_summary": (q01_pricing_summary, SQL_Q01),
    "q02_filter_regex_project": (q02_filter_regex_project, SQL_Q02),
    "q03_status_histogram": (q03_status_histogram, SQL_Q03),
    "q04_code_classify": (q04_code_classify, SQL_Q04),
    "q05_domain_histogram": (q05_domain_histogram, SQL_Q05),
    "q06_done_anti_join": (q06_done_anti_join, SQL_Q06),
    "q07_broadcast_lookup_join": (q07_broadcast_lookup_join, SQL_Q07),
    "q08_conditional_literal_join": (q08_conditional_literal_join, SQL_Q08),
    "q09_sibling_flag": (q09_sibling_flag, SQL_Q09),
    "q10_topk_per_group": (q10_topk_per_group, SQL_Q10),
    "q11_topk": (q11_topk, SQL_Q11),
    "q12_union_distinct": (q12_union_distinct, SQL_Q12),
    "q13_round_cast": (q13_round_cast, SQL_Q13),
    "q14_exemplar_agg": (q14_exemplar_agg, SQL_Q14),
    "q15_ordered_scan": (q15_ordered_scan, SQL_Q15),
    "q16_sessionize": (q16_sessionize, SQL_Q16),
    "q33_except": (q33_except, SQL_Q33),
    "q34_intersect": (q34_intersect, SQL_Q34),
    "q35_deterministic_shuffle": (q35_deterministic_shuffle, SQL_Q35),
    "q38_salted_count": (q38_salted_count, SQL_Q38),
}
