"""Composite benchmark queries (TPC-H shapes Q3 / Q18).

[H] provenance: the harness's "same query capabilities" bar on the
TPC-H-ish corpus.  The single-operator families (§2.3-§2.8) prove each
primitive; these two prove the COMPOSITIONS Catalyst must optimize as
a whole — multi-join reordering + early aggregation + top-k pushdown
(Q3), and a grouped-HAVING semi-join feeding a second aggregate (Q18).

Scale notes:
- tpch_q3: customer dim filtered then broadcast; orders⋈lineitem is
  the one big shuffle pair; the final ORDER BY ... LIMIT 10 plans as
  TakeOrderedAndProject (partition-local top-k), never a global sort.
- tpch_q18: the HAVING subquery is one map-side-combined aggregate
  whose survivors semi-join orders (LeftSemi — no row duplication),
  then one more join+agg; qty threshold prunes before any wide join.

Determinism (SURVEY §7): revenue/totalprice rounded to 2 dp both
engines; LIMIT carries a full tiebreak chain (R2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from raster2points_spark.registry import register
from raster2points_spark.queries._util import t

_CUT = "1997-01-01"


@register(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < timestamp '{_CUT}'
      AND l_shipdate  > timestamp '{_CUT}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark, sf_dir):
    """TPC-H Q3 (shipping priority): segment-filtered 3-way join,
    grouped revenue, top-10.

    The BUILDING filter prunes customer BEFORE the join (Catalyst
    pushes it to the scan), AQE broadcasts the surviving dim; the
    LIMIT plans as TakeOrderedAndProject so no task sorts the full
    revenue table.  Tiebreak (revenue, o_orderdate, l_orderkey) makes
    the top-10 total-ordered (R2).
    """
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _CUT)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _CUT)
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q18",
    oracle="""
    SELECT c_custkey, o_orderkey,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 200
    )
    GROUP BY c_custkey, o_orderkey, o_totalprice
    """,
)
def tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): grouped-HAVING subquery
    gating a join + re-aggregation.

    The qty>200 survivor set is computed ONCE by a map-side-combined
    aggregate and semi-joins orders (LeftSemi — gating without row
    duplication, Catalyst decorrelates the IN); only surviving orders
    reach the customer join and the final per-order quantity rollup.
    """
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 200)
        .select("l_orderkey")
    )
    orders_raw = t(spark, sf_dir, "orders")
    orders = orders_raw.join(
        big, orders_raw.o_orderkey == big.l_orderkey, "left_semi"
    )
    cust = t(spark, sf_dir, "customer")
    return (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


@register(
    "tpch_q5",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): the 6-table join — the widest
    composition in the suite and the query join-ORDERING exists for.

    Scale shape: region→nation is a filter cascade over two tiny dims
    (broadcast), which prunes supplier BEFORE it meets lineitem; the
    only big shuffle pair is orders⋈lineitem on orderkey; the
    c_nationkey = s_nationkey condition closes the cycle as a join
    predicate, not a post-filter, so Catalyst can route it into the
    hash join.  Date range prunes orders at the scan
    (PushedFilters), |nations|-row output, no sort (the differ is
    order-insensitive; a global ORDER BY would be a lint violation).
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q17",
    oracle="""
    SELECT p_brand,
           round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_small
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_lim
      FROM lineitem GROUP BY 1
    ) a ON pk = l_partkey
    WHERE p_type = 'PROMO'
      AND l_quantity < qty_lim
    GROUP BY p_brand
    """,
)
def tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue), adapted to the corpus
    (no p_container column — p_type = 'PROMO' is the dim filter, and
    the result is per-brand instead of one global row so the hash
    checks 25 groups, not 1).

    The correlated scalar subquery `0.2 * avg(l_quantity) per part`
    DECORRELATES into one map-side-combined aggregate over lineitem
    keyed by partkey; its |parts|-row result joins back to lineitem on
    the same key.  Catalyst does this rewrite for correlated SQL — the
    DataFrame form states it explicitly, which is also the only shape
    that scales (per-row re-aggregation is quadratic).  The threshold
    comparison is exact cross-engine: l_quantity is integer-valued, so
    sum/avg are order-independent in doubles (< 2^53).

    Scale: lineitem is scanned twice (avg pass + probe pass) but
    shuffles only the |parts|-row aggregate; the part dim is filtered
    then joined (AQE broadcasts the survivor side); no sort.
    """
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    lim = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_lim")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(lim, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


@register(
    "tpch_q21",
    oracle="""
    SELECT l1.l_suppkey AS s_suppkey, count(*) AS numwait
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    WHERE EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > l1.l_shipdate
    )
    GROUP BY 1
    ORDER BY numwait DESC, s_suppkey
    LIMIT 20
    """,
)
def tpch_q21(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting), adapted to the
    corpus: the original's `l_receiptdate > l_commitdate` lateness
    columns don't exist, so "the blocking supplier" becomes "the
    STRICTLY-LATEST shipper of a multi-supplier finished order" — the
    same EXISTS (another supplier participated) + NOT EXISTS (none of
    them shipped later) correlated pair, which is the whole point of
    Q21: one fact table probed three ways.

    Spark shape: the EXISTS plans as a LeftSemi and the NOT EXISTS as
    a LeftAnti self-join, both EQUI on l_orderkey with the suppkey/
    shipdate conditions as residual predicates inside the hash join —
    never a per-row subquery.  Orders filtered to 'F' first (scan
    pushdown) then joined to gate l1; the two self-join probes reuse
    the same orderkey shuffle partitioning.  Top-20 with full tiebreak
    plans as TakeOrderedAndProject (R2).
    """
    li = t(spark, sf_dir, "lineitem")
    o_f = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.join(o_f, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"),
        F.col("l_suppkey").alias("s2"),
        F.col("l_shipdate").alias("d2"),
    )
    multi = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    )
    latest = multi.join(
        l2,
        (F.col("l_orderkey") == F.col("k2"))
        & (F.col("l_suppkey") != F.col("s2"))
        & (F.col("d2") > F.col("l_shipdate")),
        "left_anti",
    )
    return (
        latest.groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(20)
    )
