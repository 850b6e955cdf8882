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

# Exact-money arithmetic (r7).  Monetary sums are accumulated as exact
# bigints — l_extendedprice in integer cents times integer
# (100 ± discount/tax hundredths) — and divided back to dollars only at
# the final rounding.  Float sums are summation-ORDER-dependent, and a
# group total landing within float noise of a half-cent boundary rounds
# differently between engines (observed: tpch_q10 at sf0.001, revenue
# 261471.225 ± 1 ulp → .22 in one engine, .23 in the other).  Integer
# sums are associative, so that whole flake class is gone at any scale
# or partitioning.  The final round(sum/1e4, 2) is also deterministic:
# the quotient double can never land EXACTLY on a .005 boundary (x.xx5
# has a factor-5 denominator, unrepresentable in binary), so both
# engines round the same double the same way.  Bounds: revenue units
# are 1e-4 dollars (charge 1e-6), so bigint holds to ~1e14 dollars per
# group (~1e12 for charge) and double conversion is exact below 2^53
# units — past that, swap the accumulator to decimal(38,0) (same
# shape, one cast).  The corpus columns are verified 2-dp (max
# |x·100 − round(x·100)| < 1e-9 at sf0.1), so round(x·100) recovers
# the exact integer and the HALF_UP-vs-HALF_EVEN difference between
# engines can never fire.  The same strings serve the DuckDB oracle
# (f-string splice) and the Spark plan (F.expr) — one definition, two
# engines.
_EPC = "cast(round(l_extendedprice * 100) AS bigint)"  # price cents
_DC = "cast(round(l_discount * 100) AS bigint)"  # discount hundredths
_TC = "cast(round(l_tax * 100) AS bigint)"  # tax hundredths
_REV = f"({_EPC} * (100 - {_DC}))"  # revenue line, 1e-4 $ units
_CHG = f"({_EPC} * (100 - {_DC}) * (100 + {_TC}))"  # charge, 1e-6 $ units
_BALC = "cast(round(c_acctbal * 100) AS bigint)"  # acctbal cents


@register(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           round(sum({_REV}) / 10000.0, 2) AS revenue,
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
        .agg(F.round(F.sum(F.expr(_REV)) / 10000.0, 2).alias("revenue"))
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
    oracle=f"""
    SELECT n_name,
           round(sum({_REV}) / 10000.0, 2) AS revenue
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
        .agg(F.round(F.sum(F.expr(_REV)) / 10000.0, 2).alias("revenue"))
    )


@register(
    "tpch_q17",
    oracle=f"""
    SELECT p_brand,
           round(sum({_EPC}) / 100.0 / 7.0, 2) AS avg_yearly,
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
            F.round(F.sum(F.expr(_EPC)) / 100.0 / 7.0, 2).alias("avg_yearly"),
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


@register(
    "tpch_q6",
    oracle=f"""
    SELECT round(sum({_EPC} * {_DC}) / 10000.0, 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): the pure scan-kernel
    query — three conjunctive predicates and one global sum, no join,
    no group.

    Scale shape: every predicate reaches the parquet scan
    (PushedFilters on l_shipdate / l_discount / l_quantity), the
    projection prunes to two columns, and the aggregate is one
    map-side partial per task + a 1-row final merge — the minimal
    possible shuffle (a single scalar per task).  This is the query
    that measures raw scan throughput at 100 TB: no plan choice can
    hide a slow reader.
    """
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.expr(f"{_EPC} * {_DC}")) / 10000.0, 2).alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           round(sum({_REV}) / 10000.0, 2) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping): nation-pair trade flow — the same
    tiny dim joined TWICE under different roles (supplier's nation vs
    customer's nation), with a disjunctive cross-pair filter.

    Spark shape: both nation copies broadcast (aliased first so the
    self-join is unambiguous); the OR-of-pairs predicate lands AFTER
    both joins as a residual filter — Catalyst cannot split a
    disjunction across two join inputs, but each branch still prunes
    via the broadcast hash lookup, never a cartesian.  The big shuffle
    pairs are lineitem⋈orders (orderkey) and ⋈customer (custkey);
    supplier is small enough for AQE to broadcast.  Grouping is on two
    25-value dims × year — dozens of groups, map-side combined.
    """
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(F.expr(_REV)) / 10000.0, 2).alias("revenue"))
    )


@register(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           round(sum({_REV}) / 10000.0, 2) AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, round(c_acctbal, 2), n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): revenue lost to returns
    per customer in one quarter, top-20.

    Scale shape: the quarter filter prunes orders at the scan and the
    returnflag filter prunes lineitem at the scan BEFORE the big
    orderkey shuffle; nation broadcasts onto the grouped result side.
    Grouping carries the customer attributes (standard TPC-H shape) so
    no second join is needed post-agg; top-20 with (revenue DESC,
    c_custkey) tiebreak plans as TakeOrderedAndProject — no global
    sort of the |customers|-row aggregate (R2).
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer distribution): how many customers placed
    exactly k (non-urgent) orders — including k = 0, which is the
    whole point: the LEFT join preserves order-less customers, and
    count(o_orderkey) (not count(*)) counts them as zero.
    (Adapted: the original excludes orders by o_comment pattern; this
    corpus has no comment column, so priority <> '1-URGENT' plays the
    exclusion role.)

    Scale shape: the order-side filter sits INSIDE the join condition
    — pushed to the orders scan, never turning the outer join inner;
    first aggregate is keyed on c_custkey (same key as the join, so
    AQE can reuse the partitioning), second collapses |customers| rows
    to a few dozen (c_count, custdist) pairs via map-side combine.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "tpch_q14",
    oracle=f"""
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN {_REV} ELSE 0 END)
                   / sum({_REV}), 4
           ) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect): promo share of one month's
    revenue — conditional aggregation over a fact⋈dim join, returning
    a single ratio.

    Scale shape: the month filter prunes lineitem at the scan (a
    ~1/70th slice here, ~1/84th of a 7-year corpus generally); part
    joins broadcast (AQE — the dim is small relative to the fact);
    both sums come out of ONE aggregate pass (CASE inside sum, not two
    scans); final result is one row, so the merge shuffles a scalar
    pair per task.  The ratio divides two same-magnitude sums before
    rounding at 4 dp — engine-stable.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    p = t(spark, sf_dir, "part")
    disc = F.expr(_REV)
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0)))
                / F.sum(disc),
                4,
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum({_REV}) / 10000.0, 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): a reusable revenue "view" probed
    twice — once for the global max (scalar subquery) and once as the
    join input that the max filters.

    Spark shape: the revenue aggregate is computed ONCE and cached
    (Q15's CREATE VIEW is exactly a shared subplan); the scalar max
    over its |suppliers| rows is a 1-row aggregate that crossJoin-
    broadcasts back as a filter — the standard decorrelation, never a
    per-row subquery.  Revenue is rounded to 2 dp BEFORE the max
    comparison in both engines, so ties and the max itself are
    bit-identical cross-engine.  supplier joins the few surviving
    rows via broadcast.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.expr(_REV)) / 10000.0, 2).alias("total_revenue")
        )
        .persist()
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = t(spark, sf_dir, "supplier")
    out = (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )
    return out


@register(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark, sf_dir):
    """TPC-H Q4 (order priority checking), adapted to the corpus: the
    original's l_commitdate < l_receiptdate lateness test becomes
    "some line shipped more than 60 days after the order date" — the
    same correlated EXISTS over the fact table, which is the point of
    Q4: semi-join decorrelation.

    Spark shape: the EXISTS plans as ONE LeftSemi hash join on
    orderkey with the date comparison as a residual inside the join —
    never a per-order subquery, and no row duplication for
    multi-line orders (semi joins emit each order at most once, so
    the count needs no distinct).  The quarter filter prunes orders
    at the scan before the shuffle; output is |priorities| rows via
    map-side combine.
    """
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "tpch_q8",
    oracle=f"""
    SELECT year(o_orderdate) AS o_year,
           round(sum(CASE WHEN sn.n_name = 'NATION_3'
                          THEN {_REV} ELSE 0 END)
                 / sum({_REV}), 6) AS mkt_share
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = cn.n_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def tpch_q8(spark, sf_dir):
    """TPC-H Q8 (national market share), adapted (no p_type market
    segment on the part side in the original's sense — the market is
    defined by the customer's REGION alone): NATION_3's share of
    EUROPE-customer revenue per year.

    The share-of-total inside one grouped aggregate (CASE in the
    numerator, unconditional denominator) avoids Q8's classic
    two-query formulation.  nation appears TWICE (customer's, then
    supplier's) — both broadcast; region gates the customer's copy
    first so the fact rows that survive to the supplier join are
    already region-pruned.  Big shuffles: lineitem⋈orders (orderkey)
    and ⋈customer (custkey); supplier is AQE-broadcastable.  Ratio of
    same-magnitude sums rounded at 6 dp — engine-stable.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    cn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk")
    )
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    rev = F.expr(_REV)
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cnk") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("crk"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("snk") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0)))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q19",
    oracle=f"""
    SELECT round(sum({_REV}) / 10000.0, 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 40)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue), adapted to the corpus columns
    (brand/size/quantity play the brand/container/quantity roles):
    an OR of three conjunctive branches spanning BOTH join sides —
    the query that tests disjunctive predicate handling.

    What Catalyst can and can't do here, stated explicitly: the
    disjunction can't be pushed below the join as-is (each branch
    mixes part and lineitem columns), but the per-side IMPLIED
    prefilters CAN: p_brand IN (b1,b2,b3) prunes part and
    l_quantity BETWEEN 1 AND 50 prunes lineitem before the join;
    the full OR evaluates as a codegen residual inside the hash join.
    We state the implied filters explicitly (cheap, engine-neutral
    insurance — Spark's OR-factoring does not extract cross-column
    ranges).  One join, one 1-row aggregate; part side broadcast by
    AQE.
    """
    branches = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 50))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(1, 50))
    p = t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(branches)
        .agg(
            F.round(F.sum(F.expr(_REV)) / 10000.0, 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum({_EPC}) / 100.0, 2)                               AS sum_base_price,
           round(sum({_REV}) / 10000.0, 2)                             AS sum_disc_price,
           round(sum({_CHG}) / 1000000.0, 2)                           AS sum_charge,
           round(avg(l_quantity), 2)                                   AS avg_qty,
           round(sum({_EPC}) / count(*) / 100.0, 2)                    AS avg_price,
           round(sum({_DC}) / count(*) / 100.0, 4)                     AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= timestamp '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    """TPC-H Q1 (pricing summary report): the canonical full-scan
    wide aggregate.

    One pass over lineitem, 4 sums + 3 avgs + a count over ~6 groups:
    plans as a single partial HashAggregate (map-side combine collapses
    each partition to ≤|groups| rows) + one tiny exchange + final
    HashAggregate — the shape whose shuffle volume is O(groups ×
    partitions), independent of row count, so it scales to 100 TB
    unchanged.  All measures rounded identically both engines (R1);
    ORDER BY the full group key is already a total order (R2).
    """
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2001-06-01")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.expr(_EPC)) / 100.0, 2).alias("sum_base_price"),
            F.round(F.sum(F.expr(_REV)) / 10000.0, 2).alias("sum_disc_price"),
            F.round(F.sum(F.expr(_CHG)) / 1000000.0, 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.sum(F.expr(_EPC)) / F.count("*") / 100.0, 2).alias("avg_price"),
            F.round(F.sum(F.expr(_DC)) / F.count("*") / 100.0, 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q2",
    oracle="""
    WITH supply AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    cand AS (
      -- round() gets a DISTINCT name (s_acctbal_r) so no expression in
      -- this SELECT shadows the base column: lateral-alias-vs-column
      -- precedence is engine-version-fragile, and if an engine ever
      -- bound the rounded alias the raw_bal = max_bal extremum filter
      -- would change at rounding-boundary ties.
      SELECT p_partkey, p_type, round(s_acctbal, 2) AS s_acctbal_r, s_name, n_name,
             max(s_acctbal) OVER (PARTITION BY p_partkey) AS max_bal,
             s_acctbal AS raw_bal
      FROM part
      JOIN supply   ON l_partkey = p_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE p_size = 15 AND p_type = 'MEDIUM' AND r_name = 'EUROPE'
    )
    SELECT s_acctbal_r AS s_acctbal, s_name, n_name, p_partkey, p_type
    FROM cand
    WHERE raw_bal = max_bal
    ORDER BY s_acctbal_r DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
)
def tpch_q2(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier), adapted: no partsupp table in
    the corpus, so the part↔supplier relation is derived as the
    DISTINCT (l_partkey, l_suppkey) pairs of lineitem, and the
    per-part "best supplier" criterion is max s_acctbal (standing in
    for min ps_supplycost — same correlated-extremum shape).

    Scale: the (size, type) part filter prunes BEFORE the distinct —
    the supply dedup shuffle carries only lineitem rows for the ~0.4%
    of parts that survive (the filtered dim broadcasts, AQE's call),
    instead of content-keying the whole fact table and discarding
    99.6% of the deduped pairs at the subsequent join.  The DISTINCT
    itself stays required here (unlike q16): duplicate (part, supp)
    pairs would duplicate extremum OUTPUT rows, not just inflate an
    aggregate.  The correlated scalar subquery of the original is
    expressed as a per-part window max — one extra exchange on
    p_partkey, already the join key, so AQE reuses the partitioning.
    Top-20 plans as TakeOrderedAndProject with a full tiebreak chain
    (R2).
    """
    from pyspark.sql import Window

    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "MEDIUM")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supply = (
        p.join(
            t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("p_partkey", "p_type", "l_suppkey")
        .distinct()
    )
    cand = (
        supply.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .withColumn(
            "max_bal", F.max("s_acctbal").over(Window.partitionBy("p_partkey"))
        )
    )
    return (
        cand.filter(F.col("s_acctbal") == F.col("max_bal"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "tpch_q9",
    oracle=f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           round(sum({_REV}) / 10000.0, 2) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def tpch_q9(spark, sf_dir):
    """TPC-H Q9 (product-type profit), adapted: profit is revenue
    (extendedprice net of discount) — the corpus has no
    ps_supplycost to subtract — grouped by supplier nation × order
    year for parts whose name contains 'red'.

    Scale: the LIKE filter prunes part before the join (pushed to the
    scan as a residual; partkey pruning via AQE-broadcast of the ~⅙
    surviving dim).  lineitem⋈orders is the one big pair — both sides
    hash on orderkey.  supplier/nation broadcast.  Final agg is ~25
    nations × 7 years: map-side combine collapses it.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(F.expr(_REV)) / 10000.0, 2).alias("profit"))
    )


@register(
    "tpch_q11",
    oracle=f"""
    WITH value_by_part AS (
      SELECT l_partkey,
             sum({_EPC} * cast(l_quantity AS bigint)) AS raw_cents
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7')
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, round(raw_cents / 100.0, 2) AS part_value
    FROM value_by_part
    WHERE 500 * raw_cents > (SELECT sum(raw_cents) FROM value_by_part)
    """,
)
def tpch_q11(spark, sf_dir):
    """TPC-H Q11 (important stock identification), adapted: "stock
    value" per part is sum(l_extendedprice * l_quantity) shipped by
    suppliers of two nations — the corpus has no partsupp availqty —
    kept when the part's value exceeds 0.2% of the group total (the
    original's global-scalar HAVING shape).

    Scale: the nation filter broadcasts into the supplier dim and
    prunes lineitem via the suppkey hash join BEFORE the groupBy.
    The global threshold is a 1-row aggregate of the (already small)
    per-part relation, broadcast back as a literal-free cross join —
    never a second scan of lineitem.  The per-part relation is
    computed once and reused for both sides (Spark reuses the
    exchange; the oracle's CTE is evaluated twice by DuckDB but over
    the same tiny intermediate).
    """
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    by_part = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.expr(f"{_EPC} * cast(l_quantity AS bigint)")).alias("raw_cents")
        )
    )
    # 0.2% threshold in EXACT integers: raw > total*0.002 <=> 500*raw > total
    total = by_part.agg(F.sum("raw_cents").alias("total_cents"))
    return (
        by_part.crossJoin(F.broadcast(total))
        .filter(500 * F.col("raw_cents") > F.col("total_cents"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("raw_cents") / 100.0, 2).alias("part_value"),
        )
    )


@register(
    "tpch_q12",
    oracle="""
    SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY
                THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
           cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= timestamp '1996-01-01'
      AND l_shipdate <  timestamp '1998-01-01'
    GROUP BY 1
    """,
)
def tpch_q12(spark, sf_dir):
    """TPC-H Q12 (shipping modes / priority), adapted: the corpus has
    no l_shipmode or commit/receipt dates, so lines are bucketed by
    shipping DELAY (>=60 days after order date = LATE) and counted by
    order priority class — the same conditional-sum-over-join shape.

    Scale: the shipdate range filter is pushed to the lineitem scan
    (parquet min/max row-group pruning); one orderkey hash join; the
    2-group conditional aggregate collapses map-side.  The CASE on
    priority evaluates inside whole-stage codegen — no UDF.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "ship_bucket",
            F.when(
                F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                F.lit("LATE"),
            ).otherwise(F.lit("ONTIME")),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q16",
    oracle="""
    WITH supply AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN supply ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#4'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%007%'
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 30
    """,
)
def tpch_q16(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship), adapted: the supply
    relation is the DISTINCT (l_partkey, l_suppkey) of lineitem;
    "customer complaint" suppliers are those whose name contains
    '007'.  Same shape: anti-membership subquery + multi-filter dim +
    COUNT(DISTINCT) per group.

    Scale: part filters prune before the join; the complaint list is
    a ~1-row broadcast anti-join (NOT IN over a non-null key →
    left_anti, no null-trap here because s_suppkey is non-null by
    construction).  The oracle's DISTINCT supply CTE is deliberately
    NOT materialized as its own shuffle: count(DISTINCT suppkey)
    already plans as the two-phase partial-distinct aggregate, which
    dedupes (group, suppkey) pairs map-side — a separate pre-distinct
    of lineitem would add a full extra shuffle of the fact table for
    rows the aggregate dedupes anyway.  Top-30 is
    TakeOrderedAndProject (R2 tiebreaks).
    """
    supply = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    complaints = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%007%"))
        .select("s_suppkey")
    )
    return (
        p.join(supply, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(complaints),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(30)
    )


@register(
    "tpch_q20",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS supp_qty
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%blue%'
        AND l_shipdate >= timestamp '1998-01-01'
        AND l_shipdate <  timestamp '1999-01-01'
      GROUP BY l_suppkey, l_partkey
    ),
    part_total AS (
      SELECT l_partkey AS pt_partkey, sum(supp_qty) AS total_qty
      FROM shipped GROUP BY l_partkey
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM shipped
      JOIN part_total ON pt_partkey = l_partkey
      WHERE supp_qty > 0.5 * total_qty
    )
    """,
)
def tpch_q20(spark, sf_dir):
    """TPC-H Q20 (potential part promotion), adapted: a supplier
    qualifies when, for some 'blue' part, it shipped more than half of
    that part's total 1998 volume (standing in for the
    availqty > half-yearly-moved test — same nested-aggregate +
    semi-join shape; no partsupp in the corpus).

    Scale: part name filter broadcasts into lineitem; per
    (suppkey, partkey) partial agg collapses map-side; the per-part
    total is a second agg over the ALREADY-AGGREGATED tiny relation
    (never a lineitem re-scan), joined back on partkey.  Qualifying
    suppkeys semi-join supplier (left_semi — gating, no duplication).
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    shipped = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("supp_qty").alias("total_qty")
    )
    qualifying = (
        shipped.join(part_total, F.col("pt_partkey") == F.col("l_partkey"))
        .filter(F.col("supp_qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
    )


@register(
    "tpch_q22",
    oracle=f"""
    WITH eligible AS (
      SELECT c_custkey, {_BALC} AS balc, c_nationkey % 10 AS cntrycode
      FROM customer
      WHERE c_nationkey % 10 IN (1, 3, 5, 7)
    ),
    pos AS (
      SELECT sum(balc) AS s, count(*) AS n FROM eligible WHERE balc > 0
    )
    SELECT cntrycode,
           count(*) AS numcust,
           round(sum(balc) / 100.0, 2) AS totacctbal
    FROM eligible
    WHERE balc * (SELECT n FROM pos) > (SELECT s FROM pos)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= timestamp '2000-01-01'
      )
    GROUP BY cntrycode
    """,
)
def tpch_q22(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity), adapted: the corpus has
    no c_phone, so the "country code" is c_nationkey % 10, and the
    "never ordered" test becomes "no order since 2000-01-01" (at the
    corpus's order:customer ratio literally-no-orders is empty) —
    same shape: scalar-subquery average threshold + NOT EXISTS
    anti-join against a date-pruned orders + per-code aggregate.

    Scale: the positive-balance average is a 1-row broadcast; the
    NOT EXISTS plans as a left_anti hash join on custkey (orders side
    projected to the single join column before shuffling — column
    pruning keeps the exchange narrow); the final agg is ≤10 groups,
    map-side combined.
    """
    eligible = (
        t(spark, sf_dir, "customer")
        .withColumn("balc", F.expr(_BALC))
        .withColumn("cntrycode", F.col("c_nationkey") % 10)
        .filter(F.col("cntrycode").isin(1, 3, 5, 7))
    )
    # positive-balance mean threshold in EXACT integers:
    # balc > s/n  <=>  balc * n > s  (n > 0 whenever any row passes)
    avg_bal = eligible.filter(F.col("balc") > 0).agg(
        F.sum("balc").alias("s"), F.count("*").alias("n")
    )
    orders_keys = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        eligible.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("balc") * F.col("n") > F.col("s"))
        .join(orders_keys, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("balc") / 100.0, 2).alias("totacctbal"),
        )
    )
