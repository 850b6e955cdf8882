"""§2.3 filters / projections / predicates.

All plain Column expressions — Catalyst pushes them into the parquet
scan and keeps them inside WholeStageCodegen; nothing here crosses
into Python at runtime.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from raster2points_spark.io import register_views
from raster2points_spark.registry import register
from raster2points_spark.queries._util import t


@register(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus
    FROM lineitem
    WHERE (l_quantity > 30 AND l_discount <= 0.05)
       OR ((NOT (l_returnflag = 'N')) AND l_linestatus = 'F')
    """,
)
def filter_pred(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    cond = ((F.col("l_quantity") > 30) & (F.col("l_discount") <= 0.05)) | (
        (~(F.col("l_returnflag") == "N")) & (F.col("l_linestatus") == "F")
    )
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag", "l_linestatus"
    )


@register(
    "filter_between_in",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND (nullif(l_linestatus, 'F') IS NOT DISTINCT FROM nullif(l_returnflag, 'R'))
    """,
)
def filter_between_in(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & F.nullif(F.col("l_linestatus"), F.lit("F")).eqNullSafe(
            F.nullif(F.col("l_returnflag"), F.lit("R"))
        )
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")


@register(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE (p_type LIKE 'S%' OR p_type LIKE '%O%')
      AND regexp_matches(p_name, '(red|bl)')
      AND p_name NOT LIKE '%gear%'
    """,
)
def filter_like(spark, sf_dir):
    """LIKE / rlike / NOT LIKE semantics.  The r1 predicate required a
    digit in p_name — the corpus has none, so both engines returned 0
    rows and the hash match was vacuous.  This predicate keeps 296 of
    2000 parts at sf0.01, so the oracle actually discriminates."""
    p = t(spark, sf_dir, "part")
    return p.filter(
        (F.col("p_type").like("S%") | F.col("p_type").like("%O%"))
        & F.col("p_name").rlike("(red|bl)")
        & ~F.col("p_name").like("%gear%")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "project_expr",
    # Per-row money products land on exact .xx5 ties constantly, and
    # Spark (BigDecimal HALF_UP) vs DuckDB (nearbyint) break ties
    # differently.  floor(x*100 + 0.5)/100 is pure IEEE double
    # arithmetic — bit-identical in both engines (SURVEY §7 R1).
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS revenue,
           floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100 AS charge
    FROM lineitem
    """,
)
def project_expr(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))

    def cents(c):
        return F.floor(c * 100 + F.lit(0.5)) / 100

    return li.select(
        "l_orderkey",
        "l_linenumber",
        cents(rev).alias("revenue"),
        cents(rev * (F.lit(1) + F.col("l_tax"))).alias("charge"),
    )


@register(
    "case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'small' END AS bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
           round(greatest(o_totalprice, 200000.0), 2) AS hi,
           round(least(o_totalprice, 200000.0), 2) AS lo
    FROM orders
    """,
)
def case_when(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias("status2"),
        F.round(F.greatest(F.col("o_totalprice"), F.lit(200000.0)), 2).alias("hi"),
        F.round(F.least(F.col("o_totalprice"), F.lit(200000.0)), 2).alias("lo"),
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def distinct_rows(spark, sf_dir):
    return t(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


# --- correlated subqueries (Catalyst decorrelates these to joins — the
# scale story: a correlated EXISTS/IN/scalar-agg never executes
# per-row; it is rewritten into a semi/left join before planning) -----

_SUBQ_EXISTS_SQL = """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000
    )
"""

_SUBQ_IN_SQL = """
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_acctbal < 0
    )
"""

# max/count only: order-insensitive aggregates, so no float-sum-order
# drift between engines (avg over doubles broke the hash — R1 trap)
_SUBQ_SCALAR_SQL = """
    SELECT o.o_orderkey, o.o_custkey,
           round(o.o_totalprice, 2) AS price,
           (SELECT count(*) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey) AS cust_n_orders,
           round((SELECT max(o2.o_totalprice) FROM orders o2
                  WHERE o2.o_custkey = o.o_custkey), 2) AS cust_max_price
    FROM orders o
"""


@register("subq_exists", oracle=_SUBQ_EXISTS_SQL)
def subq_exists(spark, sf_dir):
    """Correlated EXISTS — decorrelated by Catalyst into a left-semi
    join (explain shows no per-row subquery execution)."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_SUBQ_EXISTS_SQL)


@register("subq_in", oracle=_SUBQ_IN_SQL)
def subq_in(spark, sf_dir):
    """IN (subquery) — semi-join rewrite; included separately from
    EXISTS because IN carries three-valued NULL semantics."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_SUBQ_IN_SQL)


@register("subq_scalar", oracle=_SUBQ_SCALAR_SQL)
def subq_scalar(spark, sf_dir):
    """Correlated scalar aggregate subquery — decorrelated to an
    aggregate + equi-join, so the per-customer average is computed
    once per customer, not once per outer row."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_SUBQ_SCALAR_SQL)
