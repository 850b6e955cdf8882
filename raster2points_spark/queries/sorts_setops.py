"""§2.7 sorts / limits / set operations.

Global top-k compiles to TakeOrderedAndProject (per-partition heap +
driver merge of k rows — never a full sort at scale).  unionAll is
free (logical concatenation of partitions); only the distinct
variants shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from raster2points_spark.registry import register
from raster2points_spark.queries._util import t


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
    """,
)
def sort_limit_topk(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
    )


def _union_sides(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    a = li.filter(F.col("l_quantity") < 3).select(F.col("l_orderkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_orderkey").alias("k"))
    return a, b


_UNION_SQL = """
    SELECT l_orderkey AS k FROM lineitem WHERE l_quantity < 3
    {op}
    SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'P'
"""


@register("set_union_all", oracle=_UNION_SQL.format(op="UNION ALL"))
def set_union_all(spark, sf_dir):
    a, b = _union_sides(spark, sf_dir)
    return a.unionAll(b)


@register("set_union_distinct", oracle=_UNION_SQL.format(op="UNION"))
def set_union_distinct(spark, sf_dir):
    a, b = _union_sides(spark, sf_dir)
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_custkey AS k FROM customer
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def set_intersect(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("k"))
    )
    return c.intersect(o)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except(spark, sf_dir):
    """EXCEPT ALL — multiset difference (each P occurrence cancels one
    F occurrence for the same key)."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("k"))
    return a.exceptAll(b)


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL — multiset intersection: a key appearing m times
    on one side and n on the other yields min(m, n) rows, the bag
    semantics INTERSECT's dedup destroys.  Spark plans intersectAll as
    one hash aggregation counting per-side multiplicities then a
    generate of min(m, n) replicas — one shuffle on the key, no join
    blowup (replication is capped by the smaller multiplicity).
    """
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return a.intersectAll(b)


@register(
    "set_except_distinct",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except_distinct(spark, sf_dir):
    """EXCEPT (DISTINCT) — set difference: keys with ANY occurrence on
    the right vanish entirely, and the left side dedups.  The twin of
    set_except's EXCEPT ALL; together they pin the multiset-vs-set
    semantic split.  Plans as a LeftAnti join after a distinct — both
    keyed on the same column, one partitioning reused.
    """
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("k"))
    return a.subtract(b)


@register(
    "sort_nulls_order",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE round(o_totalprice, 2) END AS p
    FROM orders
    ORDER BY p DESC NULLS LAST, o_orderkey
    LIMIT 40
    """,
)
def sort_nulls_order(spark, sf_dir):
    """NULL-ordering surface: DESC NULLS LAST — the ordering every
    leaderboard wants (missing metrics sink to the bottom), and a
    cross-engine trap: Spark's default for DESC is NULLS LAST while
    ANSI/DuckDB's is NULLS FIRST, so the intent must be SPELLED, not
    defaulted, on both sides.  Still plans as TakeOrderedAndProject
    (the null-aware comparator changes the heap order, not the
    algorithm); full (p, o_orderkey) tiebreak (R2).
    """
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.round("o_totalprice", 2))
        .alias("p"),
    )
    return o.orderBy(F.col("p").desc_nulls_last(), "o_orderkey").limit(40)
