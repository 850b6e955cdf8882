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
