"""Driver-contract implementation (re-exported by __spark_entry__.py).

- entry(spark): flagship star-join query on sf0.001.
- queries(): every registered SURVEY §2 key → (spark, sf_dir) callable.
- oracle_sql(): DuckDB twin for each oracle-checked key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from raster2points_spark.registry import load_all

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 4-way broadcast star join + grouped revenue rollup —
    the reference's scan→mask→transform→sink shape applied to the
    relational corpus, exercising scan pruning, broadcast joins and
    partial aggregation in one plan."""
    registry = load_all()
    return registry["join_broadcast_star"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None and spec.check == "oracle"
    }
