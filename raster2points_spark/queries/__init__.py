"""Side-effect imports: each module registers its SURVEY §2 keys."""

from raster2points_spark.queries import (  # noqa: F401
    aggs,
    analytics,
    behavioral,
    filters,
    functions,
    joins,
    llm,
    raster,
    scans,
    sorts_setops,
    streaming,
    tpch,
    udfs,
    windows,
)
