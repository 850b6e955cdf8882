"""Side-effect imports: each module registers its SURVEY §2 keys."""

from raster2points_spark.queries import (  # noqa: F401
    aggs,
    filters,
    joins,
    raster,
    scans,
)
