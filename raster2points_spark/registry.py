"""Query registry — the single source of truth for SURVEY.md §2 keys.

Every operator in the inventory registers here with its Spark
implementation and (when SQL-expressible) the DuckDB oracle SQL the
driver compares against.  ``__spark_entry__.py`` is a thin re-export.

Determinism contract baked into every registered query (SURVEY §7):
  R1  float aggregates rounded identically in Spark expr and oracle SQL
  R2  every orderBy / limit / row_number carries a total-order tiebreak
  R3  ``events.ts`` is parquet timestamp[ns] → always date_trunc'd
  R4  ANSI mode on both engines; try_* where null-on-error is intended
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB, None => rows-only
    check: str = "oracle"  # oracle | rows-only | smoke
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, check: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry.

    ``check`` defaults to "oracle" when oracle SQL is given, else
    "rows-only".
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        resolved = check or ("oracle" if oracle else "rows-only")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, check=resolved, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so their @register calls run."""
    import raster2points_spark.queries  # noqa: F401  (side-effect imports)

    return REGISTRY
