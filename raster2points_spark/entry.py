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

# The grading driver evaluates only the FIRST 50 ``queries()`` keys per
# round.  Cumulative driver-verified coverage = union of all round
# windows; after r10 362 of 363 then-registered keys had a driver
# grade and no key was red.
#
# The r12 window (VERDICT r11 #1: keep walking the stale tail —
# oldest grades first; tools/evidence_audit.py is the ordering
# source):
# - the 4 NEW r12 keys, never driver-graded: scan_geotiff_sparse
#   (sparse tiles + internal mask SubIFD, VERDICT r11 #2),
#   sim_ivf_recall (composed ANN recall eval, VERDICT r11 #6),
#   scan_raster_catalog (distributed header catalog) and
#   raster_extent_prune (catalog-driven bbox pruning),
# - the 2 keys CHANGED this round (changed-key tranche rule):
#   sim_ivf (half-away-from-zero rounding in the trained-codebook
#   assignment, ADVICE r11) and udf_cogrouped_map (applyInPandas →
#   applyInArrow, VERDICT r11 #4),
# - the 30 remaining r4-era stale keys (clears the r4 tail entirely),
# - the 14 oldest r5-era stale keys.
# r13+ walks the remaining r5/r6 tail.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- never graded (new this round) + changed this round ---
    "scan_geotiff_sparse",
    "sim_ivf_recall",
    "scan_raster_catalog",
    "raster_extent_prune",
    "sim_ivf",
    "udf_cogrouped_map",
    # --- the 30 remaining r4-era stale keys (then 14 oldest r5) ---
    "outlier_zscore",
    "pipeline_dedup_full",
    "profile_columns",
    "sample_mixture",
    "sample_split",
    "scan_csv_roundtrip",
    "scan_parquet",
    "scd2_build",
    "sink_compact",
    "sink_parquet",
    "sink_sorted",
    "sink_zorder",
    "stream_foreach_batch",
    "stream_funnel",
    "stream_session",
    "stream_sliding",
    "stream_tumbling",
    "subq_exists",
    "subq_in",
    "subq_scalar",
    "text_contamination",
    "text_gopher_rules",
    "text_ngram_counts",
    "text_pii_scrub",
    "text_unigram_ppl",
    "ts_gapfill",
    "ts_resample",
    "udf_map_in_pandas",
    "win_lag_lead",
    "win_moving",
    # --- 14 oldest r5-era stale keys ---
    "agg_entropy",
    "audience_overlap",
    "cte_recursive",
    "dedup_chunks",
    "dedup_incremental",
    "embed_centroids",
    "embed_dim_stats",
    "embed_normalize",
    "embed_whiten",
    "fn_collation",
    "fn_haversine",
    "fn_try_arith",
    "fn_variant",
    "funnel_latency",
)


def _ordered():
    registry = load_all()
    prio = {k: i for i, k in enumerate(DRIVER_PRIORITY)}
    missing = [k for k in DRIVER_PRIORITY if k not in registry]
    if missing:
        raise KeyError(f"DRIVER_PRIORITY names unknown keys: {missing}")

    def rank(i, name, spec):
        if name in prio:
            return (0, prio[name])
        # oracle keys before rows-only/smoke; stable within each class
        return (1 if spec.check == "oracle" else 2, i)

    items = sorted(
        ((rank(i, n, s), n, s) for i, (n, s) in enumerate(registry.items()))
    )
    return {n: s for _, n, s in items}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 4-way broadcast star join + grouped revenue rollup —
    the reference's scan→mask→transform→sink shape applied to the
    relational corpus, exercising scan pruning, broadcast joins and
    partial aggregation in one plan."""
    registry = load_all()
    return registry["join_broadcast_star"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _ordered().items()
        if spec.oracle is not None and spec.check == "oracle"
    }
