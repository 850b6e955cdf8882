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
# The r11 window (VERDICT r10 #1: grade bpe_apply, keep walking the
# stale tail):
# - bpe_apply FIRST — the only never-driver-graded key (landed after
#   r10's window froze); its oracle was also rewritten this round to
#   per-rule replace-to-fixpoint (ADVICE r10 medium), so this grade
#   covers both,
# - the 2 NEW r11 keys: scan_geotiff_overview (COG overview IFDs,
#   VERDICT r10 #2) and scan_geotiff_mask1bit (1-bit masks, VERDICT
#   r10 #3),
# - sim_ivf, changed this round (Lloyd-trained codebook, VERDICT r10
#   #4 — changed-key tranche rule),
# - the 29 remaining r3-era stale keys (clears the r3 tail entirely),
# - the 17 oldest r4-era stale keys.
# r12+ walks the remaining r4/r5 tail (tools/evidence_audit.py is the
# ordering source).
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- never graded + changed/new this round ---
    "bpe_apply",
    "scan_geotiff_overview",
    "scan_geotiff_mask1bit",
    "sim_ivf",
    # --- the 29 remaining r3-era stale keys ---
    "agg_collect_sorted",
    "mm_frame_sample",
    "mm_resize",
    "mm_struct",
    "pipeline_clean_corpus",
    "scan_json_roundtrip",
    "scan_orc_roundtrip",
    "set_except",
    "set_intersect",
    "set_union_all",
    "set_union_distinct",
    "sink_partitioned",
    "sort_limit_topk",
    "text_fingerprint",
    "text_langid",
    "text_langid_ngram",
    "text_quality",
    "text_rolling_hash",
    "text_tfidf",
    "tile_stats",
    "udf_grouped_agg",
    "udf_grouped_map",
    "udf_pandas_scalar",
    "udf_scalar_py",
    "udtf_py",
    "win_analytic",
    "win_rank",
    "win_running",
    "win_topk_group",
    # --- 17 oldest r4-era stale keys ---
    "agg_argminmax",
    "agg_count_distinct",
    "agg_histogram",
    "agg_kmv_sketch",
    "agg_pivot",
    "dedup_components",
    "embed_quantize",
    "filter_between_in",
    "fn_bitwise",
    "fn_date",
    "fn_json",
    "fn_regex",
    "gen_range",
    "join_asof",
    "join_interval",
    "merge_upsert",
    "mm_decode",
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
