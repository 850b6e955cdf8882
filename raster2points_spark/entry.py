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
# windows; after r9 every one of the 361 keys has a driver grade
# (never-graded gap = 0) and no key is red.
#
# The r10 window executes VERDICT r8 #2's refresh schedule plus this
# round's changes:
# - the 33 remaining r1-era stale keys (so no oracle key's newest
#   driver row predates r3),
# - the 3 streaming keys promoted this round from smoke to declared
#   rows-only batch-equivalence contracts (VERDICT r9 #5 — the driver
#   now grades their stable row counts),
# - bpe_train, whose trainer was rewritten this round to batch merges
#   (changed-key tranche rule),
# - scan_geotiff_mini, NEW this round (registry unfroze at zero
#   evidence gap): the TIFF front door oracle-checked off the
#   committed golden fixture.  (bpe_apply, the second r10 addition,
#   landed after the window was fixed — it queues for its first
#   driver grade in r11's window,)
# - 12 oldest r3-era stale keys, weighted toward the raster chain
#   downstream of this round's minitiff work (deflate/tiled/multiband
#   ingest) and the BPE family.
# r11+ walks the remaining r3/r4/r5 tail (tools/evidence_audit.py is
# the ordering source).
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- 33 r1-era stale keys ---
    "agg_approx_distinct",
    "agg_cube",
    "agg_filtered",
    "agg_grouping_sets",
    "agg_having",
    "agg_percentile",
    "agg_rollup",
    "agg_rollup_cascade",
    "agg_stats",
    "dedup_exact",
    "dedup_jaccard",
    "dedup_minhash_ml",
    "dedup_near",
    "dedup_simhash",
    "fn_cast",
    "fn_higher_order",
    "fn_math",
    "fn_string",
    "join_anti",
    "join_broadcast_star",
    "join_bucketed",
    "join_cross",
    "join_full",
    "join_inner_eq",
    "join_interval_bucketed",
    "join_left",
    "join_right",
    "join_salted",
    "join_semi",
    "join_theta_range",
    "sim_lsh",
    "text_stats",
    "text_tokens",
    # --- streaming smoke -> rows-only promotions (VERDICT r9 #5) ---
    "stream_watermark",
    "stream_dedup_state",
    "stream_custom_state",
    # --- changed this round: batched merge trainer ---
    "bpe_train",
    # --- new in r10 (registry unfroze at zero evidence gap):
    # the TIFF front door, oracle-checked off the committed fixture ---
    "scan_geotiff_mini",
    # --- 12 oldest r3-era stale keys (raster chain + BPE family) ---
    "affine_coords",
    "band_zip_join",
    "chunk_union",
    "col_rename",
    "filter_like",
    "fn_array",
    "geodesic_area",
    "grid_unpivot",
    "nodata_filter",
    "raster_big",
    "scan_tiles",
    "text_bpe_tokens",
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
