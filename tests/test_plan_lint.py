"""Registry-wide plan-hygiene lint (fast subset in CI; the full sweep
is tools/plan_lint.py, its clean report committed under reports/).

Guards the rules individual plan pins can miss when NEW operators
land: no CartesianProduct, no unjustified BroadcastNestedLoopJoin, no
row-at-a-time Python, no global sort — every exception must be
allowlisted with a reason in tools/plan_lint.py's RULES table."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from plan_lint import lint  # noqa: E402

# one representative per family + every key added in r5
SUBSET = [
    "agg_groupby",
    "join_inner_eq",
    "win_rank",
    "dedup_near",
    "sim_knn",
    "text_quality",
    "sessionize_batch",
    "cohort_retention",
    "funnel_batch",
    "seq_transitions",
    "rle_events",
    "anomaly_mad",
    "agg_corr",
    "agg_regression",
    "agg_entropy",
    "dedup_edit_distance",
    "dedup_chunks",
    "join_dpp",
    "join_lateral",
    "cte_recursive",
    "reshape_unpivot",
    "tpch_q3",
    "tpch_q18",
    "embed_dim_stats",
    "embed_whiten",
    "sample_weighted",
    "mv_incremental",
    "raster_slope",
    "fn_haversine",
    "raster_band_math",
    "rfm_segments",
    "join_asof_forward",
    # post-r5-freeze keys (never in a committed lint sweep before r6)
    "basket_pairs",
    "basket_rules",
    "fn_map",
    "agg_any_all",
    "agg_weighted_avg",
    "agg_mode",
    "win_ratio_share",
    "scd2_asof_lookup",
    "concurrency_peak",
    "pareto_customers",
    "ts_spike_detect",
    "ts_pct_change",
    "text_zipf_slope",
    "attribution_first_touch",
    "join_null_safe",
    "raster_hillshade",
    "raster_fill_idw",
    "funnel_latency",
    "source_vocab_overlap",
    "text_compression_ratio",
    # SortAggregate allowlisted trio — keep them linted so the reasons
    # stay honest (a plan change that loses the justification fails)
    "profile_columns",
    "fn_collation",
    "join_bucketed",
    # r6 additions
    "tpch_q5",
    "agg_session_window",
    "raster_reproject_nn",
    "agg_approx_percentile",
    "seq_pattern_detect",
    "embed_gram_matrix",
    "agg_hll_partial_merge",
    "agg_bitmap_distinct",
    "agg_salted_twophase",
    "win_count_distinct",
    "seq_markov",
    "graph_triangle_count",
    "raster_zonal_stats",
    "sample_temperature",
    "text_context_windows",
    "dedup_url_canonical",
    "text_repetition_ratio",
    # r6 late additions (this session)
    "tpch_q17",
    "tpch_q21",
    "win_locf",
    "ts_ewma",
    "dedup_containment",
    "text_bigram_ppl",
    "fn_url",
    "agg_listagg",
    "graph_shortest_hops",
    "raster_resample_bilinear",
    "ml_kmeans_lloyd",
    "embed_power_iteration",
    "fn_timestamp_fmt",
    "win_dist_rank",
    "ts_seasonal_decompose",
    "agg_benford_profile",
    "raster_region_label",
    "ts_autocorr",
    "text_sentence_split",
    "fn_struct",
    "scan_schema_evolution",
    "feature_loo_encoding",
    "raster_flow_direction",
    "sim_mips",
    "text_kn_smoothing",
    "diff_snapshots",
    "ab_test_proportions",
    "ts_cusum_changepoint",
    "sample_kcenter",
    "scan_csv_permissive",
    "agg_corr_matrix",
    "interval_coverage",
    "fn_mask",
    "text_readability",
    "raster_flow_accumulation",
    "seq_top_paths",
    "seq_markov_eval",
    "sim_matryoshka_eval",
    "profile_drift_psi",
    "ml_confusion_matrix",
    "sink_dynamic_overwrite",
    "scan_glob_recursive",
    "pipeline_quality_ensemble",
    "agg_gini",
    "ts_backtest_naive",
    "text_novelty",
    # r6 TPC-H widening (this session)
    "tpch_q6",
    "tpch_q7",
    "tpch_q10",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "ts_interpolate_linear",
    "dq_expectations",
    "shuffle_shards",
    "text_boilerplate",
    "win_range_frame",
    "spatial_nearest",
    "tpch_q4",
    "tpch_q8",
    "tpch_q19",
    "set_intersect_all",
    "set_except_distinct",
    "sort_nulls_order",
    "fn_explode_outer",
    "feature_onehot",
    "feature_hashing",
    "udf_map_in_arrow",
    "agg_moments",
    "corr_spearman",
    "win_rolling_median",
    "ts_ohlc",
    "scan_observe",
    "ml_auc_roc",
    "ml_decision_stump",
    "ml_calibration_bins",
    "ml_linreg_normal",
    "ts_cross_correlation",
    "ml_ndcg",
    "privacy_k_anonymity",
    "profile_key_skew",
    "sample_balanced",
    "privacy_l_diversity",
    "agg_multi_distinct",
    "join_strategy_hints",
    "pipeline_release_gate",
    "sink_manifest",
    "udf_cogrouped_map",
    "fn_sql_udf",
    # full TPC-H sweep completion (this session): all 22 shapes
    "tpch_q1",
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q16",
    "tpch_q20",
    "tpch_q22",
    "agg_kmv_set_ops",
    "privacy_dp_counts",
    "cdc_net_changes",
    "join_phonetic",
    "embed_pq",
    "udf_pandas_iter",
    "skyline_pareto_front",
    "join_bloom_runtime",
    "mv_join_incremental",
    "agg_count_min_sketch",
    "dedup_semantic_cluster",
    "agg_exact_median_twopass",
    "hierarchy_rollup",
    "ml_logreg_irls",
    "privacy_erasure_cascade",
    "join_not_in_nullaware",
    "agg_hll_oracle",
    "stat_bootstrap_se",
    "ml_naive_bayes",
    "text_bm25",
    "text_phrase_near",
    "raster_contour_cells",
    "spatial_point_in_polygon",
    "fn_uuid_name",
    "pipeline_rag_index",
    "dedup_near_recall",
    "join_allen_relations",
    "join_asof_tolerance",
    "agg_exact_p99_grouped",
    "win_groups_frame",
    "pipeline_entity_resolution",
    "sink_timetravel",
    "raster_mosaic_priority",
    "mm_training_manifest",
    "agg_compound_product",
]


def test_plan_lint_subset(spark):
    violations = lint(SUBSET)
    assert not violations, violations


def test_global_window_rule_detects_single_partition(spark):
    """The r7 structural rule: a Window whose child chain reaches an
    Exchange SinglePartition (global window — one-task funnel at
    100 TB) is flagged; a key-partitioned window is not."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from plan_lint import global_window_hits
    from raster2points_spark.plans import explain_formatted

    base = spark.range(100).withColumn("k", F.pmod("id", F.lit(4)))
    global_w = base.withColumn("r", F.row_number().over(W.orderBy("id")))
    assert global_window_hits(explain_formatted(global_w))

    part_w = base.withColumn(
        "r", F.row_number().over(W.partitionBy("k").orderBy("id"))
    )
    assert not global_window_hits(explain_formatted(part_w))


def test_global_window_allowlist_is_justified():
    """Every GLOBAL_WINDOW_ALLOW entry must carry a collapsed-
    cardinality argument (reviewed text, not a bare key)."""
    from plan_lint import GLOBAL_WINDOW_ALLOW
    from raster2points_spark.registry import load_all

    reg = load_all()
    for key, reason in GLOBAL_WINDOW_ALLOW.items():
        assert key in reg, f"allowlisted unknown key {key}"
        assert len(reason) > 30, f"{key}: reason too thin to review"


def test_committed_sweep_covers_current_registry():
    """The r5 gap: the committed full-sweep report said '176 registered
    keys' while the registry had grown to 210 — the newest keys had no
    lint evidence.  Pin: the NEWEST reports/plan_lint_r*.txt clean line
    must state exactly the current registry size, so growing the
    registry without re-running tools/plan_lint.py fails here."""
    import re

    from raster2points_spark.registry import load_all

    # numeric round sort — "plan_lint_r9.txt" sorts after
    # "plan_lint_r10.txt" lexicographically (the 9->10 rollover)
    reports = sorted(
        (Path(__file__).resolve().parent.parent / "reports").glob("plan_lint_r*.txt"),
        key=lambda p: (int(re.search(r"_r(\d+)", p.name).group(1)), p.name),
    )
    assert reports, "no committed plan-lint sweep"
    text = reports[-1].read_text()
    m = re.search(r"plan lint clean \((\d+) registered keys", text)
    assert m, f"latest sweep {reports[-1].name} is not clean: {text[:200]}"
    assert int(m.group(1)) == len(load_all()), (
        f"registry has {len(load_all())} keys but {reports[-1].name} swept "
        f"{m.group(1)} — re-run tools/plan_lint.py and commit the report"
    )
