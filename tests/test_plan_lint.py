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
]


def test_plan_lint_subset(spark):
    violations = lint(SUBSET)
    assert not violations, violations
