"""Plan linter: mechanical 100-TB-hygiene audit over EVERY registry key.

Builds each declared query's physical plan at sf0.001 and flags the
anti-scale patterns that individual plan pins can miss when new
operators land:

- ``CartesianProduct``          — all-pairs blowup (only the explicit
                                  cross-join surface key may do this)
- ``BroadcastNestedLoopJoin``   — only acceptable against provably
                                  constant-size sides (probe sets,
                                  1-row counts, literal ranges)
- ``BatchEvalPython``           — row-at-a-time Python in the hot path
                                  (only the deliberate UDF surface
                                  keys)
- ``rangepartitioning``         — global sort; only layout sinks that
                                  MUST range-cluster may pay it
- ``SortAggregate``             — usually means a missing hash-able
                                  grouping expression

Keys with a justified exception are allowlisted HERE, next to the
reason, so every exception is reviewed text — a new operator that
trips a rule fails tests/test_plan_lint.py until it is either fixed
or justified below.

Usage: python tools/plan_lint.py [keys...]   (default: all keys)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raster2points_spark.plans import explain_formatted
from raster2points_spark.registry import load_all
from raster2points_spark.session import get_spark

SF = "/root/testdata/sf0.001"

# Streaming keys execute a replayed stream inside fn(); their batch
# result plans are scans of drained state, not the operator itself —
# lint the batch families only.
SKIP_PREFIXES = ("stream_",)

RULES: dict[str, dict[str, str]] = {
    # pattern -> {allowlisted key: reason}
    "CartesianProduct": {
        "join_cross": "the explicit cross-join surface key (tiny dims)",
    },
    "BroadcastNestedLoopJoin": {
        "join_cross": "tiny dim x dim cross product",
        "join_theta_range": "non-equi theta join vs a broadcast 25-row dim",
        "sim_knn": "probe set (5 rows) broadcast against the corpus scan",
        "sim_knn_label": "probe set broadcast",
        "sim_ivf": "sqrt(n)-entry codebook: 1-row count broadcast deriving k, plus the sqrt(k)-row coarse-rep broadcast",
        "text_heavy_hitters": "1-row corpus count broadcast",
        "text_unigram_ppl": "1-row corpus token total broadcast",
        "text_tfidf": "1-row corpus doc-count (nd) broadcast",
        "pipeline_train_ready": "mixture stage's per-source count relation (rows = |sources|)",
        "sample_mixture": "per-source count relation joined on TRUE (rows = |sources|)",
        "ts_gapfill": "1-row global min/max bounds broadcast",
        "bpe_train": "1-row argmax pair broadcast per iteration",
        "subq_scalar": "1-row scalar aggregate broadcast",
        "stat_ks_test": "1-row axis min/max broadcast deriving the "
        "deterministic prefix-sum bucket (r16 bucketed_prefix_sums)",
        "ml_auc_roc": "1-row axis min/max broadcast deriving the "
        "deterministic prefix-sum bucket (r16 bucketed_prefix_sums)",
        "sink_geotiff_lzw": "1-row written-file catalog row (codec "
        "id, crs) crossed onto the 32-row per-lat readback aggregate",
        "tile_stats": "1-row global stats broadcast",
        "profile_columns": "constant-width stats unpivot join",
        "text_contamination": "broadcast eval-set n-gram list (constant size)",
        "basket_rules": "1-row distinct-order count broadcast",
        "graph_triangle_count": "three 1-row scalar aggregates crossed "
        "into the single summary row",
        "text_bigram_ppl": "1-row vocabulary-size aggregate broadcast",
        "embed_pq": "two 1-row broadcasts (sorted codebook array, "
        "probe vector) folded in-row by encode/ADC (r15)",
        "ml_kmeans_lloyd": "k-row (8) centroid relation broadcast per "
        "assignment round",
        "embed_power_iteration": "1-row norm scalar broadcast per "
        "normalization round",
        "agg_benford_profile": "1-row digit-total aggregate broadcast",
        "agg_corr_matrix": "1-row column-means relation broadcast into "
        "the centered pass",
        "profile_drift_psi": "generated 10-bucket x 2-era constant "
        "grid crossed before the counts join",
        "ts_autocorr": "3-row lag-constant relation crossed into the "
        "bar stream before the equi lag-join",
        "sim_mips": "1-row max-norm scalar and 5-row probe set "
        "broadcast against the corpus scan",
        "sample_kcenter": "1-row newest-center and argmax broadcasts "
        "per greedy round",
        "sim_matryoshka_eval": "5-row probe set broadcast against the "
        "corpus scan (sim_knn spine)",
        "text_kn_smoothing": "1-row bigram-type total broadcast",
        "pipeline_quality_ensemble": "1-row vocabulary-size broadcast "
        "in the perplexity leg",
        "dq_expectations": "1-row n_checked scalar broadcast onto the "
        "two 1-row RI/uniqueness branches",
        "ml_decision_stump": "1-row axis min/max broadcast deriving "
        "the deterministic prefix-sum bucket (r16 bucketed_prefix_sums)",
        "concurrency_peak": "1-row axis min/max broadcast deriving "
        "the deterministic prefix-sum bucket (r16 bucketed_prefix_sums)",
        "agg_gini": "1-row axis min/max broadcast deriving the "
        "deterministic prefix-sum bucket (r16 bucketed_prefix_sums)",
        "ml_ndcg": "probe set (5 rows) broadcast against the corpus "
        "scan (sim_knn spine)",
        "profile_key_skew": "1-row totals (nt, nkeys, nmax) broadcast "
        "back onto the per-key counts",
        "sample_balanced": "1-row min-class-count quota broadcast onto "
        "the ranked classes",
        "tpch_q11": "1-row global value-threshold scalar broadcast "
        "onto the per-part aggregate",
        "tpch_q22": "1-row positive-balance average broadcast onto "
        "the eligible-customer scan",
        "agg_kmv_set_ops": "1-row merged min-k sketch broadcast onto "
        "the 1-row exact-counts aggregate",
        "dedup_semantic_cluster": "capacity-derived anchor codebook "
        "(k = max(8, n/250) rows) broadcast for cluster assignment, "
        "plus the 1-row count that derives k",
        "dedup_embed": "1-row corpus-count broadcast deriving the "
        "dynamic SRP band width (nbits)",
        "dedup_sorted_neighborhood": "1-row corpus-count broadcast "
        "deriving the dynamic block-prefix length (plen)",
        "shuffle_shards": "1-row corpus-count broadcast deriving the "
        "dynamic shard count (nshards)",
        "sample_stratified": "1-row corpus-count broadcast deriving "
        "the dynamic md5-prefix bucket width (pc)",
        "agg_exact_median_twopass": "1-row rank/bucket target and "
        "1-row n/k stats broadcast between the two passes",
        "ml_logreg_irls": "1-row beta and step relations broadcast "
        "between Newton steps (scalar-feedback loop)",
        "stat_bootstrap_se": "1-row full-corpus mean broadcast onto "
        "the 1-row replicate-stddev aggregate",
        "ml_naive_bayes": "|langs|-row totals and 1-row vocabulary "
        "size crossed into the scoring fan-out",
        "text_bm25": "1-row (nd, avgdl) corpus-stats broadcast into "
        "the per-doc scoring projection",
        "spatial_point_in_polygon": "5-row polygon edge table "
        "broadcast; the crossing predicate has no equi component by "
        "nature — points stream against the constant edge set",
        "dedup_near_recall": "1-row n_true aggregate broadcast onto "
        "the 1-row n_found aggregate",
        "sim_ivf_recall": "composes sim_knn + sim_ivf verbatim (their "
        "allowlisted probe-set/codebook broadcasts) plus the 1-row "
        "n_true aggregate broadcast onto the 1-row n_found aggregate",
    },
    "BatchEvalPython": {
        "udf_scalar_py": "THE deliberate row-Python surface key",
        "udtf_py": "Python UDTF surface key",
    },
    "rangepartitioning": {
        "sink_zorder": "repartitionByRange on zkey IS the clustering layout",
        "sink_sorted": "range layout for row-group min/max stats",
        # stat_ks_test / ml_auc_roc left this list late in r16: their
        # prefix-sum bucketing is now a deterministic min/max
        # interpolation (bucketed_prefix_sums) — hash exchange on the
        # bucket, no RangePartitioner (whose sampling job re-executed
        # the upstream aggregate once per run).
    },
    # "Window over SinglePartition" is a STRUCTURAL rule (tree walk,
    # not substring) — see global_window_hits() + GLOBAL_WINDOW_ALLOW.
    "SortAggregate (": {
        # Spark falls back from hash agg when a grouping or aggregate
        # expression is not hash-supported — usually a smell (missing
        # hashable key) but legitimate for inherently sort-based aggs.
        # The "(" suffix keeps the match on the operator node, not on
        # substring hits inside other node names.
        "profile_columns": "min/max over STRING columns buffer strings "
        "(not hash-agg mutable) — inherent to profiling text columns",
        "fn_collation": "grouping on a collated key is not hash-agg "
        "supported — the collation surface IS the operator",
        "join_bucketed": "any_value(STRING) falls back, but the input "
        "arrives sorted on the grouping key from the bucketed merge "
        "join — the sort-agg pays no extra sort",
        "sample_kcenter": "the global 1-row max_by argmax carries a "
        "(double, id) struct comparator (not hash-agg mutable); with "
        "no grouping keys the fallback sorts nothing",
    },
}


# A Window whose required child distribution is SinglePartition is a
# global sort bottleneck: at 100 TB every row funnels through ONE task.
# It is acceptable ONLY over a provably collapsed relation (a handful
# of groups/rows produced by an upstream aggregate) — allowlist those
# here with the collapsed-cardinality argument.
GLOBAL_WINDOW_ALLOW: dict[str, str] = {
    "agg_exact_median_twopass": "running-total window over the "
    "|value-buckets| histogram (pass 1 of the rank search), never "
    "the fact — the bucket count is fixed by the value domain",
    # agg_gini left this list late in r16: its exact rank now runs as
    # a bucketed_prefix_sums prefix count (tie permutation provably
    # cancels in the exact-bigint Σ(i·cents)).
    # ml_auc_roc left this list in r16: its cumulative-negatives sum
    # now runs as a range-partitioned prefix sum (stat_ks_test shape).
    # stat_ks_test left this list in r16: its ECDF now runs as a
    # range-partitioned prefix sum (per-partition windows + broadcast
    # offsets), no single-partition window remains in the plan.
    # ml_decision_stump left this list late in r16: its candidate-
    # threshold cumsum now runs as a bucketed_prefix_sums prefix sum.
    # concurrency_peak left this list late in r16: the |2*sessions|
    # boundary sweep now runs as a bucketed_prefix_sums prefix sum
    # (the boundary axis grows with the corpus).
    "skyline_pareto_front": "strict suffix-minimum window over the "
    "<=|sizes| per-size minima relation, never the part fact",
    "text_zipf_slope": "log-log rank window over the |vocab| token "
    "counts (one map-side-combined aggregate of the corpus).  NOT "
    "convertible to bucketed_prefix_sums: a Zipfian count axis puts "
    "~half the vocab at n=1, and any value-monotone bucketing keeps "
    "ties of one value in one bucket — the hot block stays one task. "
    "The scale swap is collapse-to-per-count + sequence() rank "
    "regeneration per block (documented in the docstring)",
    "sample_temperature": "largest-remainder allocation windows over "
    "the |sources| count relation — constant size at any corpus scale",
    "rfm_segments": "ntile quartiles over the |customers| RFM rollup; "
    "docstring documents the percentile-threshold bucketing swap at "
    "billions of entities",
    "pareto_customers": "cumulative-share frontier over the "
    "|customers| spend rollup; same documented caveat as rfm_segments",
}

_TREE_NODE = __import__("re").compile(r"^([: +-]*)([A-Za-z][\w]*)[^(]*\((\d+)\)\s*$")


def global_window_hits(plan: str) -> bool:
    """True iff a Window node's unary child chain reaches an Exchange
    whose arguments are SinglePartition (= global window)."""
    import re

    lines = plan.splitlines()
    # tree section: after "== Physical Plan ==" until the first blank
    try:
        start = next(i for i, ln in enumerate(lines) if ln.startswith("== Physical Plan"))
    except StopIteration:
        return False
    nodes: list[tuple[int, str, str]] = []  # (depth, name, id)
    for ln in lines[start + 1 :]:
        if not ln.strip():
            break
        m = _TREE_NODE.match(ln)
        if m:
            nodes.append((len(m.group(1)), m.group(2), m.group(3)))
    # detail blocks: "(N) Name" header, lines until blank
    details: dict[str, str] = {}
    cur = None
    for ln in lines:
        h = re.match(r"^\((\d+)\) ", ln)
        if h:
            cur = h.group(1)
            details[cur] = ln
        elif cur is not None:
            if not ln.strip():
                cur = None
            else:
                details[cur] += "\n" + ln
    PASS_THROUGH = {"Sort", "Project", "Filter", "Window", "WindowGroupLimit"}
    for i, (depth, name, _nid) in enumerate(nodes):
        if name != "Window":
            continue
        j = i + 1
        while j < len(nodes) and nodes[j][0] > depth:
            cdepth, cname, cid = nodes[j]
            if cname == "Exchange":
                if "SinglePartition" in details.get(cid, ""):
                    return True
                break
            if cname not in PASS_THROUGH:
                # input distribution satisfied without a new exchange
                # (or a binary node) — not this rule's shape
                break
            depth = cdepth  # follow the unary chain one level deeper
            j += 1
    return False


def lint(keys=None) -> list[tuple[str, str]]:
    spark = get_spark("plan_lint")
    reg = load_all()
    names = keys or [
        n for n in reg if not n.startswith(SKIP_PREFIXES)
    ]
    violations: list[tuple[str, str]] = []
    for name in names:
        try:
            plan = explain_formatted(reg[name].fn(spark, SF))
        except Exception as ex:  # pragma: no cover - lint must name the key
            violations.append((name, f"plan build failed: {ex}"))
            continue
        for pattern, allow in RULES.items():
            if pattern in plan and name not in allow:
                violations.append((name, pattern))
        if global_window_hits(plan) and name not in GLOBAL_WINDOW_ALLOW:
            violations.append((name, "Window over Exchange SinglePartition"))
    return violations


def main() -> int:
    keys = sys.argv[1:] or None
    violations = lint(keys)
    reg_n = len(load_all())
    checked = keys or "all-batch"
    if violations:
        for name, what in violations:
            print(f"VIOLATION {name}: {what}")
        print(f"{len(violations)} violations")
        return 1
    print(f"plan lint clean ({reg_n} registered keys; scope={checked})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
