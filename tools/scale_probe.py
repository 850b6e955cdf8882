"""Scale probe: measured scaling behavior across sf0.001 → 0.01 → 0.1.

"Measure, don't guess": for each probed key, run the declared query at
all three shipped scale factors (same session, warmed) and report the
wall-clock plus the 0.01→0.1 growth ratio.  Data grows 10× per step —
a scale-safe plan should grow wall-clock well UNDER 10× at these sizes
(fixed job-submission cost amortizes; partial aggregation collapses
early), and must never grow super-linearly.

``--x10`` additionally materializes a SYNTHETIC 10×-sf0.1 slice
(events: 10 id/user-offset copies so per-user sequence lengths stay
realistic and the user universe grows 10×; documents: 10 tag-suffixed
copies so the chunk universe grows instead of collapsing into exact
dups) and probes the event/behavioral keys one decade beyond the
shipped corpus — the evidence that the one-exchange-per-operator claim
holds at larger n, not just at sf0.1.

Usage: python tools/scale_probe.py [--x10] [keys...]   (writes stdout;
redirect to reports/scale_probe_rN.txt to commit evidence)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raster2points_spark.registry import load_all
from raster2points_spark.session import get_spark

SFS = [
    ("sf0.001", "/root/testdata/sf0.001"),
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
]

# heavy / representative keys where super-linear growth would show
DEFAULT_KEYS = [
    "agg_groupby",
    "join_broadcast_star",
    "tpch_q3",
    "sessionize_batch",
    "rle_events",
    "dedup_exact",
    "dedup_near",
    "dedup_jaccard",
    "dedup_chunks",
    "text_tfidf",
    "text_unigram_ppl",
    "sim_knn",
    "pack_sequences",
    "reshape_unpivot",
    "anomaly_mad",
    # r6 late additions — the new iterative loops and candidate-driven
    # text kernels
    "tpch_q21",
    "text_bigram_ppl",
    "dedup_containment",
    "ml_kmeans_lloyd",
    "graph_shortest_hops",
    "ts_seasonal_decompose",
    # r6 continuation — chunk-df boilerplate (candidate-count-driven),
    # the widest new TPC-H joins, the k-ring NN and the DQ firewall
    "text_boilerplate",
    "spatial_nearest",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q19",
    "shuffle_shards",
    "dq_expectations",
    "ts_interpolate_linear",
    "win_range_frame",
]


# event-stream / behavioral keys probed at the synthetic 10×-sf0.1
# decade (plus the span-dedup key over the 10× document corpus)
X10_KEYS = [
    "sessionize_batch",
    "cohort_retention",
    "funnel_batch",
    "seq_transitions",
    "seq_markov",
    "rle_events",
    "anomaly_mad",
    "concurrency_peak",
    "attribution_first_touch",
    "funnel_latency",
    "audience_overlap",
    "dedup_chunks",
    # r6 continuation: chunk-df boilerplate over the 10x doc corpus,
    # the two-sided Arrow cogroup over the 10x event decade
    "text_boilerplate",
    "udf_cogrouped_map",
    # this-session additions over the 10x event/doc decades
    "cdc_net_changes",
    "hierarchy_rollup",
    "agg_kmv_set_ops",
    "agg_count_min_sketch",
    "stat_bootstrap_se",
    "ml_naive_bayes",
    "text_bm25",
    "text_phrase_near",
    "privacy_erasure_cascade",
]


def build_x10(src_dir: str) -> str:
    """Materialize the synthetic 10×-sf0.1 slice, cached on source
    mtime+size (same invalidation contract as the stream-slice and
    join_dpp caches)."""
    import hashlib

    import duckdb

    ev = os.path.join(src_dir, "events.parquet")
    st = os.stat(ev)
    digest = hashlib.md5(
        f"{os.path.abspath(ev)}:{st.st_mtime}:{st.st_size}:x10v1".encode()
    ).hexdigest()[:10]
    out = os.path.join("/tmp", f"r2p_x10_{digest}")
    if os.path.isdir(out):
        return out
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    con = duckdb.connect()
    # id/user offsets keep per-user sequence lengths identical while the
    # user universe grows 10× — the behavioral family's natural scale axis
    con.execute(
        f"""
        COPY (
          SELECT event_id + k.k * 10000000 AS event_id, ts,
                 user_id + k.k * 1000000 AS user_id, event_type, value, props
          FROM read_parquet('{ev}')
          CROSS JOIN (SELECT unnest(range(0, 10)) AS k) k
        ) TO '{tmp}/events.parquet' (FORMAT parquet)
        """
    )
    # tag-suffix the copies: the chunk/text universe grows ~10× instead of
    # collapsing into exact duplicates (which would change the workload)
    doc = os.path.join(src_dir, "documents.parquet")
    con.execute(
        f"""
        COPY (
          SELECT doc_id + k.k * 1000000 AS doc_id,
                 text || ' copytag' || cast(k.k AS varchar) AS text,
                 lang, source,
                 cast(length(text || ' copytag' || cast(k.k AS varchar)) AS bigint)
                   AS n_chars
          FROM read_parquet('{doc}')
          CROSS JOIN (SELECT unnest(range(0, 10)) AS k) k
        ) TO '{tmp}/documents.parquet' (FORMAT parquet)
        """
    )
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> int:
    args = sys.argv[1:]
    x10 = "--x10" in args
    args = [a for a in args if a != "--x10"]
    keys = args or DEFAULT_KEYS
    spark = get_spark("scale_probe")
    reg = load_all()
    # warm the session (JVM, codegen, FS caches) so sf0.001 numbers
    # aren't dominated by cold-start
    reg["scan_parquet"].fn(spark, SFS[0][1]).count()
    print(f"{'key':22s} {'sf0.001':>9s} {'sf0.01':>9s} {'sf0.1':>9s} {'x(0.01->0.1)':>13s}")
    worst = 0.0
    for key in keys:
        times = []
        for _, sf_dir in SFS:
            t0 = time.time()
            df = reg[key].fn(spark, sf_dir)
            df.count()
            times.append(time.time() - t0)
        ratio = times[2] / max(times[1], 1e-9)
        worst = max(worst, ratio)
        print(
            f"{key:22s} {times[0]:8.2f}s {times[1]:8.2f}s {times[2]:8.2f}s {ratio:12.1f}x"
        )
    print(
        f"\n10x data per step; worst 0.01->0.1 growth {worst:.1f}x "
        f"({'SUB-linear everywhere' if worst < 10 else 'SUPER-LINEAR KEY PRESENT'})"
    )
    if not x10:
        return 0 if worst < 10 else 1

    x10_dir = build_x10(SFS[2][1])
    print(f"\n--x10: synthetic 10x-sf0.1 slice at {x10_dir}")
    print(f"{'key':22s} {'sf0.1':>9s} {'x10':>9s} {'x(0.1->x10)':>12s}")
    worst10 = 0.0
    for key in X10_KEYS:
        times = []
        for sf_dir in (SFS[2][1], x10_dir):
            t0 = time.time()
            reg[key].fn(spark, sf_dir).count()
            times.append(time.time() - t0)
        ratio = times[1] / max(times[0], 1e-9)
        worst10 = max(worst10, ratio)
        print(f"{key:22s} {times[0]:8.2f}s {times[1]:8.2f}s {ratio:11.1f}x")
    print(
        f"\nworst 0.1->x10 growth {worst10:.1f}x "
        f"({'SUB-linear everywhere' if worst10 < 10 else 'SUPER-LINEAR KEY PRESENT'})"
    )
    return 0 if worst < 10 and worst10 < 10 else 1


if __name__ == "__main__":
    raise SystemExit(main())
