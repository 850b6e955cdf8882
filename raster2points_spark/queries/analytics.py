"""Analytics / time-series / data-profiling operators.

Beyond-reference keys ([N] in SURVEY §2): the table-stakes analytics a
warehouse user expects on top of the §2.5 aggregate core — OHLC
resampling, argmin/argmax selection, outlier filtering, histograms,
and column profiling.  The reference (wri/raster2points) has none of
these; they extend the north-star mandate like §2.9.

Scale notes per operator:
- ts_resample / agg_histogram: single hash-aggregate with map-side
  partial aggregation — the shuffle carries one row per (group,
  bucket), not per event.
- agg_argminmax: min_by/max_by are single-pass aggregates (each task
  keeps one candidate per group); no window sort, no self-join.
- outlier_zscore: per-group moments are a tiny aggregate joined back
  via broadcast — the classic two-pass z-score without ever sorting
  the fact table.
- profile_columns: ONE aggregate pass computes every column's stats
  simultaneously (not one scan per column), then a constant-width
  stack() unpivots driver-side widths, never data-side.

Determinism (SURVEY §7): floats rounded identically in both engines
before hashing; argmin/argmax carry a packed-bigint total-order
tiebreak; timestamps compared at whole-second granularity (R3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from raster2points_spark.io import local_df
from raster2points_spark.registry import register
from raster2points_spark.queries._util import (
    ORACLE_TSEC,
    bucketed_prefix_sums,
    t,
    unix_secs,
)

# Packed total-order tiebreak for argmin/argmax over events: epoch
# seconds (≈1.75e9) × 1e7 + event_id (< 1e7 at every shipped SF) stays
# far below 2^63.  A single bigint key keeps min_by/arg_min semantics
# identical across engines (no struct-vs-list ordering subtleties).
_PACK_SPARK = "tsec * 10000000 + event_id"
_PACK_DUCK = f"{ORACLE_TSEC.format(c='ts')} * 10000000 + event_id"


@register(
    "ts_resample",
    oracle=f"""
    SELECT event_type,
           cast(floor({ORACLE_TSEC.format(c='ts')} / 300) AS bigint) AS bar,
           round(arg_min(value, {_PACK_DUCK}), 4) AS open,
           round(arg_max(value, {_PACK_DUCK}), 4) AS close,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi,
           round(sum(value), 2) AS vol,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_resample(spark, sf_dir):
    """Downsample events into 5-minute OHLC bars per type — the
    time-series resample every monitoring/feature pipeline needs.

    open/close are min_by/max_by on a packed (tsec, event_id) bigint:
    a SINGLE-PASS aggregate (each task keeps one running candidate per
    group, merged at the reducer) — no window sort of the fact table,
    which is the difference between one shuffle of |bars| rows and a
    full sort of 100 TB.  Ties at the same second are broken by
    event_id, so the answer is total-ordered and engine-independent.
    """
    ev = t(spark, sf_dir, "events").withColumn("tsec", unix_secs(F.col("ts")))
    pack = F.expr(_PACK_SPARK)
    return (
        ev.groupBy(
            "event_type",
            F.floor(F.col("tsec") / 300).cast("bigint").alias("bar"),
        )
        .agg(
            F.round(F.min_by("value", pack), 4).alias("open"),
            F.round(F.max_by("value", pack), 4).alias("close"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
            F.round(F.sum("value"), 2).alias("vol"),
            F.count("*").alias("n"),
        )
    )


@register(
    "agg_argminmax",
    oracle="""
    SELECT l_returnflag,
           arg_max(l_orderkey * 10 + l_linenumber,
                   cast(round(l_extendedprice * 100) AS bigint) * 100000000
                     + l_orderkey * 10 + l_linenumber) AS priciest_line,
           arg_min(l_orderkey * 10 + l_linenumber,
                   cast(round(l_extendedprice * 100) AS bigint) * 100000000
                     + l_orderkey * 10 + l_linenumber) AS cheapest_line,
           round(max(l_extendedprice), 2) AS max_price,
           round(min(l_extendedprice), 2) AS min_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_argminmax(spark, sf_dir):
    """WHICH row holds the extreme, not just the extreme value —
    min_by/max_by (DuckDB arg_min/arg_max).  The ordering key packs
    price-in-cents with the (orderkey, linenumber) identity into one
    bigint so ties on price resolve identically everywhere: cents
    (≤1e7) × 1e8 + orderkey·10+linenumber (<1e8 at shipped SFs) < 2^63.
    Single-pass aggregate: each task carries ONE candidate per group —
    the 100 TB alternative to `ORDER BY price LIMIT 1` per group.
    """
    li = t(spark, sf_dir, "lineitem")
    line = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    key = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.lit(100000000)
        + line
    )
    return li.groupBy("l_returnflag").agg(
        F.max_by(line, key).alias("priciest_line"),
        F.min_by(line, key).alias("cheapest_line"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
    )


@register(
    "outlier_zscore",
    oracle="""
    WITH stats AS (
        SELECT event_type,
               avg(value) AS mu,
               stddev_samp(value) AS sigma,
               count(*) AS n_total
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           any_value(s.n_total) AS n_total,
           count(*) FILTER (WHERE abs((e.value - s.mu) / s.sigma) > 2.0) AS n_outliers,
           round(max(abs((e.value - s.mu) / s.sigma)), 4) AS max_abs_z
    FROM events e JOIN stats s USING (event_type)
    GROUP BY e.event_type
    """,
)
def outlier_zscore(spark, sf_dir):
    """Outlier detection for training-data filtering: two-pass
    z-score.  Pass 1 computes per-group moments (tiny aggregate);
    pass 2 joins them BACK to the fact table and counts |z| > 2.

    The stats side is |event_type| rows — broadcast it explicitly so
    the fact table never shuffles: at 100 TB this is a map-only pass
    over the events scan, twice.  (A window-function formulation would
    instead sort/shuffle the full fact table per group — never do
    that for global-per-group moments.)
    """
    ev = t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.count("*").alias("n_total"),
    )
    z = F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("n_total").alias("n_total"),
            F.count_if(z > 2.0).alias("n_outliers"),
            F.round(F.max(z), 4).alias("max_abs_z"),
        )
    )


# Fixed histogram bounds for l_extendedprice — constants, so the
# bucket function is pure arithmetic in both engines and the schema
# never depends on the data.
_HIST_LO, _HIST_HI, _HIST_NBKT = 900.0, 105000.0, 20
_HIST_W = (_HIST_HI - _HIST_LO) / _HIST_NBKT


@register(
    "agg_histogram",
    oracle=f"""
    SELECT least(greatest(cast(floor((l_extendedprice - {_HIST_LO}) / {_HIST_W}) AS bigint),
                          0), {_HIST_NBKT - 1}) AS bkt,
           count(*) AS n,
           round(min(l_extendedprice), 2) AS lo_seen,
           round(max(l_extendedprice), 2) AS hi_seen
    FROM lineitem
    GROUP BY 1
    """,
)
def agg_histogram(spark, sf_dir):
    """Fixed-width histogram (width_bucket with clamped edge buckets).
    Constant bounds ⇒ bucketing is a pure projection; the aggregate is
    one map-side-combined shuffle of ≤ n_buckets rows per task — the
    right way to histogram 100 TB (vs. sort-based or data-dependent
    bounds, which need an extra pass)."""
    li = t(spark, sf_dir, "lineitem")
    bkt = F.least(
        F.greatest(
            F.floor((F.col("l_extendedprice") - F.lit(_HIST_LO)) / F.lit(_HIST_W)).cast("bigint"),
            F.lit(0),
        ),
        F.lit(_HIST_NBKT - 1),
    )
    return (
        li.groupBy(bkt.alias("bkt"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo_seen"),
            F.round(F.max("l_extendedprice"), 2).alias("hi_seen"),
        )
    )


@register(
    "profile_columns",
    oracle="""
    SELECT 'l_orderkey' AS col, count(l_orderkey) AS n_filled,
           count(DISTINCT l_orderkey) AS n_distinct,
           cast(min(l_orderkey) AS varchar) AS min_str,
           cast(max(l_orderkey) AS varchar) AS max_str
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(l_returnflag), count(DISTINCT l_returnflag),
           min(l_returnflag), max(l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', count(l_shipdate), count(DISTINCT cast(l_shipdate AS date)),
           cast(min(cast(l_shipdate AS date)) AS varchar),
           cast(max(cast(l_shipdate AS date)) AS varchar)
    FROM lineitem
    UNION ALL
    SELECT 'l_linestatus', count(l_linestatus), count(DISTINCT l_linestatus),
           min(l_linestatus), max(l_linestatus)
    FROM lineitem
    """,
)
def profile_columns(spark, sf_dir):
    """Dataset profiling — per-column filled/distinct/min/max in ONE
    aggregate pass over the table (Deequ/TFDV-style).  All column
    stats are computed simultaneously in a single scan+aggregate, then
    unpivoted with a constant-width stack(): profiling 100 TB costs
    one pass, not one pass per column.  min/max stringified with
    engine-stable formats (ints, strings, ISO dates only)."""
    li = t(spark, sf_dir, "lineitem").withColumn(
        "ship_d", F.col("l_shipdate").cast("date")
    )
    prof = li.agg(
        F.count("l_orderkey").alias("f1"),
        F.countDistinct("l_orderkey").alias("d1"),
        F.min("l_orderkey").cast("string").alias("lo1"),
        F.max("l_orderkey").cast("string").alias("hi1"),
        F.count("l_returnflag").alias("f2"),
        F.countDistinct("l_returnflag").alias("d2"),
        F.min("l_returnflag").alias("lo2"),
        F.max("l_returnflag").alias("hi2"),
        F.count("l_shipdate").alias("f3"),
        F.countDistinct("ship_d").alias("d3"),
        F.min("ship_d").cast("string").alias("lo3"),
        F.max("ship_d").cast("string").alias("hi3"),
        F.count("l_linestatus").alias("f4"),
        F.countDistinct("l_linestatus").alias("d4"),
        F.min("l_linestatus").alias("lo4"),
        F.max("l_linestatus").alias("hi4"),
    )
    return prof.select(
        F.expr(
            "stack(4, "
            "'l_orderkey',   f1, d1, lo1, hi1, "
            "'l_returnflag', f2, d2, lo2, hi2, "
            "'l_shipdate',   f3, d3, lo3, hi3, "
            "'l_linestatus', f4, d4, lo4, hi4) "
            "AS (col, n_filled, n_distinct, min_str, max_str)"
        )
    )


@register(
    "graph_pagerank",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT l_orderkey AS src, l_partkey + 10000000 AS dst FROM lineitem
    ),
    nodes AS (
        SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges
    ),
    outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    r0 AS (SELECT id, cast(1000000000 AS bigint) AS r FROM nodes),
    c1 AS (
        SELECT e.dst AS id, sum(r0.r // o.d) AS c
        FROM edges e JOIN r0 ON r0.id = e.src JOIN outdeg o ON o.src = e.src
        GROUP BY e.dst
    ),
    r1 AS (
        SELECT n.id,
               150000000 + (17 * coalesce(c1.c, 0)) // 20 AS r
        FROM nodes n LEFT JOIN c1 ON c1.id = n.id
    ),
    c2 AS (
        SELECT e.dst AS id, sum(r1.r // o.d) AS c
        FROM edges e JOIN r1 ON r1.id = e.src JOIN outdeg o ON o.src = e.src
        GROUP BY e.dst
    ),
    r2 AS (
        SELECT n.id,
               150000000 + (17 * coalesce(c2.c, 0)) // 20 AS r
        FROM nodes n LEFT JOIN c2 ON c2.id = n.id
    )
    SELECT id, round(r / 1000000000.0, 6) AS rank_scaled
    FROM r2
    ORDER BY rank_scaled DESC, id
    LIMIT 100
    """,
)
def graph_pagerank(spark, sf_dir):
    """PageRank, 2 synchronous iterations (damping 0.85, naive sink
    handling) over the order→part bipartite graph — the iterative
    message-passing companion to connected_components: each round is
    one edges⋈ranks join + a partial-aggregated groupBy(dst), the
    textbook Pregel step as DataFrames.

    Scale shape: ranks and out-degrees co-shuffle on src; the
    node-count and per-round scalars are 1-row broadcasts; a real run
    adds localCheckpoint per round (see connected_components) and
    iterates to convergence — 2 rounds are unrolled here so the DuckDB
    oracle can state the exact fixpoint-prefix.

    Determinism (r7): the iteration is FIXED-POINT INTEGER arithmetic —
    ranks live in 1e-9 units of the scaled rank R = r·N (R₀ = 1.0 →
    10⁹), contributions are exact bigint floor-divisions R div d, and
    damping is (17·c) div 20 (= 0.85 exactly).  Float sum(r/d) is
    order-DEPENDENT: at sf0.1 one node's contribution sum straddled a
    6-dp rounding boundary between Spark's and DuckDB's summation
    orders (1.749063 vs 1.749062) — integer sums are associative, so
    the result is bit-identical in any engine, any partitioning, any
    scale.  Floor loses <1e-9 relative mass per term (invisible at the
    6-dp output); c is bounded by N·10⁹ so bigints hold to ~10⁸ nodes
    per component of total mass — document-scale safe.  Output is
    R/1e9 rounded at 6 dp (exact double: R < 2⁵³), top-100 with id
    tiebreak (R2)."""
    li = t(spark, sf_dir, "lineitem")
    # Loop invariants are persisted once: without this every branch
    # (nodes x2, outdeg, and BOTH per-round contrib joins) re-runs the
    # edge-dedup shuffle — at sf0.1 that alone was ~5 of the key's 6 s,
    # and at 100 TB it is the difference between one scan of the edge
    # list and seven.
    edges = (
        li.select(
            F.col("l_orderkey").alias("src"),
            (F.col("l_partkey") + 10000000).alias("dst"),
        )
        .distinct()
        .persist()
    )
    # nodes' distinct and edges_w's join already leave their caches
    # hash-partitioned on the per-round join keys (cached plans
    # compile without AQE, so the partitioning is preserved — no
    # repartition needed here, unlike graph_shortest_hops' UNION-
    # shaped edge cache whose partitioning is unknown)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("d"))
    # The edges⋈outdeg join is ALSO loop-invariant — hoist it so each
    # iteration pays exactly ONE join (ranks) + one partial-agg
    # groupBy, not two joins.  Pre-dividing by out-degree is the
    # standard "weighted edges" PageRank form.
    edges_w = edges.join(outdeg, "src").select("src", "dst", "d").persist()
    edges_w.count()  # one job to materialize the loop-invariant caches
    ranks = nodes.select("id", F.lit(1_000_000_000).cast("long").alias("r"))
    for _ in range(2):
        # exact bigint floor division + associative integer sum — see
        # the docstring's determinism note
        contrib = (
            edges_w.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.expr("r div d")).alias("c"))
        )
        ranks = nodes.join(contrib, "id", "left").select(
            "id",
            (
                F.lit(150_000_000).cast("long")
                + F.expr("(17 * coalesce(c, 0L)) div 20")
            ).alias("r"),
        )
        ranks = ranks.localCheckpoint(eager=False)
    return (
        ranks.select(
            "id", F.round(F.col("r") / F.lit(1_000_000_000.0), 6).alias("rank_scaled")
        )
        .orderBy(F.col("rank_scaled").desc(), "id")
        .limit(100)
    )


@register(
    "agg_corr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 5) AS corr_qty_price,
           round(corr(l_extendedprice, l_discount), 5) AS corr_price_disc,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr(spark, sf_dir):
    """Pairwise Pearson correlation / sample covariance per group —
    the feature-correlation screen run before model training.

    corr/covar_samp are single-pass moment aggregates (sum, sum^2,
    cross-sum) with map-side partial combine: the shuffle carries one
    moment tuple per (group, partition), never the rows.  Rounded to
    5 dp in both engines (R1: last-bit float divergence).
    """
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 5).alias("corr_qty_price"),
        F.round(F.corr("l_extendedprice", "l_discount"), 5).alias("corr_price_disc"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qty_price"),
        F.count("*").alias("n"),
    )


@register(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 5) AS r2,
           cast(regr_count(l_extendedprice, l_quantity) AS bigint) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_regression(spark, sf_dir):
    """Per-group ordinary-least-squares fit (price ~ quantity) via the
    SQL-standard regr_* aggregates — trend estimation without leaving
    the JVM.

    Same scale shape as agg_corr: one hash aggregate, moment tuples
    only on the wire.  Spark and DuckDB both implement the SQL:2003
    regr_* family, so the oracle is a literal twin.
    """
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 5).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").cast("bigint").alias("n"),
    )


@register(
    "agg_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT user_id, sum(n) AS tot FROM c GROUP BY 1
    )
    SELECT c.user_id, cast(tot.tot AS bigint) AS n_events,
           round(-sum((c.n / tot.tot) * ln(c.n / tot.tot)), 4) AS entropy
    FROM c JOIN tot ON c.user_id = tot.user_id
    GROUP BY c.user_id, tot.tot
    """,
)
def agg_entropy(spark, sf_dir):
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity / bot-detection feature (entropy ~0 = single
    repeated action, ~ln(5) = uniform over the 5 types).

    The event stream collapses to |users|x|types| count rows in ONE
    map-side-combined aggregate; everything after (totals, p·ln p,
    entropy) runs over that tiny relation, so the wire cost is
    independent of event volume.
    """
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    tot = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    return (
        c.join(tot, "user_id")
        .groupBy("user_id", "tot")
        .agg(F.round(-F.sum(p * F.log(p)), 4).alias("entropy"))
        .select(
            "user_id", F.col("tot").cast("bigint").alias("n_events"), "entropy"
        )
    )


@register(
    "rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT c_custkey,
             cast(max(epoch(o_orderdate)) AS bigint) AS last_order_sec,
             count(*) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    SELECT c_custkey, last_order_sec, frequency, monetary,
           ntile(4) OVER (ORDER BY last_order_sec DESC, c_custkey) AS r_quartile,
           ntile(4) OVER (ORDER BY frequency DESC, c_custkey) AS f_quartile,
           ntile(4) OVER (ORDER BY monetary DESC, c_custkey) AS m_quartile
    FROM rfm
    """,
)
def rfm_segments(spark, sf_dir):
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic warehouse composite: per-customer order rollup, then
    quartile bucketing on each axis.

    The rollup collapses orders to |customers| rows map-side before
    the one shuffle; the ntile windows then run over the aggregate,
    never the order stream.  Caveat for extreme entity counts: an
    unpartitioned ntile funnels the aggregate through one task — at
    billions of customers switch to percentile-threshold bucketing
    (compute the 3 quartile boundaries with percentile(), bucket by
    comparison broadcast — approximate at ties but fully distributed).
    Deterministic quartiles via the (metric, c_custkey) tiebreak (R2).
    """
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    rfm = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey")
        .agg(
            unix_secs(F.max("o_orderdate")).alias("last_order_sec"),
            F.count("*").alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
    )
    from pyspark.sql import Window

    return rfm.select(
        "c_custkey",
        "last_order_sec",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy(F.col("last_order_sec").desc(), "c_custkey"))
        .alias("r_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), "c_custkey"))
        .alias("f_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary").desc(), "c_custkey"))
        .alias("m_quartile"),
    )


@register(
    "ts_pct_change",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             cast(floor({ORACLE_TSEC.format(c='ts')} / 86400) AS bigint) AS day,
             round(sum(value), 2) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, total,
           round((total - lag(total) OVER w)
                 / nullif(lag(total) OVER w, 0) * 100, 3) AS pct_change
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def ts_pct_change(spark, sf_dir):
    """Period-over-period percent change of the daily value series per
    event type — the BI staple (DoD/WoW growth).

    The stream collapses to |types|x|days| rows in one map-side-
    combined aggregate; the lag window runs over that tiny rollup
    (partitioned by type — never an unpartitioned global sort).  First
    day per type yields NULL, identically in both engines; a prior day
    totalling exactly 0 would be NULL-in-Spark vs Inf-in-DuckDB, so the
    denominator is nullif-guarded symmetrically.
    """
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(unix_secs(F.col("ts")) / 86400).cast("bigint").alias("day"),
    ).agg(F.round(F.sum("value"), 2).alias("total"))
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("total").over(w)
    return daily.select(
        "event_type",
        "day",
        "total",
        F.round((F.col("total") - prev) / F.nullif(prev, F.lit(0.0)) * 100, 3).alias(
            "pct_change"
        ),
    )


@register(
    "pareto_customers",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT o_custkey, spend,
             sum(spend) OVER (ORDER BY spend DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum_spend,
             sum(spend) OVER () AS total,
             row_number() OVER (ORDER BY spend DESC, o_custkey) AS rnk
      FROM spend
    )
    SELECT o_custkey, spend, rnk,
           round(cum_spend / total, 6) AS cum_share
    FROM ranked
    WHERE cum_spend / total <= 0.5
    """,
)
def pareto_customers(spark, sf_dir):
    """Pareto / revenue-concentration analysis: the smallest customer
    set covering the top 50% of revenue, with each member's cumulative
    share — the 80/20 report behind every account-tiering decision.

    Orders collapse to |customers| spend rows map-side FIRST; the
    global ranking windows then run over that per-entity aggregate
    (same caveat as rfm_segments: at extreme entity counts switch to
    a percentile-threshold cut).  Tiebreak (spend DESC, custkey)
    total-orders the frontier (R2).
    """
    from pyspark.sql import Window

    spend = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    )
    w_ord = Window.orderBy(F.col("spend").desc(), "o_custkey")
    ranked = spend.select(
        "o_custkey",
        "spend",
        F.sum("spend").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_spend"),
        F.sum("spend").over(Window.partitionBy()).alias("total"),
        F.row_number().over(w_ord).alias("rnk"),
    )
    return ranked.filter(F.col("cum_spend") / F.col("total") <= 0.5).select(
        "o_custkey",
        "spend",
        "rnk",
        F.round(F.col("cum_spend") / F.col("total"), 6).alias("cum_share"),
    )


@register(
    "ts_spike_detect",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             cast(floor({ORACLE_TSEC.format(c='ts')} / 300) AS bigint) AS bucket,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sigma
      FROM b GROUP BY 1
    )
    SELECT b.event_type, b.bucket, b.n,
           round((b.n - s.mu) / s.sigma, 3) AS z
    FROM b JOIN stats s ON b.event_type = s.event_type
    WHERE (b.n - s.mu) / s.sigma > 3
    """,
)
def ts_spike_detect(spark, sf_dir):
    """Traffic-spike detection: 5-minute event-rate buckets per type,
    flagged where the bucket count exceeds its series mean by 3σ — the
    per-SERIES burst monitor (vs per-row anomaly_mad and per-entity
    win_rolling_z).

    The stream collapses to |types|×|buckets| counts in one map-side-
    combined aggregate; series stats are a second tiny aggregate
    broadcast back.  Everything after the first rollup is
    volume-independent.
    """
    ev = t(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type",
        F.floor(unix_secs(F.col("ts")) / 300).cast("bigint").alias("bucket"),
    ).agg(F.count("*").alias("n"))
    stats = b.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        b.join(F.broadcast(stats), "event_type")
        .filter(z > 3)
        .select("event_type", "bucket", "n", F.round(z, 3).alias("z"))
    )


@register(
    "graph_triangle_count",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 3
    ), deg AS (
      SELECT node, count(*) AS d
      FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
      GROUP BY 1
    ), tri AS (
      SELECT count(*) AS nt
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.v
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT (SELECT count(*) FROM edges) AS n_edges,
           (SELECT cast(sum(d * (d - 1) / 2) AS bigint) FROM deg) AS n_wedges,
           (SELECT cast(nt AS bigint) FROM tri) AS n_triangles,
           round(3.0 * (SELECT nt FROM tri)
                 / (SELECT sum(d * (d - 1) / 2) FROM deg), 6) AS clustering
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Triangle counting + global clustering coefficient over the
    co-purchase graph (parts sharing >=3 orders) — the graph-quality
    metric behind community detection and link-spam scoring.

    Scale shape: the Spark plan uses DEGREE ORIENTATION — each
    undirected edge is directed from its lower-(degree, id) endpoint
    to the higher, so every out-neighborhood is bounded by O(sqrt(m))
    and the wedge self-join generates sum(outdeg^2) = O(m^1.5)
    candidates instead of sum(deg^2), which a single hub would blow
    up quadratically.  The oracle states the naive a<b<c three-way
    join — same exact count, proving orientation changes the plan,
    not the answer.  Edge building inherits basket_pairs' per-order
    bound; all three relations shuffle on their join keys only.
    """
    li = t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
        .select("u", "v")
        .persist()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    e = edges.join(
        deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u"
    ).join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    dire = e.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    )
    x, y = dire.alias("x"), dire.alias("y")
    wedges = x.join(
        y,
        (F.col("x.src") == F.col("y.src"))
        & (
            (F.col("x.ddst") < F.col("y.ddst"))
            | ((F.col("x.ddst") == F.col("y.ddst")) & (F.col("x.dst") < F.col("y.dst")))
        ),
    ).select(F.col("x.dst").alias("wa"), F.col("y.dst").alias("wb"))
    closing = dire.select(F.col("src").alias("wa"), F.col("dst").alias("wb"))
    n_tri = wedges.join(closing, ["wa", "wb"]).agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    n_wedges = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges")
    )
    return (
        n_edges.crossJoin(F.broadcast(n_wedges))
        .crossJoin(F.broadcast(n_tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            # try_divide: a wedge-free graph (all degrees 1 — happens at
            # sf0.1 where only 2 co-purchase edges clear the >=3-order
            # bar) must yield NULL like the DuckDB oracle's float x/0,
            # not an ANSI DIVIDE_BY_ZERO.
            F.round(
                F.try_divide(3.0 * F.col("n_triangles"), F.col("n_wedges")), 6
            ).alias("clustering"),
        )
    )


@register(
    "ts_ewma",
    oracle=f"""
    WITH hr AS (
      SELECT event_type,
             cast(floor({ORACLE_TSEC.format(c='ts')} / 3600) AS bigint) AS h,
             sum(value) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type, a.h,
           round(sum(b.v * pow(0.5, a.h - b.h)) / sum(pow(0.5, a.h - b.h)), 4)
             AS ewma
    FROM hr a
    JOIN hr b ON a.event_type = b.event_type AND b.h BETWEEN a.h - 23 AND a.h
    GROUP BY 1, 2
    """,
)
def ts_ewma(spark, sf_dir):
    """Exponentially-weighted moving average over the hourly series per
    event type — the smoother behind every monitoring dashboard.
    Half-life = 1 hour (decay base 0.5), truncated at 24 hours of
    lookback; weights are measured in HOUR DISTANCE, not row offset,
    so gaps in the series decay correctly (a RANGE frame, not ROWS).

    Spark shape: collect the trailing 24-hour (h, v) pairs with ONE
    range-frame window over the |hours|-per-type relation (already
    aggregated — the event table itself is reduced by a map-side
    combine first, so the window sorts bars, not events), then the
    weighted sum is an IN-ROW `aggregate()` fold referencing the outer
    row's hour — no self-join, no second shuffle.  The oracle states
    the equivalent bounded self-join.  Decay base 0.5 makes every
    weight an exact power of two, so pow() is bitwise identical across
    engines (no libm ulp skew); the 4-dp round absorbs summation-order
    differences in the dot product.

    Scale: the window runs over |types|×|hours| rows — independent of
    event count; state per row is ≤24 structs.
    """
    ev = t(spark, sf_dir, "events")
    hr = ev.groupBy(
        "event_type",
        F.floor(unix_secs(F.col("ts")) / 3600).cast("bigint").alias("h"),
    ).agg(F.sum("value").alias("v"))
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("h").rangeBetween(-23, 0)
    tail24 = hr.withColumn("trail", F.collect_list(F.struct("h", "v")).over(w))
    num = F.aggregate(
        F.col("trail"),
        F.lit(0.0),
        lambda acc, x: acc + x["v"] * F.pow(F.lit(0.5), F.col("h") - x["h"]),
    )
    den = F.aggregate(
        F.col("trail"),
        F.lit(0.0),
        lambda acc, x: acc + F.pow(F.lit(0.5), F.col("h") - x["h"]),
    )
    return tail24.select(
        "event_type", "h", F.round(num / den, 4).alias("ewma")
    )


@register(
    "graph_shortest_hops",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT l_orderkey AS src, l_partkey + 10000000 AS dst
      FROM lineitem GROUP BY 1, 2
      UNION ALL
      SELECT l_partkey + 10000000 AS src, l_orderkey AS dst
      FROM lineitem GROUP BY 1, 2
    ),
    seed AS (SELECT min(l_orderkey) AS s FROM lineitem),
    walk(id, hops) AS (
      SELECT s, 0 FROM seed
      UNION
      SELECT e.dst, w.hops + 1
      FROM walk w JOIN edges e ON e.src = w.id
      WHERE w.hops < 4
    )
    SELECT id, min(hops) AS hops FROM walk GROUP BY id
    """,
)
def graph_shortest_hops(spark, sf_dir):
    """Single-source BFS (shortest hop distance, depth ≤ 4) over the
    undirected order↔part bipartite graph — the reachability twin of
    graph_pagerank's message passing and the shape behind "within N
    degrees" graph queries.

    Spark shape: classic frontier BFS as DataFrames — per round ONE
    frontier⋈edges join, then a LEFT ANTI against the LAST TWO levels
    so each node expands exactly once (the oracle's recursive CTE
    instead dedups (id, hops) pairs per level and takes min(hops) at
    the end — same answer, but the anti-join form is what scales:
    work is O(edges touched), never O(paths)).  Two levels suffice in
    ANY graph (r16, guide §2.3 "shuffle fewer bytes"): a neighbor of
    a distance-h node has distance >= h-1 by the triangle inequality
    (if u at distance <= h-2 were adjacent to w in the frontier, then
    dist(w) <= h-1 and w would not be in level h), so the candidate
    set can only intersect levels h-1 and h — anti-joining the full
    accumulated visited set shuffles O(|reachable|) per round for the
    same result; the last-two form shuffles O(|frontier|).  LAZY
    localCheckpoint truncates the per-round lineage (fixed 4-round
    loop, no driver action in the loop, so every level materializes
    inside the final job — unlike dedup_components, whose convergence
    check forces eager); the edge list is persisted once and reused
    all rounds.  The seed is a 1-row min aggregate kept declarative
    (no driver collect anywhere in the key).

    At 100 TB: each round shuffles frontier-sized relations keyed by
    node id; with the two-level anti-join nothing in the loop grows
    with the accumulated traversal — for deeper traversals you'd
    switch to the label-propagation form (dedup_components) that
    keeps everything keyed and never holds a frontier on the driver.
    Nothing here does — both frontier and visited stay distributed.
    """
    li = t(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.col("l_orderkey").alias("src"),
        (F.col("l_partkey") + 10000000).alias("dst"),
    ).distinct()
    # cache the edge list PRE-PARTITIONED on the join key: the cached
    # partitioning satisfies every round's join requirement, so each
    # round shuffles only the frontier — the old unpartitioned cache
    # re-exchanged the full edge list all four rounds (guide §2.4:
    # operations keyed the same way share one exchange)
    edges = (
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition("src")
        .persist()
    )
    # The BFS source (smallest order node) IS a 1-row aggregate — keep
    # it declarative instead of collecting a literal to the driver
    # (r8; was the last removable driver action in query code).
    seed = (
        li.agg(F.min("l_orderkey").cast("long").alias("id"))
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=False)
    )
    # the anti-join right side is the union of the LAST TWO levels
    # only (see docstring: candidates are at distance >= h-1 in any
    # graph), so the per-round shuffle stays frontier-sized instead
    # of re-shuffling the whole accumulated visited set every round
    levels = [seed]
    prev = seed.select("id").limit(0)  # level -1: empty
    frontier = seed.select("id")
    for h in range(1, 5):
        nxt = (
            frontier.join(edges, frontier.id == edges.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(prev.union(frontier), "id", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint(eager=False)
        )
        levels.append(nxt)
        prev = frontier
        frontier = nxt.select("id")
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


@register(
    "ts_seasonal_decompose",
    oracle=f"""
    WITH hr AS (
      SELECT event_type,
             cast(floor({ORACLE_TSEC.format(c='ts')} / 3600) AS bigint) AS h,
             sum(cast(round(value * 1000) AS bigint)) AS vm
      FROM events GROUP BY 1, 2
    ),
    tr AS (
      SELECT event_type, h, vm,
             CASE WHEN count(vm) OVER w = 25 THEN sum(vm) OVER w END AS s25
      FROM hr
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    seas AS (
      SELECT event_type, h % 24 AS hod,
             sum(25 * vm - s25) AS det_sum, count(*) AS n_m
      FROM tr WHERE s25 IS NOT NULL GROUP BY 1, 2
    )
    SELECT t.event_type, t.h,
           -- divisors cast to DOUBLE: DuckDB types 1000.0 as DECIMAL and
           -- would divide exactly, rounding differently from Spark's
           -- binary doubles at 4-dp midpoints
           round(t.vm / CAST(1000.0 AS DOUBLE), 4) AS v,
           round(t.s25 / CAST(25000.0 AS DOUBLE), 4) AS trend,
           round(s.det_sum / (CAST(25000.0 AS DOUBLE) * s.n_m), 4) AS seasonal,
           -- resid from the ROUNDED terms: a difference of 4-dp
           -- decimals is itself a 4-dp decimal, so the outer round can
           -- never sit on a midpoint (the unrounded rational CAN — it
           -- flipped engines at e.g. -177.39475)
           round(round(t.vm / CAST(1000.0 AS DOUBLE), 4)
                 - round(t.s25 / CAST(25000.0 AS DOUBLE), 4)
                 - round(s.det_sum / (CAST(25000.0 AS DOUBLE) * s.n_m), 4), 4)
             AS resid
    FROM tr t JOIN seas s ON s.event_type = t.event_type AND s.hod = t.h % 24
    WHERE t.s25 IS NOT NULL
    """,
)
def ts_seasonal_decompose(spark, sf_dir):
    """Classical additive seasonal decomposition of the hourly series
    per event type: trend = centered 25-hour moving average (RANGE
    frame on hour distance, complete-window gate — edges and gappy
    stretches yield no trend, matching textbook STL edge handling),
    seasonal = mean detrended value per hour-of-day, residual = the
    rest.  The anomaly-detection preprocessing step every monitoring
    pipeline runs before thresholding.

    Scale shape: events collapse map-side to |types|×|hours| bars
    FIRST; the trend window sorts bars (not events), the seasonal
    profile is a 24×|types|-row aggregate joined back UNHINTED (AQE
    broadcasts it while small).  Two key-shuffles total, both over
    pre-aggregated relations.

    Determinism: every aggregate runs in INTEGER milli-units —
    hourly bars, the 25-bar trend sum, and the scaled detrended sum
    25·v−S₂₅ are exact bigints in any summation order, so
    trend/seasonal/resid are single exact-integer divisions producing
    BITWISE-identical doubles in both engines before the 4-dp round.
    (The first cut averaged doubles: a seasonal mean landed within
    1e-12 of a 0.00005 rounding midpoint and the engines rounded to
    opposite sides — order-dependent float aggregation can defeat
    round-both-sides whenever a true value sits on a boundary.)
    """
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    hr = ev.groupBy(
        "event_type",
        F.floor(unix_secs(F.col("ts")) / 3600).cast("bigint").alias("h"),
    ).agg(F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("vm"))
    w = Window.partitionBy("event_type").orderBy("h").rangeBetween(-12, 12)
    tr = hr.withColumn(
        "s25",
        F.when(F.count("vm").over(w) == 25, F.sum("vm").over(w)),
    ).filter(F.col("s25").isNotNull())
    seas = tr.groupBy(
        F.col("event_type").alias("s_type"), (F.col("h") % 24).alias("hod")
    ).agg(
        F.sum(25 * F.col("vm") - F.col("s25")).alias("det_sum"),
        F.count("*").alias("n_m"),
    )
    seasonal = F.col("det_sum") / (25000.0 * F.col("n_m"))
    return (
        tr.join(
            seas,
            (F.col("event_type") == F.col("s_type"))
            & (F.col("hod") == F.col("h") % 24),
        )
        .select(
            "event_type",
            "h",
            F.round(F.col("vm") / 1000.0, 4).alias("v"),
            F.round(F.col("s25") / 25000.0, 4).alias("trend"),
            F.round(seasonal, 4).alias("seasonal"),
            F.round(
                F.round(F.col("vm") / 1000.0, 4)
                - F.round(F.col("s25") / 25000.0, 4)
                - F.round(seasonal, 4),
                4,
            ).alias("resid"),
        )
    )


@register(
    "agg_benford_profile",
    oracle="""
    WITH digits AS (
      SELECT cast(substr(cast(cast(floor(o_totalprice) AS bigint) AS varchar), 1, 1)
                  AS int) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (SELECT d, count(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT sum(n) AS total FROM obs)
    SELECT d,
           n,
           round(n * 1.0 / total, 6) AS p_obs,
           round(log10(1.0 + 1.0 / d), 6) AS p_benford,
           round((n * 1.0 / total - log10(1.0 + 1.0 / d))
                 * (n * 1.0 / total - log10(1.0 + 1.0 / d)) * total
                 / log10(1.0 + 1.0 / d), 6) AS chi2_term
    FROM obs CROSS JOIN tot
    """,
)
def agg_benford_profile(spark, sf_dir):
    """Benford's-law first-digit profile over order totals — the
    fraud/data-quality screen: natural multiplicative amounts follow
    P(d) = log10(1 + 1/d), and a fabricated or truncated column jumps
    out as an inflated chi-square term on one digit.

    First digit via integer-truncate → string head (no float
    formatting in the comparison path); the profile is ONE map-side-
    combined 9-group aggregate plus a 1-row total crossJoined back
    (constant-size broadcast) — runs in a single pass at any corpus
    scale.  Expected probabilities and chi-square contributions are
    computed identically in both engines and rounded at 6 dp.
    """
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    # floor() before the bigint cast: DuckDB's double→bigint cast ROUNDS
    # while Spark's truncates (the fn_cast header trap) — floor makes
    # both engines truncate.
    obs = o.groupBy(
        F.substring(F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1)
        .cast("int")
        .alias("d")
    ).agg(F.count("*").alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    p_obs = F.col("n") * 1.0 / F.col("total")
    p_ben = F.log10(1.0 + 1.0 / F.col("d"))
    return obs.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        F.round(p_obs, 6).alias("p_obs"),
        F.round(p_ben, 6).alias("p_benford"),
        F.round((p_obs - p_ben) * (p_obs - p_ben) * F.col("total") / p_ben, 6).alias(
            "chi2_term"
        ),
    )


@register(
    "ts_autocorr",
    oracle=f"""
    WITH hr AS (
      SELECT event_type,
             cast(floor({ORACLE_TSEC.format(c='ts')} / 3600) AS bigint) AS h,
             sum(cast(round(value * 1000) AS bigint)) AS vm
      FROM events GROUP BY 1, 2
    ),
    lags AS (SELECT unnest(generate_series(1, 3)) AS k),
    pairs AS (
      SELECT a.event_type, l.k, a.vm AS x, b.vm AS y
      FROM hr a
      CROSS JOIN lags l
      JOIN hr b ON b.event_type = a.event_type AND b.h = a.h - l.k
    ),
    sums AS (
      SELECT event_type, k, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, k, n,
           round((n * sxy - sx * sy)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 4) AS acf
    FROM sums
    """,
)
def ts_autocorr(spark, sf_dir):
    """Lag-1..3 autocorrelation of the hourly series per event type —
    the seasonality/persistence diagnostic (an ACF spike at lag 24
    means daily cycle; near-zero ACF means the series is noise and
    smoothing it is pointless).

    Lag pairs are formed by HOUR DISTANCE (equi self-join on
    (type, h−k)), not row offset, so gaps never misalign the pairs and
    the pair SET is engine-exact.  Pearson ACF is computed from the
    five integer power sums in milli-units — every aggregate is an
    exact bigint in any summation order, and the final expression is
    one identical double evaluation both sides (the
    ts_seasonal_decompose determinism discipline).  Scale: events
    collapse map-side to bars first; the lag join and the power-sum
    aggregate both key on (type, hour) — two shuffles over the tiny
    bar relation, corpus scanned once.
    """
    ev = t(spark, sf_dir, "events")
    hr = ev.groupBy(
        "event_type",
        F.floor(unix_secs(F.col("ts")) / 3600).cast("bigint").alias("h"),
    ).agg(F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("vm"))
    lags = spark.range(1, 4).select(F.col("id").cast("int").alias("k"))
    a = hr.select(
        "event_type", "h", F.col("vm").alias("x")
    ).crossJoin(F.broadcast(lags))
    b = hr.select(
        F.col("event_type").alias("b_type"),
        F.col("h").alias("b_h"),
        F.col("vm").alias("y"),
    )
    pairs = a.join(
        b,
        (F.col("b_type") == F.col("event_type"))
        & (F.col("b_h") == F.col("h") - F.col("k")),
    )
    sums = pairs.groupBy("event_type", "k").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return sums.select(
        "event_type", "k", "n", F.round(num / den, 4).alias("acf")
    )


@register(
    "ab_test_proportions",
    oracle=f"""
    WITH assign AS (
      SELECT user_id % 2 AS variant,
             max(CASE WHEN event_type = 'purchase' AND value > 350
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT variant, count(*) AS n,
             cast(sum(converted) AS bigint) AS conv
      FROM assign GROUP BY 1
    )
    SELECT variant, n, conv,
           round(conv / CAST(n AS DOUBLE), 6) AS p_hat,
           round((conv / CAST(n AS DOUBLE) + 1.959964 * 1.959964 / (2 * n)
                  - 1.959964 * sqrt((conv / CAST(n AS DOUBLE))
                      * (1 - conv / CAST(n AS DOUBLE)) / n
                      + 1.959964 * 1.959964 / (4 * CAST(n AS DOUBLE) * n)))
                 / (1 + 1.959964 * 1.959964 / n), 6) AS wilson_lo,
           round((conv / CAST(n AS DOUBLE) + 1.959964 * 1.959964 / (2 * n)
                  + 1.959964 * sqrt((conv / CAST(n AS DOUBLE))
                      * (1 - conv / CAST(n AS DOUBLE)) / n
                      + 1.959964 * 1.959964 / (4 * CAST(n AS DOUBLE) * n)))
                 / (1 + 1.959964 * 1.959964 / n), 6) AS wilson_hi
    FROM arms
    """,
)
def ab_test_proportions(spark, sf_dir):
    """A/B test readout: per-variant conversion rate with the 95%
    WILSON score interval — the experimentation table-stakes (Wilson,
    not Wald: Wald's ±z√(p̂q̂/n) collapses to zero width at p̂∈{0,1}
    and undercovers at small n; every serious experiment platform
    ships Wilson or Jeffreys).

    Users are deterministically assigned by id parity; conversion =
    any high-value purchase (value > 350 — keeps p̂ interior so the
    interval math is non-degenerate).  Two map-side-combined aggregates (per-user
    flag, then per-arm totals — user grain FIRST, so a chatty user
    can't inflate conversions), then the interval is one codegen
    expression over exact integer (n, conv) — evaluated with identical
    association both engines, z = 1.959964 spelled as the same literal.
    At 100 TB: two key-shuffles, output = |variants| rows.
    """
    ev = t(spark, sf_dir, "events")
    assign = ev.groupBy((F.col("user_id") % 2).alias("variant"), F.col("user_id")).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 350), 1
            ).otherwise(0)
        ).alias("converted")
    )
    arms = assign.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("converted").alias("conv")
    )
    z = F.lit(1.959964)
    p = F.col("conv") / F.col("n").cast("double")
    z2n = z * z / F.col("n")
    center = p + z * z / (2 * F.col("n"))
    half = z * F.sqrt(
        p * (1 - p) / F.col("n")
        + z * z / (4 * F.col("n").cast("double") * F.col("n"))
    )
    denom = 1 + z2n
    return arms.select(
        "variant",
        "n",
        "conv",
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


@register(
    "ts_cusum_changepoint",
    oracle=f"""
    WITH hr AS (
      SELECT event_type,
             cast(floor({ORACLE_TSEC.format(c='ts')} / 3600) AS bigint) AS h,
             sum(cast(round(value * 1000) AS bigint)) AS vm
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type,
             cast(sum(vm) AS bigint) AS tot,
             cast(count(*) AS bigint) AS nbars
      FROM hr GROUP BY 1
    ),
    cs AS (
      SELECT h.event_type, h.h,
             sum(h.vm * b.nbars - b.tot)
               OVER (PARTITION BY h.event_type ORDER BY h.h
                     ROWS UNBOUNDED PRECEDING) AS cusum_scaled,
             b.nbars, b.tot
      FROM hr h JOIN base b ON b.event_type = h.event_type
    ),
    ranked AS (
      SELECT event_type, h, cusum_scaled, nbars,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(cusum_scaled) DESC, h) AS rn
      FROM cs
    )
    SELECT event_type, h AS change_hour,
           round(cusum_scaled / (CAST(1000.0 AS DOUBLE) * nbars), 4)
             AS peak_cusum
    FROM ranked WHERE rn = 1
    """,
)
def ts_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point detection per series: the running cumulative
    sum of deviations from the series mean peaks (in absolute value)
    exactly where the level shifts — the classic single-changepoint
    estimator (Page's CUSUM / binary-segmentation step 1), and the
    monitoring primitive behind "when did this metric break".

    Determinism: deviations are kept INTEGER by scaling — vm·n − Σvm
    (milli-units × bar count) — so the running sum and the argmax are
    exact bigints in any order; the peak is reported back in value
    units by one double division.  Tiebreak (|cusum| DESC, h) makes
    the argmax total-ordered (R2).

    Scale: events collapse map-side to bars; the per-series mean is a
    |types|-row aggregate joined back; one cumulative window + one
    rank over the bar relation.  At 100 TB this is two shuffles of
    |types|×|hours| rows.
    """
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    hr = ev.groupBy(
        "event_type",
        F.floor(unix_secs(F.col("ts")) / 3600).cast("bigint").alias("h"),
    ).agg(F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("vm"))
    base = hr.groupBy(F.col("event_type").alias("b_type")).agg(
        F.sum("vm").cast("bigint").alias("tot"),
        F.count("*").cast("bigint").alias("nbars"),
    )
    cs = hr.join(base, F.col("b_type") == F.col("event_type"))
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cs = cs.withColumn(
        "cusum_scaled",
        F.sum(F.col("vm") * F.col("nbars") - F.col("tot")).over(wrun),
    )
    wrank = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_scaled")).desc(), "h"
    )
    return (
        cs.withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("h").alias("change_hour"),
            F.round(
                F.col("cusum_scaled") / (F.lit(1000.0) * F.col("nbars")), 4
            ).alias("peak_cusum"),
        )
    )


# Columns for the two-pass correlation matrix, scaled to exact
# integers (hundredths / cents) so pass-1 sums are exact bigints.
_CM_COLS = [
    ("l_quantity", 100),
    ("l_extendedprice", 100),
    ("l_discount", 100),
    ("l_tax", 100),
]


def _corr_matrix_oracle() -> str:
    k = len(_CM_COLS)
    ints = ",\n           ".join(
        f"cast(round({c} * {sc}) AS bigint) AS x{i}"
        for i, (c, sc) in enumerate(_CM_COLS)
    )
    mus = ", ".join(
        [f"sum(x{i}) / CAST(count(*) AS DOUBLE) AS mu{i}" for i in range(k)]
    )
    cents = []
    for i in range(k):
        for j in range(i, k):
            cents.append(f"sum((x{i} - mu{i}) * (x{j} - mu{j})) AS c{i}_{j}")
    pairs = []
    for i in range(k):
        for j in range(i + 1, k):
            pairs.append(
                f"SELECT '{_CM_COLS[i][0]}' AS col_a, '{_CM_COLS[j][0]}' AS col_b, "
                f"round(c{i}_{j} / (sqrt(c{i}_{i}) * sqrt(c{j}_{j})), 6) AS r "
                f"FROM cents"
            )
    return (
        f"""
    WITH ints AS (
      SELECT {ints}
      FROM lineitem
    ),
    mus AS (SELECT {mus} FROM ints),
    cents AS (
      SELECT {", ".join(cents)}
      FROM ints CROSS JOIN mus
    )
    """
        + " UNION ALL ".join(pairs)
    )


@register("agg_corr_matrix", oracle=_corr_matrix_oracle())
def agg_corr_matrix(spark, sf_dir):
    """Full pairwise Pearson correlation matrix over the lineitem
    numeric columns — the feature-selection / multicollinearity
    screen, in the shape that is BOTH scale- and numerically-correct:
    two passes, never an unpivot + self-join that shuffles n·k² rows.

    Pass 1: exact integer column sums → means (the raw-moment one-pass
    identity n·Σxy − Σx·Σy was tried first and OVERFLOWS int64 at
    cents scale — n·Σx² ≈ 3.6e19 > 2⁶³ — and in doubles it
    catastrophically cancels for correlated pairs).  Pass 2: centered
    cross-products in doubles against the 1-row broadcast means —
    well-conditioned (no cancellation), one map-side-combined
    aggregate producing all C(4,2)+4 = 10 moments at once; the pair
    expansion runs over the ONE-row moment relation.  Summation order
    skews centered sums at ~1e-13 relative; 6-dp round absorbs it.
    """
    k = len(_CM_COLS)
    ints = t(spark, sf_dir, "lineitem").select(
        *[
            F.round(F.col(c) * sc).cast("bigint").alias(f"x{i}")
            for i, (c, sc) in enumerate(_CM_COLS)
        ]
    )
    mus = ints.agg(
        *[
            (F.sum(f"x{i}") / F.count("*").cast("double")).alias(f"mu{i}")
            for i in range(k)
        ]
    )
    centered = ints.crossJoin(F.broadcast(mus))
    aggs = []
    for i in range(k):
        for j in range(i, k):
            aggs.append(
                F.sum(
                    (F.col(f"x{i}") - F.col(f"mu{i}"))
                    * (F.col(f"x{j}") - F.col(f"mu{j}"))
                ).alias(f"c{i}_{j}")
            )
    cents = centered.agg(*aggs)
    # The C(k,2) pair rows fan out IN-ROW from the single 1-row moment
    # relation: a union of per-pair selects re-ran the ENTIRE two-pass
    # computation once per pair (r15 audit: 12 lineitem scans for 6
    # output rows — Spark shares no physical subtrees across DataFrame
    # references).  One explode over a literal struct array evaluates
    # the same expressions against the same moments, once.
    pair_structs = F.array(
        *[
            F.struct(
                F.lit(_CM_COLS[i][0]).alias("col_a"),
                F.lit(_CM_COLS[j][0]).alias("col_b"),
                F.round(
                    F.col(f"c{i}_{j}")
                    / (F.sqrt(F.col(f"c{i}_{i}")) * F.sqrt(F.col(f"c{j}_{j}"))),
                    6,
                ).alias("r"),
            )
            for i in range(k)
            for j in range(i + 1, k)
        ]
    )
    return cents.select(F.explode(pair_structs).alias("p")).select("p.*")


@register(
    "profile_drift_psi",
    oracle="""
    WITH src AS (
      SELECT o_totalprice AS x,
             CASE WHEN year(o_orderdate) < 1996 THEN 'ref' ELSE 'cur' END AS era,
             least(cast(floor(o_totalprice / 60000.0) AS int), 9) AS bucket
      FROM orders
    ),
    counts AS (
      SELECT era, bucket, count(*) AS n FROM src GROUP BY 1, 2
    ),
    tot AS (SELECT era, sum(n) AS t FROM counts GROUP BY 1),
    grid AS (
      SELECT b.bucket, e.era FROM (SELECT unnest(generate_series(0, 9)) AS bucket) b
      CROSS JOIN (SELECT unnest(['ref', 'cur']) AS era) e
    ),
    dense AS (
      SELECT g.bucket, g.era,
             (coalesce(c.n, 0) + 0.5) / (t.t + 5.0) AS p
      FROM grid g
      LEFT JOIN counts c ON c.bucket = g.bucket AND c.era = g.era
      JOIN tot t ON t.era = g.era
    ),
    wide AS (
      SELECT bucket,
             max(CASE WHEN era = 'ref' THEN p END) AS p_ref,
             max(CASE WHEN era = 'cur' THEN p END) AS p_cur
      FROM dense GROUP BY bucket
    )
    SELECT bucket,
           round(p_ref, 6) AS p_ref,
           round(p_cur, 6) AS p_cur,
           round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term
    FROM wide
    """,
)
def profile_drift_psi(spark, sf_dir):
    """Population Stability Index per bucket — THE feature-drift
    monitor ML-ops gates retraining on (PSI > 0.2 = significant
    shift): order totals bucketed on a FIXED grid (never
    data-dependent quantiles — those drift with the data and make
    eras incomparable), reference era vs current era, with the
    additive +0.5 smoothing that keeps empty buckets from exploding
    the log term.

    Shape: one map-side-combined (era, bucket) count, one 2-row total,
    and the PSI terms computed over the DENSE constant-size grid (a
    generated 10×2 relation LEFT-joined to the counts — missing
    buckets must contribute, not vanish).  Smoothed probabilities are
    exact rationals of integer counts → identical doubles both
    engines; at 100 TB one shuffle of ≤ |eras|×|buckets| combined
    rows.
    """
    o = t(spark, sf_dir, "orders")
    src = o.select(
        F.when(F.year("o_orderdate") < 1996, "ref").otherwise("cur").alias("era"),
        F.least(
            F.floor(F.col("o_totalprice") / 60000.0).cast("int"), F.lit(9)
        ).alias("bucket"),
    )
    counts = src.groupBy("era", "bucket").agg(F.count("*").alias("n"))
    tot = counts.groupBy(F.col("era").alias("t_era")).agg(F.sum("n").alias("t"))
    grid = (
        spark.range(10)
        .select(F.col("id").cast("int").alias("bucket"))
        .crossJoin(
            local_df(spark, [("ref",), ("cur",)], "era string")
        )
    )
    dense = (
        grid.join(counts, ["bucket", "era"], "left")
        .join(tot, F.col("t_era") == F.col("era"))
        .select(
            "bucket",
            "era",
            ((F.coalesce(F.col("n"), F.lit(0)) + 0.5) / (F.col("t") + 5.0)).alias(
                "p"
            ),
        )
    )
    wide = dense.groupBy("bucket").agg(
        F.max(F.when(F.col("era") == "ref", F.col("p"))).alias("p_ref"),
        F.max(F.when(F.col("era") == "cur", F.col("p"))).alias("p_cur"),
    )
    return wide.select(
        "bucket",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round(
            (F.col("p_cur") - F.col("p_ref")) * F.log(F.col("p_cur") / F.col("p_ref")),
            6,
        ).alias("psi_term"),
    )


@register(
    "agg_gini",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS i,
             count(*) OVER () AS n,
             sum(cents) OVER () AS tot
      FROM rev
    )
    SELECT cast(max(n) AS bigint) AS n_cust,
           round(2.0 * sum(i * cents) / (CAST(max(n) AS DOUBLE) * max(tot))
                 - (max(n) + 1.0) / max(n), 6) AS gini
    FROM ranked
    """,
)
def agg_gini(spark, sf_dir):
    """Gini coefficient of customer revenue — the standard inequality
    scalar behind "top-X% of customers drive Y% of revenue" (the
    integral view of pareto_customers' frontier): G = 2·Σ(i·xᵢ)/(n·Σx)
    − (n+1)/n over revenue sorted ascending.

    Determinism: revenues are exact integer cents and the rank is
    total-ordered (cents, custkey), so Σ(i·xᵢ) is an exact bigint
    (max i·x ≈ 1.5e3·1.5e9 ≈ 2e12, summed ≈ 3e15 < 2⁶³) and the final
    expression is one identical double evaluation.  The rank runs as
    the BUCKETED parallel prefix count (``bucketed_prefix_sums``,
    r16): i = inclusive running count of 1s in cents order, n and
    Σcents ride the same offsets broadcast.  Rows tied on cents may
    permute across/within buckets, but tied rows share the SAME
    cents, so Σ(i·xᵢ) is invariant under any tie permutation — the
    exact-bigint result is bit-identical to the oracle's
    (cents, custkey) row_number formulation.  The former
    single-partition window funneled the |customers| aggregate
    through one task (the fact-table pass is one map-side-combined
    groupBy either way).
    """
    rev = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    ranked = bucketed_prefix_sums(
        spark,
        rev.select("cents", F.lit(1).alias("one")),
        "cents",
        ["one", "cents"],
        carry=("cents",),
    )
    return ranked.agg(
        F.max("tot_one").cast("bigint").alias("n_cust"),
        F.round(
            2.0 * F.sum(F.col("cum_one") * F.col("cents"))
            / (F.max("tot_one").cast("double") * F.max("tot_cents"))
            - (F.max("tot_one") + 1.0) / F.max("tot_one"),
            6,
        ).alias("gini"),
    )


@register(
    "ts_backtest_naive",
    oracle=f"""
    WITH hr AS (
      SELECT event_type,
             cast(floor({ORACLE_TSEC.format(c='ts')} / 3600) AS bigint) AS h,
             sum(cast(round(value * 1000) AS bigint)) AS vm
      FROM events GROUP BY 1, 2
    ),
    horizon AS (SELECT event_type, max(h) AS hmax FROM hr GROUP BY 1),
    test AS (
      SELECT hr.event_type, hr.h, hr.vm
      FROM hr JOIN horizon x ON x.event_type = hr.event_type
      WHERE hr.h > x.hmax - 24
    ),
    pred AS (
      SELECT t.event_type, t.h, t.vm AS actual, p.vm AS predicted
      FROM test t
      JOIN hr p ON p.event_type = t.event_type AND p.h = t.h - 24
    )
    SELECT event_type,
           cast(count(*) AS bigint) AS n_hours,
           round(sum(abs(actual - predicted)) / (1000.0 * count(*)), 4)
             AS mae,
           round(sum(abs(actual - predicted)) * 1.0
                 / nullif(sum(abs(actual)), 0), 4) AS wape
    FROM pred GROUP BY event_type
    """,
)
def ts_backtest_naive(spark, sf_dir):
    """Seasonal-naive forecast BACKTEST: predict each of the last 24
    hours by the value 24 hours earlier and score MAE + WAPE per
    series — the baseline every forecasting effort must beat (and the
    honest first deliverable: if fancy models can't beat lag-24, ship
    lag-24).  WAPE (Σ|err|/Σ|actual|) is the scale-free twin that
    survives intermittent series where MAPE divides by zero.

    Same leakage-free join spine as seq_markov_eval: the "model" is
    the series itself lagged via an EQUI-join on (type, h−24) — hour
    DISTANCE, not row offset, so gaps align correctly; the holdout cut
    comes from a |types|-row max-hour relation joined back.  Errors
    are exact integer milli-units; two divisions at the end (nullif
    guards the WAPE denominator symmetrically — the anomaly_mad
    discipline).
    """
    ev = t(spark, sf_dir, "events")
    # hr (|types|x|hours| rows) feeds THREE consumers (horizon, test,
    # base) — persisted so the hourly rollup and its event scan run
    # once, not three times (r15 audit).
    hr = (
        ev.groupBy(
            "event_type",
            F.floor(unix_secs(F.col("ts")) / 3600).cast("bigint").alias("h"),
        )
        .agg(F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("vm"))
        .persist()
    )
    horizon = hr.groupBy(F.col("event_type").alias("h_type")).agg(
        F.max("h").alias("hmax")
    )
    test = hr.join(
        horizon,
        (F.col("h_type") == F.col("event_type"))
        & (F.col("h") > F.col("hmax") - 24),
    ).select("event_type", "h", F.col("vm").alias("actual"))
    base = hr.select(
        F.col("event_type").alias("b_type"),
        F.col("h").alias("b_h"),
        F.col("vm").alias("predicted"),
    )
    pred = test.join(
        base,
        (F.col("b_type") == F.col("event_type"))
        & (F.col("b_h") == F.col("h") - 24),
    )
    err = F.abs(F.col("actual") - F.col("predicted"))
    return pred.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_hours"),
        F.round(F.sum(err) / (1000.0 * F.count("*")), 4).alias("mae"),
        F.round(
            F.sum(err) * F.lit(1.0)
            / F.nullif(F.sum(F.abs(F.col("actual"))), F.lit(0)),
            4,
        ).alias("wape"),
    )


@register(
    "ts_interpolate_linear",
    oracle=f"""
    WITH sparse AS (
      SELECT user_id, event_id,
             {ORACLE_TSEC.format(c='ts')} AS tsec,
             CASE WHEN event_id % 7 = 0 THEN round(value, 4) END AS obs
      FROM events
    ),
    ctx AS (
      SELECT user_id, event_id, tsec, obs,
             last_value(obs IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN obs IS NOT NULL THEN tsec END IGNORE NULLS)
                 OVER w_prev AS pt,
             first_value(obs IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN obs IS NOT NULL THEN tsec END IGNORE NULLS)
                 OVER w_next AS nt
      FROM sparse
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY tsec, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY user_id ORDER BY tsec, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_id, obs,
           round(CASE
             WHEN obs IS NOT NULL THEN obs
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (tsec - pt) / nullif(nt - pt, 0)
           END, 4) AS interp
    FROM ctx
    """,
)
def ts_interpolate_linear(spark, sf_dir):
    """Linear interpolation of a sparse time series — the third member
    of the gap-repair family (ts_gapfill inserts missing buckets,
    win_locf carries the last value flat; this one draws the line
    between the bracketing observations, the standard repair for
    sensor/metric series before model features).

    Every 7th event is "observed"; for the rest the value is
    prev + (next - prev) * (t - t_prev) / (t_next - t_prev) over the
    per-user (tsec, event_id) order.  Series edges fall back to the
    one-sided neighbor (NOCB before the first obs, LOCF after the
    last).

    Spark shape: ONE user_id exchange serves two mirror-frame windows
    (preceding-last / following-first with IGNORE NULLS) computing the
    bracketing value AND its timestamp; interpolation itself is a
    codegen projection.  The t_next = t_prev degenerate case (two
    observations on one timestamp) is nullif-guarded IDENTICALLY in
    both engines — Spark division by zero yields NULL while DuckDB
    IEEE doubles yield Infinity, the anomaly_mad divergence class.
    Scale: windows partition by user — millions of independent
    partitions, no global sort, state bounded by the widest single
    user.
    """
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        unix_secs(F.col("ts")).alias("tsec"),
        F.when(F.col("event_id") % 7 == 0, F.round("value", 4)).alias("obs"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("tsec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("tsec", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("obs").isNotNull(), F.col("tsec"))
    ctx = ev.select(
        "user_id",
        "event_id",
        "tsec",
        "obs",
        F.last("obs", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_t, ignorenulls=True).over(w_prev).alias("pt"),
        F.first("obs", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_t, ignorenulls=True).over(w_next).alias("nt"),
    )
    interp = (
        F.when(F.col("obs").isNotNull(), F.col("obs"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("tsec") - F.col("pt"))
            / F.nullif(F.col("nt") - F.col("pt"), F.lit(0))
        )
    )
    return ctx.select(
        "user_id", "event_id", "obs", F.round(interp, 4).alias("interp")
    )


@register(
    "dq_expectations",
    oracle="""
    WITH checks AS (
      SELECT
        count(*) AS n_checked,
        cast(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS bigint) AS nonpositive_price,
        cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS bigint) AS null_custkey,
        cast(sum(CASE WHEN o_orderdate <  TIMESTAMP '1995-01-01'
                   OR o_orderdate >= TIMESTAMP '2002-01-01'
                 THEN 1 ELSE 0 END) AS bigint) AS date_out_of_range,
        cast(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                 THEN 1 ELSE 0 END) AS bigint) AS bad_status
      FROM orders
    ),
    orphan AS (
      SELECT count(*) AS v FROM orders
      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    ),
    dup AS (
      SELECT cast(coalesce(sum(n - 1), 0) AS bigint) AS v
      FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1) g
      WHERE n > 1
    )
    SELECT rule, violations, n_checked FROM (
      SELECT 'nonpositive_price' AS rule, nonpositive_price AS violations, n_checked FROM checks
      UNION ALL
      SELECT 'null_custkey', null_custkey, n_checked FROM checks
      UNION ALL
      SELECT 'date_out_of_range', date_out_of_range, n_checked FROM checks
      UNION ALL
      SELECT 'bad_status', bad_status, n_checked FROM checks
      UNION ALL
      SELECT 'orphan_custkey', orphan.v, checks.n_checked FROM orphan, checks
      UNION ALL
      SELECT 'duplicate_orderkey', dup.v, checks.n_checked FROM dup, checks
    )
    """,
)
def dq_expectations(spark, sf_dir):
    """Data-quality expectation suite — the admission firewall a
    training pipeline runs before any batch enters the corpus
    (null/range/domain checks, referential integrity, key uniqueness),
    one row per rule with its violation count.

    Spark shape, built for a 100 TB nightly batch:
    - the four ROW-LOCAL rules share ONE aggregate pass (conditional
      sums — never one scan per rule, the naive DQ-framework trap);
      the 6-cell result unpivots to rows via stack().
    - referential integrity is a LeftAnti join against the dim's key
      projection (AQE broadcasts it when small) — count of orphans,
      not a per-row IN probe.
    - key uniqueness is sum(n-1) over a groupBy(key) — map-side
      combined, and the only shuffle keyed on the fact table.
    The three branches are tiny 1-row aggregates unioned at the end;
    total cost ≈ two scans + one key shuffle regardless of rule count.
    """
    o = t(spark, sf_dir, "orders")
    # checks (1 row) feeds the stack() unpivot AND the n_checked
    # column on the orphan/dup rows — persisted so the conditional-sum
    # pass runs once, not twice (r15 audit: 4 orders scans → 3).
    checks = o.agg(
        F.count("*").alias("n_checked"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "nonpositive_price"
        ),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_custkey"
        ),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp_ntz"))
                | (F.col("o_orderdate") >= F.lit("2002-01-01").cast("timestamp_ntz")),
                1,
            ).otherwise(0)
        ).alias("date_out_of_range"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).alias("bad_status"),
    ).persist()
    row_local = checks.selectExpr(
        """stack(4,
             'nonpositive_price', nonpositive_price,
             'null_custkey', null_custkey,
             'date_out_of_range', date_out_of_range,
             'bad_status', bad_status) AS (rule, violations)""",
        "n_checked",
    )
    cust_keys = t(spark, sf_dir, "customer").select("c_custkey")
    orphan = (
        o.join(cust_keys, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count("*").alias("violations"))
        .select(F.lit("orphan_custkey").alias("rule"), "violations")
    )
    dup = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("violations"))
        .select(F.lit("duplicate_orderkey").alias("rule"), "violations")
    )
    n_checked = checks.select("n_checked")
    extra = orphan.unionByName(dup).join(F.broadcast(n_checked))
    return row_local.unionByName(extra)


@register(
    "agg_moments",
    oracle="""
    WITH p AS (
      SELECT l_returnflag AS grp, count(*) AS n,
             sum(l_quantity) AS s1,
             sum(l_quantity * l_quantity) AS s2,
             sum(l_quantity * l_quantity * l_quantity) AS s3,
             sum(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
      FROM lineitem GROUP BY 1
    )
    SELECT grp, n,
           round(s1 / n, 6) AS mean,
           round(s2 / n - (s1 / n) * (s1 / n), 6) AS m2,
           round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skew,
           round((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / pow(s2 / n - (s1 / n) * (s1 / n), 2) - 3, 6) AS ex_kurtosis
    FROM p
    """,
)
def agg_moments(spark, sf_dir):
    """Distribution moments (mean/variance/skewness/excess kurtosis)
    from RAW POWER SUMS — the distributed-moments shape: each task
    emits (n, Σx, Σx², Σx³, Σx⁴), partials merge by plain addition,
    and the moments are a driver-side projection of the merged sums.

    Why not the skewness()/kurtosis() builtins: their internal update
    algorithms (and bias conventions) differ between engines, so the
    twin could only match approximately.  Power sums of the
    integer-valued quantity column are EXACT in doubles (< 2^53) and
    order-independent — bit-identical cross-engine before the single
    rounded projection (R1).  One map-side-combined aggregate, 3-row
    output; at 100 TB this is the profile pass that costs one scan.
    """
    li = t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    p = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mean = s1 / n
    m2 = s2 / n - mean * mean
    skew = (s3 / n - 3 * mean * (s2 / n) + 2 * mean * mean * mean) / F.pow(m2, 1.5)
    kurt = (
        s4 / n
        - 4 * mean * (s3 / n)
        + 6 * mean * mean * (s2 / n)
        - 3 * mean * mean * mean * mean
    ) / F.pow(m2, 2) - 3
    return p.select(
        "grp",
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(m2, 6).alias("m2"),
        F.round(skew, 6).alias("skew"),
        F.round(kurt, 6).alias("ex_kurtosis"),
    )


@register(
    "corr_spearman",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag AS grp,
             rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + (count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0
               AS r_qty,
             rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + (count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2.0
               AS r_price
      FROM lineitem
    )
    SELECT grp, round(corr(r_qty, r_price), 6) AS spearman_rho, count(*) AS n
    FROM ranked GROUP BY grp
    """,
)
def corr_spearman(spark, sf_dir):
    """Spearman rank correlation per group — the monotonic-association
    measure agg_stats' Pearson corr can't give (robust to outliers and
    nonlinearity; the standard for metric-vs-metric screens).

    Average-rank tie handling made explicit and engine-neutral:
    fractional rank = rank() + (|ties| - 1)/2 — rank() gives the
    first position of the tie group, the tie-count window centers it.
    Ranks are exact integers/half-integers, so the only float work is
    the final Pearson over ranks (rounded at 6 dp).  Scale shape: two
    sort-windows per variable SHARE the group partition; corr is one
    map-side-combinable aggregate.  Ranking within groups keeps the
    sort partition-local — a GLOBAL Spearman would need a global rank
    (range partitioning), which is why screens rank within cohorts.
    """
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    g = Window.partitionBy("l_returnflag")

    def frank(col):
        return (
            F.rank().over(g.orderBy(col))
            + (F.count("*").over(Window.partitionBy("l_returnflag", col)) - 1) / 2.0
        )

    ranked = li.select(
        F.col("l_returnflag").alias("grp"),
        frank("l_quantity").alias("r_qty"),
        frank("l_extendedprice").alias("r_price"),
    )
    return ranked.groupBy("grp").agg(
        F.round(F.corr("r_qty", "r_price"), 6).alias("spearman_rho"),
        F.count("*").alias("n"),
    )


@register(
    "win_rolling_median",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id,
             {ORACLE_TSEC.format(c='ts')} AS tsec,
             round(value, 4) AS v
      FROM events
    )
    SELECT user_id, event_id,
           round(quantile_cont(v, 0.5) OVER (
             PARTITION BY user_id ORDER BY tsec, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS med10
    FROM ev
    """,
)
def win_rolling_median(spark, sf_dir):
    """Rolling EXACT median (trailing 10 rows per user) — the robust
    smoother for spiky series that win_moving's mean cannot give (one
    outlier drags a mean for 10 rows; the median shrugs).

    Exactness is the cross-engine contract: Spark's `percentile`
    aggregate and DuckDB's `quantile_cont` both linearly interpolate
    the sorted frame, so on identically 4-dp-rounded inputs the
    results agree to the final rounding.  (approx_percentile would NOT
    — its GK sketch is engine-specific; that's why the approximate
    variant is rows-only by design.)  Scale: the frame holds ≤10
    values — per-row cost is O(10 log 10) inside one user-partitioned
    sort window, same single exchange as every §2.6 key.
    """
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        unix_secs(F.col("ts")).alias("tsec"),
        F.round("value", 4).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tsec", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.expr("percentile(v, 0.5)").over(w), 4).alias("med10"),
    )


@register(
    "ts_ohlc",
    oracle=f"""
    WITH ev AS (
      SELECT event_type,
             cast(floor({ORACLE_TSEC.format(c='ts')} / 3600) AS bigint) AS hour_bkt,
             {ORACLE_TSEC.format(c='ts')} AS tsec,
             event_id, round(value, 4) AS v
      FROM events
    )
    SELECT event_type, hour_bkt,
           round(arg_min(v, tsec * 4294967296 + event_id), 4) AS open,
           round(max(v), 4) AS high,
           round(min(v), 4) AS low,
           round(arg_max(v, tsec * 4294967296 + event_id), 4) AS close,
           count(*) AS n_ticks
    FROM ev GROUP BY 1, 2
    """,
)
def ts_ohlc(spark, sf_dir):
    """OHLC resampling (open/high/low/close bars per type × hour) —
    the financial/metrics downsampling shape ts_resample's avg can't
    express: open and close are ORDER-dependent picks, not commutative
    aggregates.

    min_by/max_by (arg_min/arg_max) with the composite tiebreak
    PACKED into one bigint (tsec·2³² + event_id — epoch seconds and
    ids both < 2³², so the product tops out near 7.4e18 < int64 max):
    a numeric ordering key keeps the aggregate HASH-based (a string
    key buffers strings and falls back to SortAggregate — measured),
    and bigint compare is engine-neutral where list keys are not
    (DuckDB 1.0's arg_min accepts no lists).
    Everything is ONE map-side-combinable aggregate: each partial
    carries its own (argmin, argmax, max, min, n) and partials merge
    associatively — the same one-pass property that makes OHLC cheap
    over 100 TB of ticks (no sort, no window, one shuffle of
    |types × hours| groups).
    """
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(unix_secs(F.col("ts")) / 3600).cast("bigint").alias("hour_bkt"),
        unix_secs(F.col("ts")).alias("tsec"),
        "event_id",
        F.round("value", 4).alias("v"),
    )
    key = F.col("tsec") * F.lit(4294967296) + F.col("event_id")
    return ev.groupBy("event_type", "hour_bkt").agg(
        F.round(F.min_by("v", key), 4).alias("open"),
        F.round(F.max("v"), 4).alias("high"),
        F.round(F.min("v"), 4).alias("low"),
        F.round(F.max_by("v", key), 4).alias("close"),
        F.count("*").alias("n_ticks"),
    )


_SCORE_DUCK = """
      SELECT round(embedding[1], 6) AS s,
             CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
      FROM embeddings
"""


def _scored(spark, sf_dir):
    # shared eval relation: score = first embedding dim (raw parquet
    # doubles, rounded 6 dp so the tie structure is engine-identical),
    # binary task y = label < 5
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        F.round(F.element_at("embedding", 1), 6).alias("s"),
        F.when(F.col("label") < 5, 1).otherwise(0).alias("y"),
    )


@register(
    "ml_auc_roc",
    oracle=f"""
    WITH scored AS ({_SCORE_DUCK}),
    per_score AS (
      SELECT s,
             cast(sum(y) AS bigint) AS n_pos,
             cast(sum(1 - y) AS bigint) AS n_neg
      FROM scored GROUP BY s
    ),
    cum AS (
      SELECT s, n_pos, n_neg,
             coalesce(sum(n_neg) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below
      FROM per_score
    )
    SELECT round(sum(n_pos * (neg_below + 0.5 * n_neg))
                 / (sum(n_pos) * sum(n_neg)), 6) AS auc,
           cast(sum(n_pos) AS bigint) AS n_pos,
           cast(sum(n_neg) AS bigint) AS n_neg
    FROM cum
    """,
)
def ml_auc_roc(spark, sf_dir):
    """Exact ROC-AUC (Mann-Whitney U) — the model-eval metric, computed
    the DISTRIBUTED way: AUC = P(s_pos > s_neg) + ½P(s_pos = s_neg),
    evaluated WITHOUT ranking individual rows.  Per-score (n_pos,
    n_neg) counts collapse the corpus in one map-side-combined
    aggregate; the cumulative-negatives prefix sum then runs BUCKETED
    over the |distinct scores| relation (``bucketed_prefix_sums``,
    r16, the stat_ks_test discipline): a deterministic monotone
    bucket of s partitions the window, per-bucket exclusive cumsums
    run in parallel, and broadcast preceding-bucket offsets correct
    them in-row — exact bigint additions, bit-identical to the old
    single-partition global window it replaces (that WindowExec
    funneled the whole score axis through ONE task; the intermediate
    repartitionByRange+pid form paid a RangePartitioner sampling pass
    and a layout persist — see stat_ks_test).  Counting pairs
    through cumulative sums is exact integer arithmetic; the single
    division is rounded at 6 dp.
    """
    per_score = _scored(spark, sf_dir).groupBy("s").agg(
        F.sum("y").alias("n_pos"),
        F.sum(1 - F.col("y")).alias("n_neg"),
    )
    cum = bucketed_prefix_sums(
        spark,
        per_score,
        "s",
        ["n_neg"],
        carry=("n_pos", "n_neg"),
        preceding_only=True,
    ).select("n_pos", "n_neg", F.col("cum_n_neg").alias("neg_below"))
    return cum.agg(
        F.round(
            F.sum(F.col("n_pos") * (F.col("neg_below") + 0.5 * F.col("n_neg")))
            / (F.sum("n_pos") * F.sum("n_neg")),
            6,
        ).alias("auc"),
        F.sum("n_pos").alias("n_pos"),
        F.sum("n_neg").alias("n_neg"),
    )


@register(
    "ml_decision_stump",
    oracle=f"""
    WITH scored AS ({_SCORE_DUCK}),
    per_score AS (
      SELECT s, cast(count(*) AS bigint) AS n,
             cast(sum(y) AS bigint) AS pos
      FROM scored GROUP BY s
    ),
    tot AS (SELECT sum(n) AS nt, sum(pos) AS post FROM per_score),
    splits AS (
      SELECT s AS thr,
             sum(n)   OVER (ORDER BY s) AS n_l,
             sum(pos) OVER (ORDER BY s) AS pos_l
      FROM per_score
    ),
    gini AS (
      SELECT thr, n_l, nt - n_l AS n_r,
             round(
               (n_l * 1.0 / nt) * (1 - pow(pos_l * 1.0 / n_l, 2)
                                     - pow(1 - pos_l * 1.0 / n_l, 2))
             + ((nt - n_l) * 1.0 / nt)
               * (CASE WHEN nt - n_l = 0 THEN 0 ELSE
                   1 - pow((post - pos_l) * 1.0 / (nt - n_l), 2)
                     - pow(1 - (post - pos_l) * 1.0 / (nt - n_l), 2) END), 6)
               AS wgini
      FROM splits, tot
    )
    SELECT thr, wgini, cast(n_l AS bigint) AS n_left,
           cast(n_r AS bigint) AS n_right
    FROM gini
    ORDER BY wgini, thr LIMIT 1
    """,
)
def ml_decision_stump(spark, sf_dir):
    """Depth-1 decision tree (best threshold split by weighted Gini) —
    exact, SQL-expressible model TRAINING: every distinct score is a
    candidate threshold, left/right class counts come from ONE
    cumulative window over the per-score relation (never a
    threshold × rows join — that quadratic is the naive stump), and
    the argmin is a top-1 with (gini, thr) total order.

    The same collapsed-axis pattern as ml_auc_roc: corpus → per-score
    integer counts (one aggregate), candidate evaluation over
    |distinct scores| rows — cumulated by the BUCKETED parallel
    prefix sum (``bucketed_prefix_sums``, r16: exact bigint offsets,
    bit-identical to the former single-partition global window that
    funneled the whole score axis through one task; the grand totals
    ride the same offsets broadcast, retiring the separate 1-row
    crossJoin).  Gini terms are ratios of exact integers
    rounded at 6 dp before the argmin, so the winning split is
    engine-identical; the empty-right-branch edge (thr = max score) is
    CASE-guarded identically in both engines.
    """
    per_score = _scored(spark, sf_dir).groupBy("s").agg(
        F.count("*").alias("n"), F.sum("y").alias("pos")
    )
    j = bucketed_prefix_sums(spark, per_score, "s", ["n", "pos"], carry=("s",)).select(
        F.col("s").alias("thr"),
        F.col("cum_n").alias("n_l"),
        F.col("cum_pos").alias("pos_l"),
        F.col("tot_n").alias("nt"),
        F.col("tot_pos").alias("post"),
    )
    n_l, pos_l = F.col("n_l"), F.col("pos_l")
    nt, post = F.col("nt"), F.col("post")
    p_l = pos_l / n_l
    n_r = nt - n_l
    p_r = (post - pos_l) / n_r
    wgini = F.round(
        (n_l / nt) * (1 - F.pow(p_l, 2) - F.pow(1 - p_l, 2))
        + (n_r / nt)
        * F.when(n_r == 0, F.lit(0.0)).otherwise(
            1 - F.pow(p_r, 2) - F.pow(1 - p_r, 2)
        ),
        6,
    )
    return (
        j.select(
            "thr",
            wgini.alias("wgini"),
            n_l.cast("bigint").alias("n_left"),
            n_r.cast("bigint").alias("n_right"),
        )
        .orderBy("wgini", "thr")
        .limit(1)
    )


@register(
    "ml_calibration_bins",
    oracle=f"""
    WITH scored AS ({_SCORE_DUCK})
    SELECT cast(least(9, greatest(0, floor((s + 0.5) * 10))) AS int) AS bin,
           count(*) AS n,
           round(avg(s), 6) AS mean_score,
           round(avg(y * 1.0), 6) AS pos_rate
    FROM scored GROUP BY 1
    """,
)
def ml_calibration_bins(spark, sf_dir):
    """Calibration / reliability bins (mean score vs observed positive
    rate per FIXED score bucket) — the eval that catches a model whose
    ranking is fine (AUC high) but whose probabilities lie.

    Fixed-grid binning (10 buckets over [-0.5, 0.5), clamped) rather
    than quantile bins: data-dependent quantile edges drift with the
    data and need a global sort — the profile_drift_psi lesson applied
    to model eval.  One map-side-combined aggregate, 10-row output;
    floor on identical doubles bins identically cross-engine.
    """
    sc = _scored(spark, sf_dir)
    bin_ = F.least(F.lit(9), F.greatest(F.lit(0), F.floor((F.col("s") + 0.5) * 10))).cast(
        "int"
    )
    return sc.groupBy(bin_.alias("bin")).agg(
        F.count("*").alias("n"),
        F.round(F.avg("s"), 6).alias("mean_score"),
        F.round(F.avg(F.col("y") * 1.0), 6).alias("pos_rate"),
    )


@register(
    "ml_linreg_normal",
    oracle="""
    WITH f AS (
      SELECT round(cast(embedding[1] AS double), 6) AS x1,
             round(cast(embedding[2] AS double), 6) AS x2,
             round(cast(embedding[4] AS double), 6) AS y
      FROM embeddings
    ),
    m AS (
      SELECT count(*) * 1.0 AS n,
             sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
             sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
             sum(x2 * x2) AS s22,
             sum(x1 * y) AS s1y, sum(x2 * y) AS s2y,
             sum(y * y) AS syy
      FROM f
    )
    SELECT round(det, 6) AS det,
           round(b0, 6) AS beta0, round(b1, 6) AS beta1,
           round(b2, 6) AS beta2,
           round(1 - (syy - b0 * sy - b1 * s1y - b2 * s2y)
                     / (syy - sy * sy / n), 6) AS r2
    FROM (
      SELECT *,
             n * (s11 * s22 - s12 * s12)
               - sx1 * (sx1 * s22 - s12 * sx2)
               + sx2 * (sx1 * s12 - s11 * sx2) AS det,
             (sy  * (s11 * s22 - s12 * s12)
               - sx1 * (s1y * s22 - s12 * s2y)
               + sx2 * (s1y * s12 - s11 * s2y))
             / (n * (s11 * s22 - s12 * s12)
               - sx1 * (sx1 * s22 - s12 * sx2)
               + sx2 * (sx1 * s12 - s11 * sx2)) AS b0,
             (n * (s1y * s22 - s12 * s2y)
               - sy * (sx1 * s22 - s12 * sx2)
               + sx2 * (sx1 * s2y - s1y * sx2))
             / (n * (s11 * s22 - s12 * s12)
               - sx1 * (sx1 * s22 - s12 * sx2)
               + sx2 * (sx1 * s12 - s11 * sx2)) AS b1,
             (n * (s11 * s2y - s1y * s12)
               - sx1 * (sx1 * s2y - s1y * sx2)
               + sy * (sx1 * s12 - s11 * sx2))
             / (n * (s11 * s22 - s12 * s12)
               - sx1 * (sx1 * s22 - s12 * sx2)
               + sx2 * (sx1 * s12 - s11 * sx2)) AS b2
      FROM m
    )
    """,
)
def ml_linreg_normal(spark, sf_dir):
    """Multivariate linear regression (2 features + intercept) by
    NORMAL EQUATIONS — the closed-form training that actually
    distributes: ONE aggregate pass emits the 10 sufficient statistics
    (n, Σx, Σx², Σxy, ...), and the 3×3 solve is a Cramer's-rule
    PROJECTION over that single row — no gradient loop, no per-row
    weight updates, no driver-side matrix library (the determinant
    expansions are spelled identically in both engines).

    agg_regression's single-var slope generalized: sufficient
    statistics merge by addition (map-side combine), so 100 TB costs
    one scan + a 10-double shuffle per task.  Inputs are rounded
    6 dp as DOUBLES (the float32 embedding column is cast first —
    Spark's round(float) stays float32, the ml_decision_stump lesson);
    the well-conditioned solve is rounded at 6 dp.  R² falls out of
    the same sums (SSE = Σy² − βᵀXᵀy).
    """
    e = t(spark, sf_dir, "embeddings")

    def dim(i):
        return F.round(F.element_at("embedding", i).cast("double"), 6)

    f = e.select(dim(1).alias("x1"), dim(2).alias("x2"), dim(4).alias("y"))
    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    m = f.agg(
        (F.count("*") * 1.0).alias("n"),
        F.sum(x1).alias("sx1"),
        F.sum(x2).alias("sx2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"),
        F.sum(y * y).alias("syy"),
    )
    n, sx1, sx2, sy = (F.col(c) for c in ("n", "sx1", "sx2", "sy"))
    s11, s12, s22, s1y, s2y, syy = (
        F.col(c) for c in ("s11", "s12", "s22", "s1y", "s2y", "syy")
    )
    det = (
        n * (s11 * s22 - s12 * s12)
        - sx1 * (sx1 * s22 - s12 * sx2)
        + sx2 * (sx1 * s12 - s11 * sx2)
    )
    b0 = (
        sy * (s11 * s22 - s12 * s12)
        - sx1 * (s1y * s22 - s12 * s2y)
        + sx2 * (s1y * s12 - s11 * s2y)
    ) / det
    b1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (sx1 * s22 - s12 * sx2)
        + sx2 * (sx1 * s2y - s1y * sx2)
    ) / det
    b2 = (
        n * (s11 * s2y - s1y * s12)
        - sx1 * (sx1 * s2y - s1y * sx2)
        + sy * (sx1 * s12 - s11 * sx2)
    ) / det
    sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    sst = syy - sy * sy / n
    return m.select(
        F.round(det, 6).alias("det"),
        F.round(b0, 6).alias("beta0"),
        F.round(b1, 6).alias("beta1"),
        F.round(b2, 6).alias("beta2"),
        F.round(1 - sse / sst, 6).alias("r2"),
    )


@register(
    "ts_cross_correlation",
    oracle=f"""
    WITH ev AS (
      SELECT event_type,
             cast(floor({ORACLE_TSEC.format(c='ts')} / 3600) AS bigint) AS h
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    b AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
    spine AS (SELECT unnest(generate_series(b.h0, b.h1)) AS h FROM b),
    counts AS (
      SELECT h,
             cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS bigint) AS a,
             cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bigint) AS pb
      FROM ev GROUP BY h
    ),
    dense AS (
      SELECT s.h, coalesce(c.a, 0) AS a, coalesce(c.pb, 0) AS pb
      FROM spine s LEFT JOIN counts c ON c.h = s.h
    ),
    led AS (
      SELECT h, a, pb,
             lead(pb, 1) OVER (ORDER BY h) AS pb1,
             lead(pb, 2) OVER (ORDER BY h) AS pb2
      FROM dense
    )
    SELECT lag, round(corr(a, bl), 6) AS xcorr, count(*) AS n_hours
    FROM (
      SELECT 0 AS lag, a * 1.0 AS a, pb * 1.0 AS bl FROM led
      UNION ALL
      SELECT 1, a * 1.0, pb1 * 1.0 FROM led WHERE pb1 IS NOT NULL
      UNION ALL
      SELECT 2, a * 1.0, pb2 * 1.0 FROM led WHERE pb2 IS NOT NULL
    ) GROUP BY lag
    """,
)
def ts_cross_correlation(spark, sf_dir):
    """Lagged cross-correlation between two event streams (does click
    volume now predict purchase volume k hours later?) — the
    lead-indicator screen, computed over the COLLAPSED hourly axis:
    the corpus collapses to |hours| (count_a, count_b) rows in one
    conditional aggregate, the DENSE hour spine (generate_series +
    left join, the ts_gapfill shape) restores silent hours as zeros —
    skipping them would silently bias every lag — and the lead()
    windows + per-lag Pearson all run over that tiny relation.

    Spark shape: one map-side-combined aggregate over the fact table;
    everything after (spine join, leads, 3-way lag stack, corr) is
    |hours|-row work, the text_zipf_slope collapsed-axis pattern.
    """
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "event_type",
        F.floor(unix_secs(F.col("ts")) / 3600).cast("bigint").alias("h"),
    )
    counts = ev.groupBy("h").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("pb"),
    )
    bounds = ev.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    dense = spine.join(counts, "h", "left").select(
        "h",
        F.coalesce("a", F.lit(0)).alias("a"),
        F.coalesce("pb", F.lit(0)).alias("pb"),
    )
    w = Window.orderBy("h")
    led = dense.select(
        "h",
        "a",
        "pb",
        F.lead("pb", 1).over(w).alias("pb1"),
        F.lead("pb", 2).over(w).alias("pb2"),
    )
    stacked = led.selectExpr(
        """stack(3,
             0L, a * 1.0, pb * 1.0,
             1L, a * 1.0, pb1 * 1.0,
             2L, a * 1.0, pb2 * 1.0) AS (lag, a, bl)"""
    ).filter(F.col("bl").isNotNull())
    return stacked.groupBy("lag").agg(
        F.round(F.corr("a", "bl"), 6).alias("xcorr"),
        F.count("*").alias("n_hours"),
    )


@register(
    "skyline_pareto_front",
    oracle="""
    SELECT p_partkey, p_size, round(p_retailprice, 2) AS price
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice
        AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
)
def skyline_pareto_front(spark, sf_dir):
    """2-D SKYLINE (Pareto front): the parts no other part dominates
    (bigger-or-equal size AND cheaper-or-equal price, strict in one) —
    the multi-criteria shortlist query (Börzsönyi et al.'s SKYLINE OF
    operator).

    The textbook formulation is a quadratic NOT EXISTS self-join (the
    oracle runs exactly that); the Spark plan is the DECOMPOSED form
    that scales: (1) per-size price minima — one map-side-combined
    groupBy collapsing the fact to ≤|sizes| rows; (2) the strict
    suffix-minimum M(s) = min price over sizes > s — a window over
    the TINY minima relation only (never the fact); (3) one broadcast
    join back: a part is on the front iff its price equals its size's
    minimum and beats M(s).  The fact is scanned once, shuffled only
    as |sizes| partial minima; dominance never materializes a pair.
    """
    from pyspark.sql import Window

    parts = t(spark, sf_dir, "part").select(
        "p_partkey", "p_size", F.col("p_retailprice").alias("price")
    )
    minima = parts.groupBy("p_size").agg(F.min("price").alias("min_p"))
    w_suffix = (
        Window.orderBy(F.col("p_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bounds = minima.select(
        F.col("p_size").alias("bs"),
        "min_p",
        F.min("min_p").over(w_suffix).alias("m_strict"),
    )
    return (
        parts.join(F.broadcast(bounds), F.col("p_size") == F.col("bs"))
        .filter(
            (F.col("price") == F.col("min_p"))
            & (F.col("m_strict").isNull() | (F.col("price") < F.col("m_strict")))
        )
        .select("p_partkey", "p_size", F.round("price", 2).alias("price"))
    )


@register(
    "hierarchy_rollup",
    oracle="""
    WITH spend AS (
      SELECT user_id, sum(value) AS s, count(*) AS c
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    links AS (
      SELECT user_id,
             unnest(list_distinct(list_transform(
               range(0, 9), i -> user_id >> i))) AS anc
      FROM spend
    )
    SELECT l.anc AS node,
           round(sum(s.s), 2) AS subtree_spend,
           cast(sum(s.c) AS bigint) AS n_events,
           cast(count(*) AS bigint) AS n_members
    FROM links l JOIN spend s ON s.user_id = l.user_id
    GROUP BY l.anc
    """,
)
def hierarchy_rollup(spark, sf_dir):
    """Hierarchy SUBTREE rollup (org-chart / BOM aggregation): total
    purchase spend of every node's subtree, where the hierarchy is
    the binary tree parent(u) = u >> 1 — an ADDRESSABLE hierarchy, so
    the transitive closure GENERATES IN-ROW (each user's ancestor
    chain is `transform(sequence(0,8), i -> shiftright(u, i))`,
    zero joins, zero iteration) instead of the recursive-join closure
    cte_recursive needs for arbitrary edges.

    Shape: per-user spend collapses first (map-side combine), the
    closure explode multiplies the TINY per-user relation by depth
    (≤9), and one groupBy(ancestor) sums subtrees — O(n·depth) rows
    total, one shuffle each side.  At 100 TB this is how
    materialized-path / encoded hierarchies (Dewey IDs, HOR-keys)
    roll up without recursion; n_members makes each subtree's fan-in
    inspectable.
    """
    spend = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("s"), F.count("*").alias("c"))
    )
    links = spend.select(
        "user_id",
        "s",
        "c",
        F.explode(
            F.array_distinct(
                F.expr("transform(sequence(0, 8), i -> shiftright(user_id, i))")
            )
        ).alias("node"),
    )
    return links.groupBy("node").agg(
        F.round(F.sum("s"), 2).alias("subtree_spend"),
        F.sum("c").cast("bigint").alias("n_events"),
        F.count("*").cast("bigint").alias("n_members"),
    )


@register(
    "ml_logreg_irls",
    oracle="""
    WITH d AS (
      SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             n_chars / 1000.0 AS x
      FROM documents
    ),
    s1 AS (
      SELECT 0.25 * count(*) AS a, 0.25 * sum(x) AS b, 0.25 * sum(x * x) AS dd,
             sum(y - 0.5) AS u, sum((y - 0.5) * x) AS v
      FROM d
    ),
    b1 AS (
      SELECT (dd * u - b * v) / (a * dd - b * b) AS b0,
             (a * v - b * u) / (a * dd - b * b) AS b1
      FROM s1
    ),
    s2 AS (
      SELECT sum(p * (1 - p)) AS a, sum(p * (1 - p) * x) AS b,
             sum(p * (1 - p) * x * x) AS dd,
             sum(y - p) AS u, sum((y - p) * x) AS v
      FROM (
        SELECT y, x, 1.0 / (1.0 + exp(-(b1.b0 + b1.b1 * x))) AS p
        FROM d, b1
      )
    ),
    b2 AS (
      SELECT b1.b0 + (s2.dd * s2.u - s2.b * s2.v) / (s2.a * s2.dd - s2.b * s2.b) AS b0,
             b1.b1 + (s2.a * s2.v - s2.b * s2.u) / (s2.a * s2.dd - s2.b * s2.b) AS b1
      FROM b1, s2
    )
    SELECT round(b0, 4) AS beta0, round(b1, 4) AS beta1,
           (SELECT cast(count(*) AS bigint) FROM d) AS n_obs
    FROM b2
    """,
)
def ml_logreg_irls(spark, sf_dir):
    """Logistic regression by IRLS / Newton (2 synchronous steps):
    P(lang = en | n_chars) — the iterative GLM-training shape on
    DataFrames, completing the in-engine ML trio (ml_kmeans_lloyd =
    clustering, ml_linreg_normal = least squares, this = maximum
    likelihood with a re-weighted design each round).

    Per step the 2×2 weighted normal equations collapse to FIVE
    map-side-combined sums (Σw, Σwx, Σwx², Σ(y−p), Σ(y−p)x) — one
    scan, a 1-row aggregate — and the update solves in closed form
    inside that single row (no matrix library, no driver math).  The
    new β broadcasts back as a 1-row cross join for the next
    re-weighting — exactly the scalar-feedback loop of
    embed_power_iteration.  Step 1 from β=0 has p=½ exactly, so both
    engines start from identical state; coefficients rounded 4 dp at
    the END only (the agg_regression float-sum class).

    At 100 TB: each step is one scan + O(1) shuffle bytes; steps are
    few (Newton is quadratically convergent near the optimum).
    """
    d = t(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        (F.col("n_chars") / 1000.0).alias("x"),
    )

    def newton_step(df_with_p):
        w = F.col("p") * (1 - F.col("p"))
        s = df_with_p.agg(
            F.sum(w).alias("a"),
            F.sum(w * F.col("x")).alias("b"),
            F.sum(w * F.col("x") * F.col("x")).alias("dd"),
            F.sum(F.col("y") - F.col("p")).alias("u"),
            F.sum((F.col("y") - F.col("p")) * F.col("x")).alias("v"),
            # n_obs rides the SAME aggregate pass — a separate
            # d.agg(count) cost a third full scan (r15 audit)
            F.count("*").cast("bigint").alias("n_obs"),
        )
        det = F.col("a") * F.col("dd") - F.col("b") * F.col("b")
        return s.select(
            ((F.col("dd") * F.col("u") - F.col("b") * F.col("v")) / det).alias("db0"),
            ((F.col("a") * F.col("v") - F.col("b") * F.col("u")) / det).alias("db1"),
            "n_obs",
        )

    # step 1: beta = (0,0) => p = 0.5 exactly.  beta1 feeds BOTH the
    # step-2 re-weighting broadcast and the final select — persisted
    # (1 row) so step 1's scan runs once, not twice (r15 audit: the
    # key was 4 scans for a 2-scan algorithm).
    step1 = newton_step(d.withColumn("p", F.lit(0.5)))
    beta1 = step1.select(
        F.col("db0").alias("b0"), F.col("db1").alias("b1"), "n_obs"
    ).persist()
    # step 2: re-weight with the broadcast beta
    p2 = d.crossJoin(F.broadcast(beta1.select("b0", "b1"))).withColumn(
        "p", 1.0 / (1.0 + F.exp(-(F.col("b0") + F.col("b1") * F.col("x"))))
    )
    step2 = newton_step(p2)
    return (
        beta1.crossJoin(F.broadcast(step2.select("db0", "db1")))
        .select(
            F.round(F.col("b0") + F.col("db0"), 4).alias("beta0"),
            F.round(F.col("b1") + F.col("db1"), 4).alias("beta1"),
            "n_obs",
        )
    )


_POIS_CASE_SQL = """CASE
  WHEN u < 0.36787944117144233 THEN 0
  WHEN u < 0.7357588823428847  THEN 1
  WHEN u < 0.9196986029286058  THEN 2
  WHEN u < 0.9810118431238462  THEN 3
  WHEN u < 0.9963401531726563  THEN 4
  WHEN u < 0.9994058151824183  THEN 5
  WHEN u < 0.9999167588507119  THEN 6
  WHEN u < 0.9999897508033253  THEN 7
  ELSE 8 END"""


@register(
    "stat_bootstrap_se",
    oracle=f"""
    WITH x AS (
      SELECT event_id, value FROM events WHERE event_type = 'purchase'
    ),
    rep AS (
      SELECT event_id, value, unnest(generate_series(0, 7)) AS b FROM x
    ),
    weighted AS (
      SELECT b, value,
             {_POIS_CASE_SQL.replace('u', '''(cast(concat('0x', substr(md5(concat(cast(event_id AS varchar), '|', cast(b AS varchar))), 1, 15)) AS bigint) / 1152921504606846976.0)''')} AS k
      FROM rep
    ),
    means AS (
      SELECT b, round(sum(k * value) / sum(k), 6) AS m
      FROM weighted GROUP BY b
    )
    SELECT (SELECT round(avg(value), 4) FROM x) AS mean_full,
           round(stddev_samp(m), 6) AS boot_se,
           cast(count(*) AS bigint) AS n_replicates
    FROM means
    """,
)
def stat_bootstrap_se(spark, sf_dir):
    """POISSONIZED bootstrap standard error (B=8 replicates) for the
    mean purchase value — the resampling scheme that works on a
    cluster: instead of drawing n samples per replicate (a per-row
    random ACCESS pattern no shuffle can express cheaply), each row
    gets an independent Poisson(1) weight per replicate, which
    approximates multinomial resampling and needs only ONE pass —
    the same trick behind large-scale bagging and streaming
    bootstraps.

    Weights are seeded (md5(event_id | replicate) → uniform → exact
    literal inverse-CDF thresholds, identical doubles both engines),
    so the "random" resample is reproducible and engine-exact.  The
    plan: an 8-way explode, then ONE map-side-combined groupBy(b)
    carrying (Σkx, Σk) partials — shuffle is 8 rows of state per
    partition; the stddev over 8 replicate means is a single tiny
    aggregate.  Replicate means rounded 6 dp before the stddev (R1)
    so the float-sum class cannot leak into the comparison.
    """
    x = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase").select(
        "event_id", "value"
    )
    rep = x.select(
        "event_id", "value", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("b")
    )
    u = (
        F.expr(
            "cast(conv(substring(md5(concat(cast(event_id AS string), '|', "
            "cast(b AS string))), 1, 15), 16, 10) AS bigint)"
        )
        / F.lit(1152921504606846976.0)
    )
    weighted = rep.withColumn("u_col", u).select(
        "b", "value", F.expr(_POIS_CASE_SQL.replace("u", "u_col")).alias("k")
    )
    means = weighted.groupBy("b").agg(
        F.round(F.sum(F.col("k") * F.col("value")) / F.sum("k"), 6).alias("m")
    )
    full = x.agg(F.round(F.avg("value"), 4).alias("mean_full"))
    return (
        means.agg(
            F.round(F.stddev_samp("m"), 6).alias("boot_se"),
            F.count("*").cast("bigint").alias("n_replicates"),
        )
        .crossJoin(F.broadcast(full))
        .select("mean_full", "boot_se", "n_replicates")
    )


@register(
    "stat_ks_test",
    oracle="""
    WITH s AS (
      SELECT CAST(l_extendedprice AS double) AS v, l_returnflag AS g
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    per_v AS (
      SELECT v,
             sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS r,
             sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS n
      FROM s GROUP BY v
    ),
    cum AS (
      SELECT sum(r) OVER (ORDER BY v) AS c1,
             sum(n) OVER (ORDER BY v) AS c2
      FROM per_v
    ),
    tot AS (
      SELECT CAST(sum(r) AS bigint) AS n_r, CAST(sum(n) AS bigint) AS n_n
      FROM per_v
    )
    SELECT n_r, n_n,
           round(max(abs(CAST(c1 AS double) / n_r
                         - CAST(c2 AS double) / n_n)), 9) AS d_stat,
           round(max(abs(CAST(c1 AS double) / n_r
                         - CAST(c2 AS double) / n_n))
                 * sqrt(CAST(n_r AS double) * n_n / (n_r + n_n)), 6) AS ks_lambda
    FROM cum CROSS JOIN tot
    GROUP BY n_r, n_n
    """,
)
def stat_ks_test(spark, sf_dir):
    """[r14] Exact two-sample Kolmogorov–Smirnov statistic between the
    price distributions of returned (R) vs delivered (N) line items —
    the distribution-shift test a training-data pipeline runs between
    corpus snapshots (profile_drift_psi's nonparametric sibling: PSI
    needs binning choices, KS is binning-free and exact).

    D = max_x |F_R(x) - F_N(x)| over the empirical CDFs, plus the
    scaled statistic λ = D·√(n₁n₂/(n₁+n₂)) that feeds the asymptotic
    p-value.  Computed exactly, never sampled: pre-aggregate to one
    row per DISTINCT value (map-side-combined shuffle — at 100 TB the
    distinct-price relation is orders of magnitude smaller than the
    fact table), then a BUCKETED parallel prefix sum over that
    collapsed relation (``bucketed_prefix_sums``, r16, VERDICT r15
    #6): a deterministic monotone bucket of v partitions the window,
    per-bucket CDFs accumulate in parallel, and broadcast
    preceding-bucket offsets (exact bigint additions — associative,
    so bit-identical to the old single-partition global window whose
    WindowExec moved the entire distinct-value relation to ONE task)
    correct them in-row.  The first r16 cut used repartitionByRange +
    spark_partition_id: correct, but the RangePartitioner's sampling
    job re-executed the lineitem aggregation once more per run and
    the pid stamp forced a persist for layout consistency — measured
    2.9-3.8 s in-bench vs ~1.2 s for this sampling-free form.
    Integer counts divide as doubles identically in both engines; D
    is exact rational arithmetic rounded at 9 dp only as a hash
    formality.
    """
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    per_v = li.groupBy(F.col("l_extendedprice").cast("double").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("r"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0)).alias("n"),
    )
    cum = bucketed_prefix_sums(spark, per_v, "v", ["r", "n"]).select(
        F.col("cum_r").alias("c1"),
        F.col("cum_n").alias("c2"),
        F.col("tot_r").alias("n_r"),
        F.col("tot_n").alias("n_n"),
    )
    diff = F.abs(
        F.col("c1").cast("double") / F.col("n_r")
        - F.col("c2").cast("double") / F.col("n_n")
    )
    return (
        cum.groupBy("n_r", "n_n")
        .agg(
            F.round(F.max(diff), 9).alias("d_stat"),
            F.round(
                F.max(diff)
                * F.sqrt(
                    F.col("n_r").cast("double")
                    * F.col("n_n")
                    / (F.col("n_r") + F.col("n_n"))
                ),
                6,
            ).alias("ks_lambda"),
        )
        .select("n_r", "n_n", "d_stat", "ks_lambda")
    )
