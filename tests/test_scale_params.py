"""Cross-engine exactness of the count-derived scale parameters.

Five keys now derive a structural parameter from the corpus row count
with float math (ln/log2/sqrt/ceil) evaluated independently by Spark
and DuckDB:

- dedup_embed:              nbits   = least(16, 8 + ceil(log2(greatest(n/2000, 1))))
                            (the cap is EXPLICIT at the formula site in
                            both engines since r8 — past n = 512k the
                            bucket-size-constant claim plateaus and the
                            formula says so, ADVICE r7 #1)
- dedup_semantic_cluster:   k       = greatest(8, ceil(n/250))
                            stride  = ceil(k / ceil(sqrt(k)))
- dedup_sorted_neighborhood plen    = 2 + greatest(0, ceil(ln(greatest(n/100000, 1))/ln(36)))
- shuffle_shards:           nshards = greatest(16, ceil(n/100000))
- sim_ivf:                  ivfk    = greatest(8, ceil(sqrt(n)))
                            ivfstride = ceil(ivfk / ceil(sqrt(ivfk)))

If the two engines ever rounded differently at some n, their bucket /
block / shard universes would silently diverge and the oracle gate
would fail far from the cause.  This test evaluates all five formulas
in BOTH engines over a boundary-heavy grid of n (exact powers where
log2/ln cross integers, ±1 neighbors, and the shipped corpus sizes)
and asserts bit-equality — the same discipline as the r7 HLL-mantissa
and exact-cents properties.
"""

from __future__ import annotations

import duckdb
import pytest

BOUNDARY_NS = sorted(
    {1, 2, 5, 20, 50, 199, 200, 500, 2000, 5000, 50000, 500000}
    | {2000 * (2**j) for j in range(0, 12)}
    | {2000 * (2**j) + d for j in range(0, 12) for d in (-1, 1)}
    | {100000 * (36**j) for j in range(0, 3)}
    | {100000 * (36**j) + d for j in range(0, 3) for d in (-1, 1)}
    | {250 * j for j in range(1, 40)}
    | {100000 * j + d for j in range(1, 5) for d in (-1, 0, 1)}
    | {j * j + d for j in (2, 3, 5, 14, 45, 142, 449, 1415) for d in (-1, 0, 1)}
)


def _duck_params(n: int):
    return duckdb.sql(
        f"""
        SELECT
          cast(least(16, 8 + ceil(log2(greatest({n} / 2000.0, 1.0)))) AS int) AS nbits,
          greatest(8, cast(ceil({n} / 250.0) AS bigint)) AS k,
          cast(ceil(greatest(8, cast(ceil({n} / 250.0) AS bigint))
               / ceil(sqrt(greatest(8, cast(ceil({n} / 250.0) AS bigint))))) AS bigint)
            AS stride,
          cast(2 + greatest(0, ceil(ln(greatest({n} / 100000.0, 1.0)) / ln(36.0)))
               AS int) AS plen,
          greatest(16, cast(ceil({n} / 100000.0) AS bigint)) AS nshards,
          greatest(8, cast(ceil(sqrt({n})) AS bigint)) AS ivfk,
          cast(ceil(greatest(8, cast(ceil(sqrt({n})) AS bigint))
               / ceil(sqrt(greatest(8, cast(ceil(sqrt({n})) AS bigint))))) AS bigint)
            AS ivfstride
        """
    ).fetchone()


@pytest.fixture(scope="module")
def spark_params(spark):
    rows = spark.createDataFrame(
        [(n,) for n in BOUNDARY_NS], "n bigint"
    ).selectExpr(
        "n",
        "cast(least(16, 8 + ceil(log2(greatest(n / 2000.0, 1.0)))) AS int) AS nbits",
        "greatest(8L, cast(ceil(n / 250.0) AS bigint)) AS k",
        "cast(ceil(greatest(8L, cast(ceil(n / 250.0) AS bigint))"
        " / ceil(sqrt(greatest(8L, cast(ceil(n / 250.0) AS bigint))))) AS bigint)"
        " AS stride",
        "cast(2 + greatest(cast(0 AS double),"
        " ceil(ln(greatest(n / 100000.0, 1.0)) / ln(36.0))) AS int) AS plen",
        "greatest(16L, cast(ceil(n / 100000.0) AS bigint)) AS nshards",
        "greatest(8L, cast(ceil(sqrt(n)) AS bigint)) AS ivfk",
        "cast(ceil(greatest(8L, cast(ceil(sqrt(n)) AS bigint))"
        " / ceil(sqrt(greatest(8L, cast(ceil(sqrt(n)) AS bigint))))) AS bigint)"
        " AS ivfstride",
    ).collect()
    return {
        r["n"]: (r["nbits"], r["k"], r["stride"], r["plen"], r["nshards"], r["ivfk"], r["ivfstride"])
        for r in rows
    }


def test_scale_params_match_across_engines(spark_params):
    for n in BOUNDARY_NS:
        duck = _duck_params(n)
        assert spark_params[n] == duck, (
            f"n={n}: spark {spark_params[n]} != duckdb {duck} — a "
            f"cross-engine rounding split in a count-derived parameter"
        )


def test_shipped_scales_keep_historical_parameters(spark_params):
    # the backward-compat contract every fix claims: at shipped corpus
    # sizes the derived parameters equal the historical constants
    for n in (20, 200, 2000):        # embeddings at sf0.001/0.01/0.1
        assert spark_params[n][0] == 8   # nbits
        assert spark_params[n][1] == 8   # k anchors
    for n in (50, 500, 5000):        # documents at sf0.001/0.01/0.1
        assert spark_params[n][3] == 2   # plen
        assert spark_params[n][4] == 16  # nshards


def test_nbits_cap_is_explicit(spark_params):
    # ADVICE r7 #1: past n = 512k the formula must plateau at
    # _SRP_MAX_BITS = 16 rather than silently exceeding the
    # materialized sign bits (the old implicit slice-clamp).
    assert spark_params[512000][0] == 16          # exactly at the knee
    for n in (1024000, 2048000, 4096000):         # 2000 * 2^(9..11)
        assert spark_params[n][0] == 16, f"n={n}: cap not enforced"
