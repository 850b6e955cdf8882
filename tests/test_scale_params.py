"""Cross-engine exactness of the count-derived scale parameters.

Five keys now derive a structural parameter from the corpus row count
with float math (ln/log2/sqrt/ceil) evaluated independently by Spark
and DuckDB:

- dedup_embed:              nbits   = 8 + ceil(log2(greatest(n/2000, 1)))
- dedup_semantic_cluster:   k       = greatest(8, ceil(n/250))
                            stride  = ceil(k / ceil(sqrt(k)))
- dedup_sorted_neighborhood plen    = 2 + greatest(0, ceil(ln(greatest(n/100000, 1))/ln(36)))
- shuffle_shards:           nshards = greatest(16, ceil(n/100000))

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
)


def _duck_params(n: int):
    return duckdb.sql(
        f"""
        SELECT
          cast(8 + ceil(log2(greatest({n} / 2000.0, 1.0))) AS int) AS nbits,
          greatest(8, cast(ceil({n} / 250.0) AS bigint)) AS k,
          cast(ceil(greatest(8, cast(ceil({n} / 250.0) AS bigint))
               / ceil(sqrt(greatest(8, cast(ceil({n} / 250.0) AS bigint))))) AS bigint)
            AS stride,
          cast(2 + greatest(0, ceil(ln(greatest({n} / 100000.0, 1.0)) / ln(36.0)))
               AS int) AS plen,
          greatest(16, cast(ceil({n} / 100000.0) AS bigint)) AS nshards
        """
    ).fetchone()


@pytest.fixture(scope="module")
def spark_params(spark):
    rows = spark.createDataFrame(
        [(n,) for n in BOUNDARY_NS], "n bigint"
    ).selectExpr(
        "n",
        "cast(8 + ceil(log2(greatest(n / 2000.0, 1.0))) AS int) AS nbits",
        "greatest(8L, cast(ceil(n / 250.0) AS bigint)) AS k",
        "cast(ceil(greatest(8L, cast(ceil(n / 250.0) AS bigint))"
        " / ceil(sqrt(greatest(8L, cast(ceil(n / 250.0) AS bigint))))) AS bigint)"
        " AS stride",
        "cast(2 + greatest(cast(0 AS double),"
        " ceil(ln(greatest(n / 100000.0, 1.0)) / ln(36.0))) AS int) AS plen",
        "greatest(16L, cast(ceil(n / 100000.0) AS bigint)) AS nshards",
    ).collect()
    return {r["n"]: (r["nbits"], r["k"], r["stride"], r["plen"], r["nshards"]) for r in rows}


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
