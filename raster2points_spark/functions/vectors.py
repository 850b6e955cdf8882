"""Embedding-vector Column helpers — JVM-side higher-order functions
(zip_with/aggregate), no Python in the hot path.

Inputs should be ``array<double>`` (cast float embeddings once at load:
``col("embedding").cast("array<double>")``) so accumulation happens in
double regardless of storage dtype.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length array<double> columns."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(ca, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (use :func:`dot` directly for unit-norm
    embeddings — the corpus here is unit-norm, so dot == cosine)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_dist(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(ca, cb, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )
