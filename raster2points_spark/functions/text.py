"""Composable text Column helpers (the JVM-side fast path).

Everything here returns a pyspark Column built purely from built-in
functions — usable in any select/filter and fully codegen'd.  These are
the building blocks behind the §2.9 text/dedup operators.

PERF CONTRACT: helpers taking ``toks`` expect a MATERIALIZED array
column (``df.withColumn("toks", tokens("text"))``), never an inline
expression — Spark re-evaluates inlined expressions per element access
inside lambda functions (measured 150x slowdown; see queries/llm.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Lower-cased whitespace tokens, empties dropped."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), " "), lambda x: x != "")


def shingles(toks: Column | str, n: int = 3) -> Column:
    """Distinct n-gram shingles of a materialized token-array column."""
    t = F.col(toks) if isinstance(toks, str) else toks
    gram = lambda i: F.concat_ws(" ", *[F.element_at(t, i + F.lit(k) + 1) for k in range(n)])
    return F.when(
        F.size(t) >= n,
        F.array_distinct(F.transform(F.sequence(F.lit(0), F.size(t) - n), gram)),
    ).otherwise(F.array().cast("array<string>"))


def token_hash(w: Column | str, seed: int | None = None) -> Column:
    """60-bit bigint hash of a token via md5 (engine-portable: DuckDB
    reproduces it with cast(concat('0x', substr(md5(w),1,15)) as bigint))."""
    c = F.col(w) if isinstance(w, str) else w
    if seed is not None:
        c = F.concat(c, F.lit(f"#{seed}"))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def bag_fingerprint(toks: Column | str) -> Column:
    """Order-insensitive doc fingerprint: md5 of the sorted distinct
    token bag."""
    t = F.col(toks) if isinstance(toks, str) else toks
    return F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(t))))
