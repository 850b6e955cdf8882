"""Reusable Column-level function library (JVM-side, codegen-friendly).

- :mod:`.text` — tokenizers, shingles, portable token hashing,
  fingerprints.
- :mod:`.vectors` — dot/cosine/L2 over array<double> embeddings via
  higher-order functions.
"""

from raster2points_spark.functions.text import (  # noqa: F401
    bag_fingerprint,
    shingles,
    token_hash,
    tokens,
)
from raster2points_spark.functions.vectors import (  # noqa: F401
    cosine,
    dot,
    l2_dist,
    l2_norm,
)
