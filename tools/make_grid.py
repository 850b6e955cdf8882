"""Regenerate the deterministic grid fixtures (seed 42) under
fixtures/grid/.  Pure numpy+pyarrow — no Spark, no rasterio."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raster2points_spark.sources.tiles import write_grid_fixtures

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "grid"
    )
    for name, path in write_grid_fixtures(out).items():
        print(name, "->", path)
