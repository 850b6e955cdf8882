"""One-off audit: per key, count parquet scan NODE DEFINITIONS per
table location in the formatted physical plan at sf0.001.  A table
scanned >=3 times in one plan is a duplicate-subtree smell (self-joins
legitimately scan twice)."""
import os, re, sys, collections

sys.path.insert(0, "/root/repo")
from raster2points_spark.plans import explain_formatted
from raster2points_spark.registry import load_all
from raster2points_spark.session import get_spark

SF = "/root/testdata/sf0.001"
registry = load_all()
spark = get_spark("audit")

rows = []
for key, spec in sorted(registry.items()):
    if key.startswith("stream_"):
        continue
    try:
        plan = explain_formatted(spec.fn(spark, SF))
    except Exception as e:
        print(f"{key}: ERROR {type(e).__name__}: {e}", flush=True)
        continue
    # node defs look like "(12) Scan parquet" followed by detail lines
    # incl. "Location: InMemoryFileIndex [...path...]"
    counts = collections.Counter()
    cur = None
    for line in plan.splitlines():
        m = re.match(r"\((\d+)\) Scan parquet", line)
        if m:
            cur = m.group(1)
            continue
        if cur and "Location:" in line:
            mm = re.search(r"\[([^\]]*)\]", line)
            loc = os.path.basename(mm.group(1).split(",")[0]) if mm else "?"
            counts[loc] += 1
            cur = None
    total = sum(counts.values())
    worst = counts.most_common(1)[0] if counts else ("-", 0)
    imr = plan.count("InMemoryRelation (")
    rows.append((worst[1], total, key, dict(counts), imr))

rows.sort(reverse=True)
print(f"{'max/tab':>7} {'tot':>4} {'IMR':>3}  key  per-table")
for worst, total, key, counts, imr in rows:
    if total >= 3 or worst >= 2:
        print(f"{worst:>7} {total:>4} {imr:>3}  {key}  {counts}")
