"""Drive the driver contract the way the driver would: vanilla session
with hostile confs (non-UTC timezone, ANSI on, no nanos conf, odd
shuffle-partition count), imported from a foreign cwd, then call
entry() and a sample of queries().

Usage: cd /tmp && python /root/repo/tools/drive_entry.py [query ...]
"""
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.sql.shuffle.partitions", "7")
    .getOrCreate()
)
print("== entry() smoke ==")
df = e.entry(spark)
rows = df.collect()
print("schema:", df.schema.simpleString())
print("rows:", len(rows))
for r in sorted(rows, key=lambda r: (r[0], r[1]))[:2]:
    print(r)

names = sys.argv[1:] or [
    "q08_time_features", "q29_events_hourly", "q40_minhash_pairs",
    "q41_simhash_pairs", "q42_lsh_embedding_pairs", "q43_ivf_topk",
    "q44_multimodal_features", "q45_quality_scores", "q46_random_split",
    "q47_ml_classifier", "q48_ml_kmeans", "q49_feature_pipeline",
    "q50_streaming_hourly",
]
qs = e.queries()
failed = 0
for n in names:
    try:
        out = qs[n](spark, "/root/testdata/sf0.001")
        c = out.count()
        print(f"OK   {n}: {c} rows, schema {out.schema.simpleString()[:100]}")
    except Exception as exc:  # noqa: BLE001
        failed += 1
        print(f"FAIL {n}: {type(exc).__name__}: {str(exc)[:200]}")
spark.stop()
sys.exit(1 if failed else 0)
