import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

from setsm_postprocessing_python_spark.session import get_spark  # noqa: E402

spark = get_spark(parallelism=32, app_name="bench_probe2")
spark.sparkContext.setLogLevel("ERROR")
d = "/tmp/bench_amp/sf0.1_x40_e8"
qs = bench.headline_queries()
names = sys.argv[1:] or ["knn", "ring_density", "mask_filter", "dedup_exact",
                         "fingerprint", "diff_strips", "feather_blend",
                         "ann_lsh", "minhash_lsh"]
for name in names:
    t = time.time()
    try:
        bench.materialize(qs[name](spark, d))
        print(f"RESULT {name}: {time.time()-t:.1f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"RESULT {name}: FAIL {type(e).__name__} {str(e)[:200]}",
              flush=True)
spark.stop()
