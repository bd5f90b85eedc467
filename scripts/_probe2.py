import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

from setsm_postprocessing_python_spark.session import get_spark  # noqa: E402

spark = get_spark(parallelism=32, app_name="probe_minhash")
spark.sparkContext.setLogLevel("ERROR")
d = "/tmp/bench_amp/sf0.1_x40_e8"
qs = bench.headline_queries()
for rep in range(3):
    t = time.time()
    bench.materialize(qs["minhash_lsh"](spark, d))
    print(f"RESULT rep{rep}: {time.time()-t:.1f}s", flush=True)
spark.stop()
