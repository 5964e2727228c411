import json, os, sys, time, urllib.request
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.fixtures import pages_df
from py_image_toolkit_spark.plans.pipeline import extract
from py_image_toolkit_spark.session import build_session

cpus = int(sys.argv[1]); n = int(sys.argv[2])
spark = build_session(f"diag-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus,
                      extra_conf={"spark.driver.memory": "24g", "spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
src = f"/tmp/bpages_{n}"
if not os.path.exists(src + "/_SUCCESS"):
    pages_df(spark, n, partitions=64).write.mode("overwrite").parquet(src)
pages = spark.read.parquet(src)
import tempfile, shutil
stg = tempfile.mkdtemp()
t0 = time.time()
extract(pages, ExtractConfig(), num_partitions=cpus*2, staging_dir=os.path.join(stg, "b")).write.mode("overwrite").parquet("/tmp/diag_sink")
wall = time.time() - t0
print(f"wall: {wall:.1f}s", flush=True)

app = json.load(urllib.request.urlopen("http://localhost:4040/api/v1/applications"))[0]["id"]
stages = json.load(urllib.request.urlopen(f"http://localhost:4040/api/v1/applications/{app}/stages?status=complete"))
tot_run = 0
rows = []
for s in stages:
    dur = (s.get("executorRunTime") or 0) / 1000
    tot_run += dur
    rows.append((dur, s["stageId"], s["numCompleteTasks"], s["name"].split("\n")[0][:60],
                 (s.get("jvmGcTime") or 0)/1000, (s.get("memoryBytesSpilled") or 0)/1e6))
rows.sort(reverse=True)
print(f"total executor run time: {tot_run:.0f} core-s ; wall*cores = {wall*cpus:.0f} ; utilization = {tot_run/(wall*cpus)*100:.0f}%")
for dur, sid, ntasks, name, gc, spill in rows[:10]:
    print(f"stage {sid}: {dur:7.1f} core-s  tasks={ntasks:4d}  gc={gc:6.1f}s spillMB={spill:7.0f}  {name}", flush=True)
for dur, sid, ntasks, name, gc, spill in rows[:3]:
    det = [x for x in stages if x["stageId"] == sid][0].get("details", "")
    print(f"  stage {sid} details: {det[:500]}", flush=True)
shutil.rmtree(stg, ignore_errors=True)
print("DIAG-DONE", flush=True)
