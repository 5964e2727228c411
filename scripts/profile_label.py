import re
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from py_image_toolkit_spark.functions import vocab as V
from py_image_toolkit_spark.session import build_session

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
aqe = sys.argv[2] if len(sys.argv) > 2 else "true"
spark = build_session("lprof", master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.driver.memory": "24g",
                                  "spark.sql.adaptive.enabled": aqe})
spark.sparkContext.setLogLevel("ERROR")

toks = ["주민등록증", "김첨지", "123456-1234567", "서울특별시", "2021", "수표로",
        "the", "value", "종로구청장", "부가정보"]
df = (
    spark.range(n, numPartitions=32)
    .withColumn("url", (F.col("id") % 20000).cast("string"))
    .withColumn("seq", F.col("id"))
    .withColumn("token", F.element_at(F.array(*[F.lit(x) for x in toks]),
                                      (F.col("id") % 10 + 1).cast("int")))
    .persist()
)
print("rows:", df.count(), flush=True)


def ts(name, d):
    t0 = time.time()
    d.write.mode("overwrite").format("noop").save()
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)


t = F.col("token")
veto = t.rlike("|".join(re.escape(k) for k in V.NAME_VETO_KEYWORDS))
ts("single big rlike (44-alt)", df.withColumn("x", veto.cast("int")))

chain = t
contains_chain = t.contains(V.NAME_VETO_KEYWORDS[0])
for k in V.NAME_VETO_KEYWORDS[1:]:
    contains_chain = contains_chain | t.contains(k)
ts("44 Contains OR-chain", df.withColumn("x", contains_chain.cast("int")))

ts("15 small rlikes", df.withColumn("x", sum(
    (t.rlike(p).cast("int") for p in [V.RRN_DASHED_RE, V.YEAR_RE, V.MONTH_RE, V.DAY_RE,
                                      V.ADDR_UNIT_RE, V.ADDR_ROAD_RE, V.ADDR_SUFFIX_RE,
                                      V.ADDR_NUMERIC_RE, V.NAME_RE] * 2),
    F.lit(0))))

w = Window.partitionBy("url").orderBy("seq")
ts("window lag only", df.withColumn("x", F.lag("token").over(w)))

from py_image_toolkit_spark.operators.extract_fields import label_pass1
ts("label_pass1 full", label_pass1(df.select("url", "seq", "token"), keys=("url",)))
print("LPROF-DONE", flush=True)
