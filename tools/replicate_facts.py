"""Build an N× fact-replicated fixture for scale extrapolation (dev tool).

Replicates the FACT tables of an sf dir with disjoint keys so joins stay
consistent (lineitem/orders shift l_orderkey/o_orderkey by copy·offset;
documents shift doc_id and suffix lang with the copy id so language-blocked
dedup sees N independent shards rather than N× artificial duplicates);
dimension tables (and events/embeddings) are copied unchanged. This is the
"10× extrapolation check" harness from SCALE.md.

Usage:
  python tools/replicate_facts.py /root/testdata/sf0.1 /tmp/sf0.1_x10 10
  python tools/time_queries.py q204 --sf ...   # then time against both
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_trans_spark.catalog import table  # noqa: E402
from hadoop_trans_spark.session import get_spark  # noqa: E402

COPY_ASIS = ["region", "nation", "customer", "supplier", "part", "events", "embeddings"]


def main() -> None:
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    spark = get_spark(app_name="replicate_facts")

    for t in COPY_ASIS:
        s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        if not os.path.exists(s):
            continue
        # Always refresh: a reused dst with a different src would
        # otherwise silently mix old dimensions with new facts.
        if os.path.isdir(d):
            shutil.rmtree(d)
        elif os.path.exists(d):
            os.remove(d)
        # src may be a single file (driver fixtures) or a Spark-written
        # parquet directory (e.g. this tool's own output).
        if os.path.isdir(s):
            shutil.copytree(s, d)
        else:
            shutil.copy(s, d)

    okey_off = (
        table(spark, src, "orders").agg(F.max("o_orderkey")).first()[0] + 1
    )
    copies = spark.range(n).select(F.col("id").alias("copy"))

    o = table(spark, src, "orders")
    (
        o.crossJoin(copies)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("copy") * okey_off)
        .drop("copy")
        .write.mode("overwrite")
        .parquet(f"{dst}/orders.parquet")
    )
    li = table(spark, src, "lineitem")
    (
        li.crossJoin(copies)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("copy") * okey_off)
        .drop("copy")
        .write.mode("overwrite")
        .parquet(f"{dst}/lineitem.parquet")
    )
    docs = table(spark, src, "documents")
    did_off = docs.agg(F.max("doc_id")).first()[0] + 1
    (
        docs.crossJoin(copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("copy") * did_off)
        .withColumn("lang", F.concat_ws("-", "lang", F.col("copy").cast("string")))
        .drop("copy")
        .write.mode("overwrite")
        .parquet(f"{dst}/documents.parquet")
    )
    for t in ["orders", "lineitem", "documents"]:
        print(t, spark.read.parquet(f"{dst}/{t}.parquet").count())


if __name__ == "__main__":
    main()
