#!/usr/bin/env python
"""Drive the custom warcish DataSource end-to-end under the north
rule's launch mode: spark-submit --py-files on a multi-executor
cluster. Writes n synthetic pages through the source's writer (tasks
on separate executor JVMs — the DataSource class must round-trip
through the py-files zip, not the driver working tree), reads them
back through its reader with a pushed metadata filter, and prints one
JSON line {written, read, read_en}.

Usage:
  spark-submit --py-files dist/watermark_detector_spark.zip \
    jobs/warcish_roundtrip.py --out <dir> [--n 1000]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=1000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from watermark_detector_spark.sources import warcish

    spark = SparkSession.builder.appName("warcish-roundtrip").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # register() also enables the python filterPushdown conf — a direct
    # dataSource.register() on this vanilla session would hard-fail the
    # read with DATA_SOURCE_PUSHDOWN_DISABLED (the round-5 q84 red row)
    warcish.register(spark)

    df = (
        spark.range(args.n)
        .select(
            F.concat(F.lit("https://site"), (F.col("id") % 20).cast("string"),
                     F.lit(".com/p/"), F.col("id").cast("string")).alias("url"),
            (F.to_timestamp(F.lit("2025-01-01 00:00:00"))
             + F.make_interval(secs=F.col("id").cast("double"))).alias("warc_ts"),
            F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
            F.encode(F.concat(F.lit("<p>page "), F.col("id").cast("string"),
                              F.lit("</p>")), "UTF-8").alias("html"),
        )
    )
    df.repartition(4).write.format("warcish").mode("overwrite").save(args.out)
    back = spark.read.format("warcish").load(args.out)
    print(json.dumps({
        "written": args.n,
        "read": back.count(),
        "read_en": back.where("lang = 'en'").count(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
