#!/usr/bin/env python
"""Sink maintenance job: fold per-micro-batch commits into one compacted
range (small-file compaction, Iceberg rewrite_data_files analog) and GC
shadowed entries. Run periodically next to a long-lived stream — scan
cost at 10^12 docs degrades with FILE COUNT, not byte count, and a
streaming sink commits a few files per trigger.

Usage:
  spark-submit --py-files dist/watermark_detector_spark.zip \
    jobs/compact.py --sink <root> [--output-partitions 8] [--no-vacuum] \
        [--sort-by col1,col2 | --zorder-by col1,col2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sink", required=True)
    ap.add_argument("--output-partitions", type=int, default=8)
    ap.add_argument("--no-vacuum", action="store_true")
    ap.add_argument("--retention-s", type=float, default=300.0,
                    help="concurrent-reader grace window before GC")
    ap.add_argument("--sort-by", default=None,
                    help="comma-separated cluster keys: range-partition + "
                         "sort-within-file rewrite so parquet min/max "
                         "stats prune whole files on key predicates")
    ap.add_argument("--zorder-by", default=None,
                    help="comma-separated Z-order columns: Morton-curve "
                         "clustered rewrite (Delta OPTIMIZE ZORDER BY "
                         "analog) keeping per-file min/max tight on "
                         "every listed column at once")
    args = ap.parse_args()

    from watermark_detector_spark.session import get_spark
    from watermark_detector_spark.streaming.sink import ExactlyOnceParquetSink

    spark = get_spark(app_name="wmd-compact")
    sink = ExactlyOnceParquetSink(args.sink, vacuum_retention_s=args.retention_s)
    entries = sink.compact(spark, output_partitions=args.output_partitions,
                           vacuum=not args.no_vacuum,
                           sort_cols=([c.strip() for c in args.sort_by.split(",")
                                       if c.strip()]
                                      if args.sort_by else None),
                           zorder_cols=([c.strip() for c in
                                         args.zorder_by.split(",") if c.strip()]
                                        if args.zorder_by else None))
    print(json.dumps({
        "sink": args.sink,
        "compacted_ranges": entries,
        "committed_batches": len(sink.committed_batches()),
        "manifest_files": sum(m["n_files"] for m in sink.manifest()),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
