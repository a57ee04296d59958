"""spark-submit entry point: build (or resume) the inverted index.

Cluster usage:
    zip -r simdocs.zip similardocs_spark
    spark-submit --py-files simdocs.zip scripts/build_index_cli.py \
        --transcripts <parquet-or-iceberg-path> --out <index-root> \
        [--seg-size 1048576] [--seg-batches 8] [--resume] [--docs-meta <path>]

Local smoke:
    python scripts/build_index_cli.py --transcripts fixtures/transcripts.parquet --out /tmp/idx
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--transcripts", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--docs-meta", default=None)
    p.add_argument("--seg-size", type=int, default=1 << 20)
    p.add_argument("--seg-batches", type=int, default=1)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--master", default=None, help="override master (default: from spark-submit)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("similardocs-build")
    if args.master:
        b = b.master(args.master)
    spark = b.config("spark.sql.execution.arrow.pyspark.enabled", "true").getOrCreate()

    from similardocs_spark.index.build import build_index

    t0 = time.time()
    transcripts = spark.read.parquet(args.transcripts)
    meta = spark.read.parquet(args.docs_meta) if args.docs_meta else None
    build_index(
        spark, transcripts, args.out, docs_meta=meta,
        seg_size=args.seg_size, seg_batches=args.seg_batches, resume=args.resume,
    )
    print(f"index built at {args.out} in {time.time() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
