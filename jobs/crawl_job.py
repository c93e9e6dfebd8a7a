"""spark-submit entrypoint for the crawl-frontier engine.

The north-rule deployment shape: the engine ships as a plain Python
package zip and runs on any Spark cluster via

    zip -r /tmp/mnc.zip mizzounewscrawler_spark
    spark-submit --master <cluster> --py-files /tmp/mnc.zip \
        jobs/crawl_job.py --out /data/crawl \
        --pages s3://…/pages --seeds s3://…/seeds --robots s3://…/robots \
        --waves 100 --bucket-sweep 16

No session is built here — spark-submit owns master/deploy-mode/executor
sizing; the job only reads its SparkSession.  All engine imports happen
AFTER getOrCreate() so the --py-files zip is already on sys.path.

Re-running with the same --out resumes from the last committed frontier
snapshot (checkpoint semantics — no URL re-fetched or re-seen).

``--synthetic H:P:SEED`` generates the deterministic fixture web in-job
(smoke tests / sandbox runs); production passes the three parquet/Iceberg
table paths instead.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    ap = argparse.ArgumentParser(description="crawl-frontier spark-submit job")
    ap.add_argument("--out", required=True, help="lake output directory")
    ap.add_argument("--pages", help="pages table path (url, warc_ts, html, text, lang)")
    ap.add_argument("--seeds", help="seeds table path")
    ap.add_argument("--robots", help="robots table path")
    ap.add_argument(
        "--synthetic",
        help="H:P:SEED — generate a deterministic synthetic web instead of reading tables",
    )
    ap.add_argument("--waves", type=int, default=10)
    ap.add_argument("--wave-duration", type=float, default=60.0)
    ap.add_argument("--max-per-host", type=int, default=3)
    ap.add_argument("--max-depth", type=int, default=10)
    ap.add_argument("--bucket-sweep", type=int, default=0)
    ap.add_argument("--bloom-capacity", type=int, default=1_000_000)
    ap.add_argument("--url-seen-filter", choices=("bloom", "cuckoo"),
                    default="bloom",
                    help="pre-filter family: append-only bloom or the "
                         "deletable cuckoo (frontier retraction)")
    ap.add_argument("--sharded", action="store_true",
                    help="shard-aligned probe: per-shard filter files, no "
                         "whole-filter broadcast (the 10^10 design point)")
    ap.add_argument("--shard-bits", type=int, default=4)
    ap.add_argument("--order-log", action="store_true",
                    help="global (wave, seq) order artifact (single-partition sort)")
    ap.add_argument("--recrawl-sources", action="store_true",
                    help="perpetual mode: cadence-gated source re-fetch")
    ap.add_argument("--seed-frontier", help="optional parquet of raw seed urls (column: url)")
    ap.add_argument("--trap-guard", type=int, default=0,
                    help="block URL path-templates carrying more than this "
                    "many distinct URLs (0 = off)")
    return ap.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mnc-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # engine imports AFTER getOrCreate(): --py-files lands on sys.path with
    # the SparkContext
    from mizzounewscrawler_spark.crawl import CrawlConfig, run_crawl

    if args.synthetic:
        h, p, s = (int(x) for x in args.synthetic.split(":"))
        from mizzounewscrawler_spark.sources.generator import generate_web_spark

        pages, seeds, robots = generate_web_spark(
            spark, seed=s, n_hosts=h, target_pages=p
        )
        pages = pages.cache()
    else:
        if not (args.pages and args.seeds and args.robots):
            raise SystemExit("--pages/--seeds/--robots required without --synthetic")
        pages = spark.read.parquet(args.pages)
        seeds = spark.read.parquet(args.seeds)
        robots = spark.read.parquet(args.robots)

    cfg = CrawlConfig(
        max_waves=args.waves,
        wave_duration=args.wave_duration,
        max_per_host=args.max_per_host,
        max_depth=args.max_depth,
        bucket_sweep=args.bucket_sweep,
        bloom_capacity=args.bloom_capacity,
        url_seen_filter=args.url_seen_filter,
        bloom_sharded=args.sharded,
        bloom_shard_bits=args.shard_bits,
        with_order_log=args.order_log,
        recrawl_sources=args.recrawl_sources,
        trap_guard_max=args.trap_guard,
    )
    initial = (
        spark.read.parquet(args.seed_frontier) if args.seed_frontier else None
    )
    stats = run_crawl(spark, pages, seeds, robots, args.out, cfg,
                      initial_frontier=initial)
    print(json.dumps({k: v for k, v in stats.items() if not k.startswith("_")}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
