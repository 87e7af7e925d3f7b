#!/usr/bin/env python
"""spark-submit entry point for the linkage pipeline.

Cluster:
  spark-submit --py-files dist/linkage_spark.zip \
      scripts/run_pipeline.py --input /path/pages_parquet \
      --workdir /path/workdir --run-id r1 [--resume]

Local smoke (same command, local master):
  spark-submit --master 'local[8]' --py-files dist/linkage_spark.zip \
      scripts/run_pipeline.py --input ... --workdir ...

With --synthetic N the input table is generated (seed-pinned) instead
of read — no external data needed for a demo run.

The script uses the ambient SparkSession from spark-submit; every
tuning knob (AQE, skew join, shuffle partitions) can be passed as
--conf, e.g. --conf spark.sql.shuffle.partitions=2000 for a large
cluster.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="pages parquet path (url, warc_ts, html, text, lang)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N entities instead of reading --input")
    p.add_argument("--workdir", required=True)
    p.add_argument("--run-id", default="run0")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--fallback-threshold", type=float, default=0.3)
    p.add_argument("--max-block-size", type=int, default=200)
    p.add_argument("--no-lsh", action="store_true")
    p.add_argument("--scorer", choices=["rule", "lr"], default="rule",
                   help="'lr' trains LogisticRegression per run on "
                        "--labeled-pairs (url_l, url_r, label parquet)")
    p.add_argument("--labeled-pairs",
                   help="labeled pairs parquet for --scorer lr and/or "
                        "edge-level P/R/F1 evaluation")
    p.add_argument("--table-format", choices=["parquet", "iceberg"],
                   default="parquet",
                   help="stage-boundary table format; 'iceberg' needs the "
                        "iceberg-spark runtime jar + a configured catalog "
                        "(fails fast with a clear message otherwise)")
    p.add_argument("--iceberg-namespace", default="linkage",
                   help="catalog namespace for --table-format iceberg")
    p.add_argument("--collapse-recrawls", action="store_true",
                   help="pre-stage: collapse canonical-url re-crawl "
                        "variants to the latest crawl before normalize")
    p.add_argument("--strip-boilerplate-min-docs", type=int, default=None,
                   help="pre-stage: strip lines occurring in >= N "
                        "distinct pages from text before normalize")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("linkage-pipeline").getOrCreate()

    from idd_hw6_record_linkage_spark.plans.pipeline import (
        LinkagePipeline,
        PipelineConfig,
    )

    if args.synthetic:
        from idd_hw6_record_linkage_spark.sources.generator import generate_pages

        pages = generate_pages(spark, args.synthetic)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        raise SystemExit("one of --input / --synthetic is required")

    cfg = PipelineConfig(
        workdir=args.workdir,
        run_id=args.run_id,
        resume=args.resume,
        score_threshold=args.threshold,
        fallback_threshold=args.fallback_threshold,
        max_block_size=args.max_block_size,
        use_lsh=not args.no_lsh,
        scorer=args.scorer,
        table_format=args.table_format,
        iceberg_namespace=args.iceberg_namespace,
        collapse_recrawls=args.collapse_recrawls,
        strip_boilerplate_min_docs=args.strip_boilerplate_min_docs,
    )
    labeled = spark.read.parquet(args.labeled_pairs) if args.labeled_pairs else None
    if args.scorer == "lr" and labeled is None:
        raise SystemExit("--scorer lr requires --labeled-pairs")
    res = LinkagePipeline(spark, cfg).run(pages, labeled_pairs=labeled)
    summary = {
        "run_id": args.run_id,
        "records": res["records"].count(),
        "pairs": res["pairs"].count(),
        "edges": res["edges"].count(),
        "clusters": res["clusters"].select("entity_id").distinct().count(),
    }
    if labeled is not None:
        prf = res["edge_prf1"]
        summary["edge_f1"] = round(prf.f1, 6)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
