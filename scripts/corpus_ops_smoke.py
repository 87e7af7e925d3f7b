"""Scale smoke for the corpus-curation operator family: synthesize a
multi-million-row documents table (deterministic, no external data),
run line-dedup, span-dedup, sampling, shard packing, PII redaction and
the compression signal end-to-end, and print one timing row each plus
sanity counters.

Usage: python scripts/corpus_ops_smoke.py [n_docs] [cpus]
Defaults: 2_000_000 docs, 32 cores. Prints one JSON line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from idd_hw6_record_linkage_spark.functions import compress_signal, pii
    from idd_hw6_record_linkage_spark.operators import (
        line_dedup,
        sampling,
        span_dedup,
    )
    from idd_hw6_record_linkage_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="corpus-smoke",
                      shuffle_partitions=cpus * 2)

    # Deterministic corpus: ~60-token docs from a 40-word vocabulary,
    # every 7th doc carries a shared boilerplate line, every 11th doc
    # embeds a verbatim 12-token span, sources cycle src0..src9.
    vocab = [f"w{i:02d}" for i in range(40)]
    words = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda j: F.element_at(
            F.array(*[F.lit(w) for w in vocab]),
            (
                (F.xxhash64(F.col("doc_id") * 64 + j) % 40 + 40) % 40 + 1
            ).cast("int"),
        ),
    )
    shared_span = " ".join(vocab[:12])
    docs = (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "text",
            F.concat_ws(
                "\n",
                F.when(F.col("doc_id") % 7 == 0,
                       F.lit("accept all cookies to continue")),
                F.when(F.col("doc_id") % 11 == 0, F.lit(shared_span)),
                F.array_join(words, " "),
            ),
        )
        .withColumn(
            "source",
            F.concat(F.lit("src"), (F.col("doc_id") % 10).cast("string")),
        )
        .withColumn("n_tok", F.size(F.split(F.trim("text"), r"\s+")))
    )
    # Stage to parquet (NOT localCheckpoint): at 10M+ docs the block
    # manager holding the whole generated corpus in executor memory
    # fights the operators for heap (measured: GCLocker allocation
    # retries + executor deaths); a parquet stage reads back at disk
    # speed and leaves the heap to the operators.
    import tempfile

    stage = tempfile.mkdtemp(prefix="corpus_smoke_")
    docs.write.mode("overwrite").parquet(f"{stage}/docs")
    docs = spark.read.parquet(f"{stage}/docs")
    n = docs.count()
    out: dict[str, float | int] = {"n_docs": n, "cpus": cpus}

    t0 = time.time()
    ld = line_dedup.remove_boilerplate_lines(
        docs, "doc_id", "text", min_docs=1000
    )
    out["line_dedup_removed"] = int(
        ld.agg(F.sum("n_removed")).collect()[0][0]
    )
    out["line_dedup_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    sd = span_dedup.span_dup_stats(
        docs, "doc_id", "text", window=12, stride=4, min_docs=1000
    )
    out["span_dup_docs"] = sd.where(F.col("n_dup_windows") > 0).count()
    out["span_dedup_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    samp = sampling.sample_corpus(
        docs, "doc_id", {"src0": 1.0, "src1": 0.5}, default_rate=0.1
    )
    out["sampled"] = samp.count()
    out["sample_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    packed = sampling.pack_shards(samp, "doc_id", "n_tok", 100_000)
    out["shards"] = packed.agg(F.max("shard_id")).collect()[0][0] + 1
    out["pack_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    red = docs.select(pii.redact_pii_expr("text").alias("t"))
    out["redacted_chars"] = int(
        red.agg(F.sum(F.length("t"))).collect()[0][0]
    )
    out["pii_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    cr = docs.select(compress_signal.compression_ratio("text").alias("c"))
    out["mean_compression"] = round(
        float(cr.agg(F.avg("c")).collect()[0][0]), 4
    )
    out["compress_sec"] = round(time.time() - t0, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
