"""Per-query isolation bench (guide §1.4) — NOT the frozen bench.py.

Times individual headline queries with the noop sink under the same
session config bench.py uses, with optional repeats, and can dump
``explain("formatted")`` for each query to plans/r06/.

Usage:
    python bench_extra.py q1 q2 ...        # time the named queries
    python bench_extra.py --all            # time every headline query
    python bench_extra.py --explain q1 ... # dump plans instead of timing
    python bench_extra.py --repeats 3 q1   # min-of-3
    python bench_extra.py --flagship       # time the flagship pipeline
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import __spark_entry__ as entry_mod
    from bench import HEADLINE_QUERIES
    from idd_hw6_record_linkage_spark.session import get_spark

    args = [a for a in sys.argv[1:]]
    repeats = 1
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    explain_mode = "--explain" in args
    args = [a for a in args if a != "--explain"]
    suffix = "after" if "--after" in args else "before"
    args = [a for a in args if a != "--after"]
    do_flagship = "--flagship" in args
    args = [a for a in args if a != "--flagship"]
    names = HEADLINE_QUERIES if "--all" in args else [a for a in args if not a.startswith("-")]

    spark = get_spark(master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # Same warmup the frozen bench uses.
    queries["rl_pair_features"](spark, SF_DIR).write.format("noop").mode(
        "overwrite").save()

    if explain_mode:
        os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
        for name in names:
            df = queries[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(REPO, "plans", "r06", f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path}")
        spark.stop()
        return

    timings: dict[str, float] = {}
    for name in names:
        samples = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            df = queries[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        timings[name] = min(samples)
        print(json.dumps({"query": name, "sec": min(samples),
                          "samples": samples,
                          "load_1m": round(os.getloadavg()[0], 2)}),
              flush=True)

    if do_flagship:
        from idd_hw6_record_linkage_spark.sources.generator import generate_raw
        from idd_hw6_record_linkage_spark.plans.pipeline import run_in_memory

        flagship_n = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_ENTITIES", "4200"))
        samples = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription("bench_extra: flagship")
            t0 = time.time()
            raw = generate_raw(spark, flagship_n, partitions=32)
            pages = raw.select("url", "warc_ts", "html", "text", "lang")
            res = run_in_memory(spark, pages)
            res["clusters"].write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        timings["flagship_pipeline"] = min(samples)
        print(json.dumps({"query": "flagship_pipeline", "sec": min(samples),
                          "samples": samples,
                          "load_1m": round(os.getloadavg()[0], 2)}), flush=True)

    print(json.dumps({"total": round(sum(timings.values()), 3),
                      "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
