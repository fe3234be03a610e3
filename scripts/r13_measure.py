"""r13 optimization-round measurement harness.

Usage:
  python scripts/r13_measure.py explain <query> [<query> ...] [--tag before|after]
      Capture .explain('formatted') of each query at $SPARK_GRAFT_SF_DIR
      (default sf0.1) into plans/r13/<query>_<tag>.txt.  The plan is taken
      AFTER one execution so AQE-final shapes are visible in the SQL-tab
      sense (explain still prints the initial plan; the executed plan
      string is appended below it).
  python scripts/r13_measure.py time <query> [<query> ...] [--runs 3]
      Time each query with the bench methodology (count(), cold + warm
      min) and print one JSON line per query.

Bench methodology matches bench.py: timing = plan + execute via .count(),
per-query cache scrub between runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgdedupe_spark import get_spark, registry  # noqa: E402


def _scrub(spark) -> None:
    spark.catalog.clearCache()
    try:
        jsc = spark.sparkContext._jsc
        for jrdd in jsc.getPersistentRDDs().values():
            jrdd.unpersist(False)
    except Exception:
        pass


def main() -> None:
    mode = sys.argv[1]
    args = sys.argv[2:]
    tag = "before"
    runs = 3
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r13-measure")
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "explain":
        out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            spark.sparkContext.setJobDescription(f"r13 explain: {name}")
            df = registry.QUERIES[name](spark, sf_dir)
            initial = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            df.count()  # execute so AQE finalizes
            executed = df._jdf.queryExecution().executedPlan().toString()
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(f"== {name} @ {sf_dir} ==\n\n")
                fh.write("== explain('formatted'), initial plan ==\n")
                fh.write(initial)
                fh.write("\n\n== executed (AQE-final) physical plan ==\n")
                fh.write(executed)
                fh.write("\n")
            _scrub(spark)
            print(f"wrote {name}_{tag}.txt")
    elif mode == "time":
        for name in names:
            fn = registry.QUERIES[name]
            times = []
            for _ in range(runs):
                spark.sparkContext.setJobDescription(f"r13 time: {name}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                times.append(round(time.perf_counter() - t0, 3))
                _scrub(spark)
            print(json.dumps({
                "name": name,
                "cold": times[0],
                "warm": round(min(times[1:]), 3) if len(times) > 1 else None,
                "all": times,
            }))
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
