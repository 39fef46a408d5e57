"""Isolated per-query profiler for the r12 optimization round.

Usage: python plans/r12/profile_query.py <query> [<query> ...] [--runs N]
       [--plan-suffix before|after]

For each named gate query: builds the DataFrame, writes the
``.explain("formatted")`` output to ``plans/r12/<query>_<suffix>.txt``,
then times ``N`` noop-sink executions (guide §1.4) and prints the runs
plus the min.  Jobs are labelled via ``setJobDescription`` (guide §1.5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from blockchain_data_engineering_spark.plans import EXTRA_QUERIES, QUERIES
from blockchain_data_engineering_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 3
    suffix = "before"
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    if "--plan-suffix" in args:
        i = args.index("--plan-suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    names = args

    spark = get_spark(app_name="bde-profile")
    spark.range(1).count()  # JVM warmup outside any timing

    allq = {**QUERIES, **EXTRA_QUERIES}
    for name in names:
        fn = allq[name]
        spark.sparkContext.setJobDescription(f"profile:{name}:plan")
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(HERE, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        spark.catalog.clearCache()
        samples = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"profile:{name}:run{r}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(
            f"{name}: runs={[round(s, 3) for s in samples]} "
            f"min={min(samples):.3f} load1m={os.getloadavg()[0]:.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
