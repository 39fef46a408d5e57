"""Benchmark runner: executes the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock over all benchmark queries (each
executed to completion via a count-collecting action).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from blockchain_data_engineering_spark.plans import QUERIES
from blockchain_data_engineering_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline queries: the flagship slice + the operators whose scale
# behavior matters most (shuffle-heavy joins/aggs, window analytics,
# LLM-data extension ops).
HEADLINE = [
    "pricing_summary",
    "explode_normalize",
    "netflow_supplier_part",
    "dim_enrich_volumes",
    "vol_rollup_by_block",
    "topk_semi_join",
    "events_cma",
    "events_share_by_day",
    "transfer_edges_cross",
    "dedup_keep_last",
]


def main() -> None:
    spark = get_spark(app_name="bde-spark-bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}

    names = [n for n in HEADLINE if n in QUERIES]
    # include any registered query not in the headline list, so coverage
    # additions are benchmarked automatically
    names += [n for n in sorted(QUERIES) if n not in names]

    # warm up the JVM/session on a trivial action so query #1 isn't
    # charged for session startup
    spark.range(1).count()

    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
        except Exception as exc:  # keep the bench line parseable
            print(f"[bench] {name} FAILED: {exc}", file=sys.stderr)
            dt = float("nan")
        timings[name] = round(dt, 3)
        if dt == dt:
            total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
