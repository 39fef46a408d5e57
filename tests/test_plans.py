"""Physical-plan quality regression tests: predicate pushdown, column
pruning, and join-strategy selection must survive refactors — at 100 TB
these ARE the difference between a scan of gigabytes and a scan of the
whole lake."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from blockchain_data_engineering_spark.plans import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        QUERIES[name](spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    pushed = re.findall(r"PushedFilters: (\[[^\n]*)", plan)
    assert any("LessThanOrEqual(l_shipdate" in p for p in pushed), plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dim_enrich_volumes")
    scans = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    li_scan = next(s for s in scans if "l_partkey" in s)
    # the 2-ish column projection must NOT read the whole lineitem table
    assert "l_shipdate" not in li_scan and "l_orderkey" not in li_scan, li_scan


def test_dim_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dim_enrich_volumes")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_semi_join_is_broadcast_semi(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_semi_join")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_global_topk_avoids_full_sort(spark, sf_dir):
    # orderBy().limit() must plan as TakeOrderedAndProject (per-partition
    # heap), not a global Sort + Exchange
    from blockchain_data_engineering_spark.catalog import load_table
    from blockchain_data_engineering_spark.operators.relational import topk

    li = load_table(spark, sf_dir, "lineitem")
    buf = io.StringIO()
    with redirect_stdout(buf):
        topk(li, "l_extendedprice", 10).explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_no_python_udfs_on_relational_paths(spark, sf_dir):
    # every relational/domain/graph/text query must stay JVM-side; the
    # only sanctioned Python is the explicit pandas escape hatch and
    # the multimodal codec seam
    allowed_python = {"applyinpandas_demean", "multimodal_feature_extract",
                      "multimodal_frame_sample"}
    for name in sorted(QUERIES):
        if name in allowed_python:
            continue
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            f"{name} fell off the JVM path"
        )
