"""Capture .explain("formatted") evidence for the r12 optimizations.

Most gate queries return an eagerly localCheckpoint-ed DataFrame, whose
public plan is a flat ExistingRDD scan — the meaningful plan is the one
materialized during construction. This harness rebuilds, for each
optimization, the BEFORE shape (the pre-r12 code, reproduced inline and
labeled) and the AFTER shape (the current operator code), and explains
both lazily so the Exchange/join/aggregate structure is visible.

Usage:
    python plans/r12/capture_internal_plans.py [name ...]

writes plans/r12/<name>_before.txt and plans/r12/<name>_after.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import functions as F

from blockchain_data_engineering_spark.catalog import load_table
from blockchain_data_engineering_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HERE = os.path.dirname(os.path.abspath(__file__))


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ------------------------------------------------- temporal reachability --


def _tedges(spark):
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    j = orders.join(li, orders.o_orderkey == li.l_orderkey, "inner")
    c = F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    is_ret = F.col("l_returnflag") == "R"
    return j.select(
        F.when(is_ret, s).otherwise(c).alias("src"),
        F.when(is_ret, c).otherwise(s).alias("dst"),
        F.datediff(F.col("l_shipdate"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("t"),
    )


def _temporal_seeds(spark):
    return spark.createDataFrame(
        [("c1", 1000), ("c2", 1000), ("c3", 1000)], "node string, arr long"
    )


def graph_temporal_round(spark, which):
    """The packed build + ONE relaxation round — the shape the loop
    repeats. BEFORE (r11): collect_set/sort_array pack into per-pair
    time arrays (ObjectHashAggregate, no codegen) + an interpreted
    array_min(filter(...)) HOF per joined row, candidate rows shuffled
    into the merged-arrival aggregate at pair grain. AFTER (r12):
    (src,dst,t) triple distinct co-partitioned on dst + a codegen
    ``t >= arr`` filter + groupBy(dst).min(t) pre-aggregate that plans
    NO exchange (the cache is already hash(dst) partitioned) — the
    round's only shuffle is the ≤|V|-row merged-arrival aggregate."""
    edges = _tedges(spark)
    seeds = _temporal_seeds(spark)
    arr = (
        seeds.select("node", F.col("arr").cast("long").alias("arr"))
        .groupBy("node")
        .agg(F.min("arr").alias("arr"))
    )
    if which == "before":
        packed = edges.groupBy("src", "dst").agg(
            F.sort_array(F.collect_set(F.col("t"))).alias("__ts")
        ).persist()
        packed.count()
        first_usable = F.array_min(
            F.filter(F.col("__ts"), lambda t: t >= F.col("__a"))
        )
        cand = (
            packed.join(
                F.broadcast(
                    arr.select(F.col("node").alias("src"), F.col("arr").alias("__a"))
                ),
                "src",
            )
            .select(F.col("dst").alias("node"), first_usable.alias("arr"))
            .where(F.col("arr").isNotNull())
            .select("node", "arr", F.lit(True).alias("__new"))
        )
    else:
        trips = (
            edges.select("src", "dst", "t")
            .repartition("dst")
            .distinct()
            .localCheckpoint(eager=True)
        )
        cand = (
            trips.join(
                F.broadcast(
                    arr.select(F.col("node").alias("src"), F.col("arr").alias("__a"))
                ),
                "src",
            )
            .where(F.col("t") >= F.col("__a"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("t").alias("arr"))
            .select("node", "arr", F.lit(True).alias("__new"))
        )
    return (
        arr.select("node", "arr", F.lit(False).alias("__new"))
        .unionByName(cand)
        .groupBy("node")
        .agg(
            F.min("arr").alias("arr"),
            F.min(F.when(~F.col("__new"), F.col("arr"))).alias("__old"),
        )
    )


# ---------------------------------------------------- packed node ids --


def graph_kcore_ids(spark, which):
    """The edge materialization + ONE peel round. BEFORE (r11): string
    node ids ('c…'/'s…') — the sym distinct and the per-round degree
    aggregate hash/ship strings. AFTER (r12): packed longs (ck·2 /
    sk·2+1) through the whole loop; the Exchange input projections
    carry bigint where they carried string."""
    from blockchain_data_engineering_spark.operators.graph import _hint
    from blockchain_data_engineering_spark.plans.graph_queries import (
        KCORE_K,
        _edges_df,
        _edges_packed_df,
    )

    edges = (
        _edges_df(spark, SF_DIR)
        if which == "before"
        else _edges_packed_df(spark, SF_DIR)
    )
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .where(F.col("a") != F.col("b"))
        .repartition("a")
        .distinct()
        .localCheckpoint(eager=True)
    )
    keep = (
        sym.groupBy("a")
        .agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") >= KCORE_K)
        .select("a")
        .persist()
    )
    nxt = sym.join(_hint(keep, True), "a", "left_semi").join(
        _hint(keep.select(F.col("a").alias("b")), True), "b", "left_semi"
    )
    return nxt.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )


# ------------------------------------------------- narrow verify arrays --


def dedup_verify_arrays(spark, which):
    """The LSH verify stage. BEFORE (r11): per-doc arrays re-packed
    from the exploded shingle set via groupBy(doc_id).collect_list —
    an ObjectHashAggregate + a full Exchange of the shingle relation.
    AFTER (r12): shingle_array builds the same distinct set narrowly
    (sequence→transform→array_distinct, zero shuffle) straight off the
    documents scan; consumers read the arrays as sets."""
    from blockchain_data_engineering_spark.catalog import spread
    from blockchain_data_engineering_spark.operators import dedup as D
    from blockchain_data_engineering_spark.plans.dedup_queries import (
        BAND_SIZE,
        N_HASHES,
        SHINGLE_K,
    )

    docs = spread(load_table(spark, SF_DIR, "documents"))
    if which == "before":
        sh = D.shingle_set(docs, k=SHINGLE_K).persist()
        sig = D.minhash_signatures(sh, N_HASHES).persist()
        arr = sh.groupBy("doc_id").agg(
            F.collect_list("shingle").alias("shingles")
        )
    else:
        sig = D.minhash_signatures(
            D.shingle_set(docs, k=SHINGLE_K), N_HASHES
        ).persist()
        arr = D.shingle_array(docs, k=SHINGLE_K)
    cand = D.lsh_candidate_pairs(D.lsh_bands(sig, N_HASHES, BAND_SIZE))
    return D.jaccard_verify_arrays(cand, arr)


CAPTURES = {
    "graph_temporal_round": graph_temporal_round,
    "graph_kcore_ids": graph_kcore_ids,
    "dedup_verify_arrays": dedup_verify_arrays,
}


def main() -> None:
    names = sys.argv[1:] or sorted(CAPTURES)
    spark = get_spark(app_name="bde-capture-plans-r12")
    spark.range(1).count()
    for name in names:
        for which in ("before", "after"):
            df = CAPTURES[name](spark, which)
            with open(os.path.join(HERE, f"{name}_{which}.txt"), "w") as fh:
                fh.write(_explain(df))
            spark.catalog.clearCache()
            print(f"captured {name}_{which}.txt", flush=True)


if __name__ == "__main__":
    main()
