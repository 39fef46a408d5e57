"""Remaining SURVEY §2 inventory coverage: any_value collapse (A1),
the applyInPandas escape hatch (A10/U-replacement), slot→timestamp
(F12), and deterministic-vs-uuid surrogate keys (P3/F1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchain_data_engineering_spark.catalog import load_table
from blockchain_data_engineering_spark.functions.scalar import SLOT_EPOCH_OFFSET
from blockchain_data_engineering_spark.operators.pandas_escape import (
    grouped_demean_scaled,
)
from blockchain_data_engineering_spark.plans.parity import quanta, quanta_sql
from blockchain_data_engineering_spark.plans.registry import query


# ---------------------------------------------------------------------------
# A1: groupBy + any_value — the reference collapses exploded tx rows
# back to one row per hash with any_value(outputs)
# (src/etl_vol_transfers/main.py:215-216). any_value is only
# deterministic when the value is constant per group — exactly the
# reference's case (outputs is functionally dependent on hash), and
# o_custkey↔o_orderkey here.
# ---------------------------------------------------------------------------
@query(
    "agg_any_value",
    oracle="""
    SELECT l_orderkey,
           any_value(o_custkey) AS custkey,
           count(*) AS n_items
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY l_orderkey
    """,
)
def agg_any_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .groupBy("l_orderkey")
        .agg(
            F.any_value(F.col("o_custkey")).alias("custkey"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# A10/U2-shape: the applyInPandas escape hatch, kept oracle-verifiable
# by choosing an integer-exact kernel (value·n − Σvalue per group ==
# the window expression the oracle uses).
# ---------------------------------------------------------------------------
@query(
    "applyinpandas_demean",
    oracle=f"""
    WITH q AS (
      SELECT user_id, {quanta_sql('value', 4)} AS v FROM events
    )
    SELECT user_id, v,
           CAST(v * (count(*) OVER (PARTITION BY user_id))
                - (sum(v) OVER (PARTITION BY user_id)) AS BIGINT)
             AS demeaned_scaled
    FROM q
    """,
)
def applyinpandas_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", quanta(F.col("value"), 4).alias("v")
    )
    return grouped_demean_scaled(ev, ["user_id"], "v")


# ---------------------------------------------------------------------------
# F12: Cardano slot → wall-clock timestamp
# (unix_time = slot + 1591566291; reference app.properties:14). The
# l_orderkey stands in for a slot number.
# ---------------------------------------------------------------------------
@query(
    "scalar_slot_to_timestamp",
    oracle=f"""
    SELECT DISTINCT o_orderkey AS slot,
           make_timestamp((o_orderkey + {SLOT_EPOCH_OFFSET}) * 1000000) AS block_time
    FROM orders
    """,
)
def scalar_slot_to_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("slot"),
        F.timestamp_seconds(F.col("o_orderkey") + F.lit(SLOT_EPOCH_OFFSET)).alias(
            "block_time"
        ),
    ).distinct()
