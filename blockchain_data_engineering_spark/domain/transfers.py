"""Wallet transfer edges — the reference's U4 kernel
(compute_transfers + compute_transfers_by_token,
src/etl_vol_transfers/main.py:150-167) as a per-group cross join.

Reference semantics (replicated exactly): within each (tx, unit),
every net receiver (value > 0) pairs with every net sender
(value < 0); the edge carries the receiver's value and |value| is
implicitly the sender magnitude; value_ada prices the receiver value.

Edge list columns match the Neo4j relationship save
(src/etl_vol_transfers/main.py:190-209): send_addr → rx_addr with
props (tx_hash, unit, value, value_adj).

Scale note (SURVEY §7.4 #2): a token with S senders and R receivers in
one tx emits S×R edges — quadratic in the hot key. AQE skew-join
splits oversized partitions; for pathological airdrop-style txs, cap
or salt upstream (operators.relational.salted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blockchain_data_engineering_spark.domain.volumes import adjusted_value


def transfer_edges(transacted: DataFrame, dim: DataFrame) -> DataFrame:
    """(tx_hash, unit, send_addr, rx_addr, value, value_adj) edges."""
    keys = ["tx_hash", "unit"]
    receivers = transacted.where(F.col("value") > 0).select(
        *keys, F.col("address").alias("rx_addr"), "value"
    )
    senders = transacted.where(F.col("value") < 0).select(
        *keys, F.col("address").alias("send_addr")
    )
    edges = receivers.join(senders, keys, "inner")
    enriched = edges.join(
        F.broadcast(dim.select("unit", "last_price_ada", "decimals")), "unit", "left"
    )
    return enriched.select(
        "tx_hash",
        "unit",
        "send_addr",
        "rx_addr",
        "value",
        adjusted_value(
            F.col("value"), F.col("unit"), F.col("last_price_ada"), F.col("decimals")
        ).alias("value_adj"),
    )
