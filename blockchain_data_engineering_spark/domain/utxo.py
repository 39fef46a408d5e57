"""UTxO input resolution as a distributed join (SURVEY §2.1 S7/S8,
§2.3 J5 — replacing the reference's per-transaction REST calls).

The reference resolves each transaction's inputs by calling the
Blockfrost API once per tx inside a row UDF with retries
(src/etl_vol_transfers/main.py:31-50), throughput-capped to 10 tx per
micro-batch — the single dominant bottleneck (BASELINE.md). The yaci
variant batches per tx (src/extra/yaci_utxo_resolver/
yaci_utxo_resolver.py:18-26) but is still an HTTP hop per row group.

An input reference is just a foreign key ``(spent_tx_hash,
spent_output_index)`` into the historical outputs table — so
resolution is a shuffle equi-join, which scales horizontally and costs
zero external calls. At 100 TB both sides are bucketed/partitioned by
``tx_hash`` so the join co-locates without a full shuffle; in
streaming, the outputs side is the continuously-maintained UTxO state
table (stream-static join per micro-batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_inputs(inputs: DataFrame, outputs: DataFrame, how: str = "inner") -> DataFrame:
    """Resolve input references against produced outputs.

    Parameters
    ----------
    inputs:  tx_input rows (tx_hash, spent_tx_hash, spent_output_index)
             from :func:`domain.blocks.tx_inputs_table`.
    outputs: historical tx_output rows (tx_hash, output_index, address,
             value) from :func:`domain.blocks.tx_outputs_table`.
    how:     'inner' drops unresolvable refs (genesis/out-of-window);
             'left' keeps them with null payloads for audit.

    Returns one row per resolved input: the spending tx plus the spent
    output's address and value map.
    """
    out = outputs.select(
        F.col("tx_hash").alias("spent_tx_hash"),
        F.col("output_index").alias("spent_output_index"),
        F.col("address").alias("address"),
        F.col("value").alias("value"),
    )
    return inputs.join(out, ["spent_tx_hash", "spent_output_index"], how)


def input_units(resolved: DataFrame, quantity_type: str = "decimal(38,0)") -> DataFrame:
    """Flatten resolved inputs to (tx_hash, address, unit, quantity) —
    the native A2 kernel (reference sum_ip_vals_for_addr,
    src/etl_vol_transfers/main.py:69-74, which looped in pandas).

    ``quantity_type`` defaults to DECIMAL(38,0) (SURVEY H7): mainnet
    single-token supplies exceed 2^63, so the netflow sums must carry
    128-bit precision — pass ``"long"`` only for corpora whose totals
    provably fit 64 bits (cheaper codegen arithmetic).
    """
    from blockchain_data_engineering_spark.functions.scalar import normalize_unit

    return (
        resolved.select("tx_hash", "address", F.explode("value").alias("policy", "assets"))
        .select(
            "tx_hash",
            "address",
            "policy",
            F.explode("assets").alias("name_hex", "quantity"),
        )
        .select(
            "tx_hash",
            "address",
            normalize_unit(F.concat(F.col("policy"), F.col("name_hex"))).alias("unit"),
            F.col("quantity").cast(quantity_type).alias("quantity"),
        )
    )
