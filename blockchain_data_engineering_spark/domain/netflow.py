"""Per-(tx, address, unit) net value flows — the reference's flagship
U2 kernel (get_transacted_actions, src/etl_vol_transfers/main.py:96-105)
as a pure DataFrame plan.

Reference semantics (replicated exactly):
- consumed = per (address, unit) sum of resolved input quantities
- produced = per (address, unit) sum of output value-map quantities
- net      = produced − consumed via full-outer align, missing side 0
- rows with net == 0 are dropped (e.g. change returning to the sender)

Quantities are integers end-to-end and DECIMAL(38,0) by default
(SURVEY H7): mainnet single-token supplies can exceed 2^63, so the
sums here must carry 128-bit precision. ``transacted`` is
type-preserving — it sums whatever integer type ``quantity`` arrives
as (``input_units`` / ``output_units`` own the cast, and accept
``quantity_type="long"`` for corpora that provably fit 64 bits).
The ``netflow_decimal`` gate query proves the no-overflow path with
per-group totals past 2^63 against a DuckDB HUGEINT oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transacted(input_units: DataFrame, output_units: DataFrame) -> DataFrame:
    """(tx_hash, address, unit, value) with value = produced − consumed ≠ 0.

    Both inputs are flat (tx_hash, address, unit, quantity) frames from
    ``domain.utxo.input_units`` / ``domain.blocks.output_units``. Two
    partial aggregations (map-side combine) then one full-outer join on
    the composite key — both sides arrive pre-partitioned on the same
    keys, so AQE elides the second exchange.
    """
    keys = ["tx_hash", "address", "unit"]
    consumed = input_units.groupBy(*keys).agg(F.sum("quantity").alias("consumed"))
    produced = output_units.groupBy(*keys).agg(F.sum("quantity").alias("produced"))
    return (
        consumed.join(produced, keys, "full_outer")
        .select(
            *keys,
            (
                F.coalesce(F.col("produced"), F.lit(0))
                - F.coalesce(F.col("consumed"), F.lit(0))
            ).alias("value"),
        )
        .where(F.col("value") != 0)
    )
