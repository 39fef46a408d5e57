"""Declared schemas for the block stream and resolved inputs.

Shapes mirror the reference's declared StructTypes
(/root/reference/src/etl_vol_transfers/util/schema.py:3-44 and
src/etl_blockchain/util/schema.py:3-28) and FIXTURES.md §1-2, with two
deliberate upgrades for scale (SURVEY §4.3 H7):

- the dynamic output ``value`` payload is a real
  ``MapType(string, MapType(string, long))`` column after parsing, not
  a re-parsed JSON string;
- raw token quantities are carried as ``decimal(38,0)``-safe longs
  (strings cast at the edge), never floats.
"""

from __future__ import annotations

from pyspark.sql import types as T

# One line of the socket/NDJSON stream: the jsonpickle envelope
# {"py/state": {...}} around a block document.
BLOCK_SCHEMA = T.StructType(
    [
        T.StructField(
            "py/state",
            T.StructType(
                [
                    T.StructField("blocktype", T.StringType()),
                    T.StructField("era", T.StringType()),
                    T.StructField("height", T.LongType()),
                    T.StructField("id", T.StringType()),
                    T.StructField("slot", T.LongType()),
                    T.StructField(
                        "transactions",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("id", T.StringType()),
                                    T.StructField(
                                        "inputs",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("index", T.LongType()),
                                                    T.StructField(
                                                        "transaction",
                                                        T.StructType(
                                                            [T.StructField("id", T.StringType())]
                                                        ),
                                                    ),
                                                ]
                                            )
                                        ),
                                    ),
                                    T.StructField(
                                        "outputs",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("address", T.StringType()),
                                                    T.StructField("datum", T.StringType()),
                                                    # stringified JSON map-of-maps:
                                                    # {"ada":{"lovelace":N},"<policy>":{"<name>":Q}}
                                                    T.StructField("value", T.StringType()),
                                                ]
                                            )
                                        ),
                                    ),
                                    T.StructField("fee", T.StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)

# The dynamic value payload after from_json: policy → (asset name hex →
# qty). Quantities parse as DECIMAL(38,0), not LONG: a valid u64
# on-chain quantity past 2^63 would fail a Long parse and PERMISSIVE
# mode would null the whole map — silently dropping the output from
# every downstream netflow/volume. The H7 decimal contract must start
# AT THE PARSE, not at the first aggregation.
VALUE_MAP_TYPE = T.MapType(
    T.StringType(), T.MapType(T.StringType(), T.DecimalType(38, 0))
)

# Resolved UTxO inputs (reference blockfrost_inputs_schema,
# src/etl_vol_transfers/util/schema.py:30-44)
RESOLVED_INPUT_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField(
            "amount",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("quantity", T.StringType()),
                        T.StructField("unit", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("collateral", T.BooleanType()),
        T.StructField("data_hash", T.StringType()),
        T.StructField("inline_datum", T.StringType()),
        T.StructField("output_index", T.LongType()),
        T.StructField("reference", T.BooleanType()),
        T.StructField("reference_script_hash", T.StringType()),
        T.StructField("tx_hash", T.StringType()),
    ]
)

# Price dimension (reference data/prices/*.json; FIXTURES.md §3)
PRICE_SCHEMA = T.StructType(
    [
        T.StructField("unit", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("last_price_usd", T.DoubleType()),
        T.StructField("last_price_ada", T.DoubleType()),
        T.StructField("last_update", T.StringType()),
        T.StructField("pricing_provider", T.StringType()),
    ]
)

# Decimals dimension (reference data/decimals/decimals.json; FIXTURES.md §4)
DECIMALS_SCHEMA = T.StructType(
    [
        T.StructField("unit", T.StringType()),
        T.StructField("decimals", T.IntegerType()),
    ]
)
