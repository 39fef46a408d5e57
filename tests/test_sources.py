"""Batch source/sink tests: NDJSON block reader, reference-shaped dim
loaders, and the idempotent key-based parquet upsert (SURVEY §2.1
S4/S11)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from blockchain_data_engineering_spark.domain.synthetic import generate_chain
from blockchain_data_engineering_spark.sources import (
    load_decimals_dim,
    load_prices_dim,
    read_ndjson_blocks,
    upsert_parquet,
)


def test_read_ndjson_blocks(spark, tmp_path):
    chain = generate_chain(n_blocks=10, seed=3)
    p = tmp_path / "blocks.ndjson"
    p.write_text("\n".join(chain.lines) + "\n")
    blocks = read_ndjson_blocks(spark, str(p))
    assert blocks.count() == 10
    assert {"height", "id", "slot", "transactions"} <= set(blocks.columns)


def test_load_dims_reference_shape(spark, tmp_path):
    # the reference's prices envelope: {date, assets: [...]}
    chain = generate_chain(n_blocks=2, seed=3)
    prices_file = tmp_path / "prices.json"
    assets = [
        {"id": p["unit"], "symbol": p["symbol"],
         "last_price_usd": p["last_price_usd"],
         "last_price_ada": p["last_price_ada"],
         "last_update": p["last_update"],
         "pricing_provider": p["pricing_provider"]}
        for p in chain.prices
    ]
    prices_file.write_text(json.dumps({"date": "2025-02-06", "assets": assets}))
    decimals_file = tmp_path / "decimals.json"
    decimals_file.write_text(json.dumps(chain.decimals))

    prices = load_prices_dim(spark, str(prices_file))
    assert prices.count() == len(assets)
    assert {"unit", "last_price_ada"} <= set(prices.columns)
    decs = load_decimals_dim(spark, str(decimals_file))
    assert decs.count() == len(chain.decimals)


def test_upsert_parquet_on_conflict_update(spark, tmp_path):
    path = str(tmp_path / "vol_by_block")
    v1 = spark.createDataFrame(
        [("tokA", 1, 10.0), ("tokA", 2, 20.0), ("tokB", 1, 5.0)],
        "unit STRING, height LONG, value_adj DOUBLE",
    )
    upsert_parquet(v1, path, ["unit", "height"])
    # second batch: update (tokA, 2), insert (tokB, 3)
    v2 = spark.createDataFrame(
        [("tokA", 2, 99.0), ("tokB", 3, 7.0)],
        "unit STRING, height LONG, value_adj DOUBLE",
    )
    upsert_parquet(v2, path, ["unit", "height"])
    got = {
        (r.unit, r.height): r.value_adj
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("tokA", 1): 10.0,
        ("tokA", 2): 99.0,  # updated, not duplicated
        ("tokB", 1): 5.0,
        ("tokB", 3): 7.0,
    }
    # idempotence: reapplying the same batch changes nothing
    upsert_parquet(v2, path, ["unit", "height"])
    again = {
        (r.unit, r.height): r.value_adj
        for r in spark.read.parquet(path).collect()
    }
    assert again == got
