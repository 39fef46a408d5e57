"""S1 end-to-end: mock chain-sync node → producer (findIntersection /
nextBlock loop, the reference's src/cardano_streamer/main.py:40-52
semantics) → NDJSON landing dir → streaming volumes+transfers pipeline
— and the streamed result must equal the one-shot batch computation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blockchain_data_engineering_spark.domain import blocks as B
from blockchain_data_engineering_spark.domain import netflow as N
from blockchain_data_engineering_spark.domain import utxo as U
from blockchain_data_engineering_spark.domain import volumes as V
from blockchain_data_engineering_spark.domain.schema import (
    DECIMALS_SCHEMA,
    PRICE_SCHEMA,
)
from blockchain_data_engineering_spark.domain.synthetic import generate_chain
from blockchain_data_engineering_spark.streaming import sources as SRC
from blockchain_data_engineering_spark.streaming.chain_sync import (
    ChainSyncProducer,
    MockChainSyncNode,
)
from blockchain_data_engineering_spark.streaming.pipeline import (
    parquet_append_sink,
    run_vol_transfers_pipeline,
)


@pytest.fixture(scope="module")
def chain():
    return generate_chain(n_blocks=24, seed=11)


def test_producer_lands_all_blocks(chain, tmp_path):
    node = MockChainSyncNode(chain.lines).start()
    out = str(tmp_path / "landing")
    n = ChainSyncProducer(node.host, node.port, out, rotate_every=7).run()
    node.close()
    assert n == len(chain.lines)
    import glob

    lines = []
    for f in sorted(glob.glob(out + "/part-*.ndjson")):
        lines += [ln for ln in open(f).read().splitlines() if ln]
    assert lines == chain.lines  # order- and content-exact replay


def test_chain_sync_to_pipeline_matches_batch(spark, chain, tmp_path):
    # live path: node → producer → NDJSON dir
    node = MockChainSyncNode(chain.lines).start()
    landing = str(tmp_path / "landing")
    n = ChainSyncProducer(node.host, node.port, landing, rotate_every=6).run()
    node.close()
    assert n == len(chain.lines)

    prices = spark.createDataFrame(chain.prices, PRICE_SCHEMA)
    decimals = spark.createDataFrame(chain.decimals, DECIMALS_SCHEMA)
    dim = V.price_dim(prices, decimals)

    lines_df = spark.createDataFrame([(ln,) for ln in chain.lines], ["value"])
    history = B.tx_outputs_table(B.parse_block_lines(lines_df))

    vol_path, tr_path = str(tmp_path / "vol"), str(tmp_path / "tr")
    q = run_vol_transfers_pipeline(
        SRC.ndjson_file_stream(spark, landing, max_files_per_trigger=1),
        dim,
        history,
        parquet_append_sink(vol_path),
        parquet_append_sink(tr_path),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    streamed = {
        (r.hash, r.unit): r.value_adj
        for r in spark.read.parquet(vol_path).collect()
    }

    parsed = B.parse_block_lines(lines_df)
    outputs = B.tx_outputs_table(parsed)
    t = N.transacted(
        U.input_units(U.resolve_inputs(B.tx_inputs_table(parsed), outputs)),
        B.output_units(outputs).drop("output_index"),
    )
    coords = parsed.select(
        F.explode("transactions.id").alias("hash"), "height", "slot"
    )
    batch = {
        (r.hash, r.unit): r.value_adj
        for r in V.volumes(t, dim, blocks_coords=coords).collect()
    }
    # identical keys; values equal up to float summation order (the
    # per-(hash, unit) sum of double value_adj legs is partitioning-
    # dependent in the last bits — same bound as test_streaming)
    assert set(streamed) == set(batch)
    for k, v in batch.items():
        assert streamed[k] == pytest.approx(v, rel=1e-12), k
    assert spark.read.parquet(tr_path).count() > 0
