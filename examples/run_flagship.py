"""End-to-end demo: the reference's full flagship pipeline on this
engine — block stream → UTxO-join resolution → net flows → ADA-priced
volumes + transfer graph → rollups → chart frame → PageRank + wallet
clustering. Everything the reference needed Postgres, Neo4j, Airflow,
Blockfrost, and three notebooks for, as a handful of lazy DataFrame
plans.

    python examples/run_flagship.py [n_blocks]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from blockchain_data_engineering_spark.domain import blocks as B
from blockchain_data_engineering_spark.domain import netflow as N
from blockchain_data_engineering_spark.domain import transfers as TR
from blockchain_data_engineering_spark.domain import utxo as U
from blockchain_data_engineering_spark.domain import volumes as V
from blockchain_data_engineering_spark.domain.schema import DECIMALS_SCHEMA, PRICE_SCHEMA
from blockchain_data_engineering_spark.domain.synthetic import generate_chain
from blockchain_data_engineering_spark.functions.scalar import asset_display_name
from blockchain_data_engineering_spark.operators import graph as G
from blockchain_data_engineering_spark.operators import relational as R
from blockchain_data_engineering_spark.session import get_spark


def main(n_blocks: int = 500) -> None:
    spark = get_spark(app_name="bde-flagship-demo")
    chain = generate_chain(n_blocks=n_blocks, seed=42)
    t0 = time.perf_counter()

    # 1. ingest: NDJSON block lines (socket/Kafka/file all produce this)
    lines = spark.createDataFrame([(line,) for line in chain.lines], ["value"])
    parsed = B.parse_block_lines(lines).persist()

    # 2. normalize + resolve inputs via join (no REST, no throughput cap)
    outputs = B.tx_outputs_table(parsed)
    transacted = N.transacted(
        U.input_units(U.resolve_inputs(B.tx_inputs_table(parsed), outputs)),
        B.output_units(outputs).drop("output_index"),
    ).persist()

    # 3. volumes priced in ADA + rollups
    dim = V.price_dim(
        spark.createDataFrame(chain.prices, PRICE_SCHEMA),
        spark.createDataFrame(chain.decimals, DECIMALS_SCHEMA),
    )
    coords = parsed.select(
        F.explode("transactions.id").alias("hash"), "height", "slot"
    )
    vol = V.volumes(transacted, dim, blocks_coords=coords).persist()
    by_block = V.vol_by_block(vol)
    all_time = V.vol_all_time(vol)

    # 4. the chart frame: top-5 tokens, dense height spine, CMA, share
    top5 = all_time.limit(5).select("unit")
    dense = R.zero_fill_spine(
        by_block.join(F.broadcast(top5), "unit", "left_semi"),
        "unit", "height", "value_adj",
    )
    chart = R.ratio_to_report(
        R.cumulative_moving_average(dense, ["unit"], ["height"], "value_adj"),
        ["height"], "value_adj",
    ).withColumn("token", asset_display_name("unit"))

    # 5. wallet graph analytics (Neo4j GDS replaced by native loops)
    edges = TR.transfer_edges(transacted, dim).select(
        F.col("send_addr").alias("src"), F.col("rx_addr").alias("dst")
    ).distinct()
    ranks = G.pagerank(edges, iterations=10)
    clusters = G.connected_components(edges, iterations=5)

    print(f"blocks={parsed.count()} txs={transacted.select('tx_hash').distinct().count()}")
    print(f"vol rows={vol.count()} by_block={by_block.count()} all_time={all_time.count()}")
    print("top tokens by all-time ADA volume:")
    for r in all_time.limit(5).collect():
        print(f"  {r.unit[:16]}…  {r.value_adj:.6f}")
    print(f"chart frame rows={chart.count()}")
    print("top wallets by PageRank:")
    for r in ranks.orderBy(F.col('score').desc()).limit(3).collect():
        print(f"  {r.node[:24]}…  {r.score:.6f}")
    n_clusters = clusters.select("label").distinct().count()
    print(f"wallet clusters: {n_clusters}")
    print(f"wall: {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
