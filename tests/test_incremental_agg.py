"""Incremental aggregate maintenance: bucket-grain refresh
idempotence, empty-bucket deletion, and whole-pipeline convergence of
a materialized rollup through a chain reorg."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from blockchain_data_engineering_spark.domain.synthetic import generate_chain
from blockchain_data_engineering_spark.streaming import sources as SRC
from blockchain_data_engineering_spark.streaming.incremental_agg import (
    BUCKET_COL,
    IncrementalRollup,
    final_rollup,
    partial_rollup,
)


def _mk_rollup(path: str, bucket_slots: int = 10) -> IncrementalRollup:
    return IncrementalRollup(
        path,
        key_cols=["k"],
        slot_col="slot",
        measures={"sum_v": F.col("v")},
        bucket_slots=bucket_slots,
    )


def _landing(spark, rows):
    return spark.createDataFrame(rows, "k STRING, slot LONG, v LONG")


def test_partial_then_final_equals_direct_groupby(spark):
    """Associativity: the two-level (bucket partial → final) rollup is
    exactly the one-level groupBy, for any bucket size."""
    rows = [("a", s, s % 7) for s in range(100)] + [
        ("b", s, 2 * s) for s in range(0, 100, 3)
    ]
    df = _landing(spark, rows)
    direct = {
        (r["k"]): (r["sum_v"], r["n_rows"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    for bucket_slots in (1, 7, 1000):
        part = partial_rollup(
            df, ["k"], "slot", {"sum_v": F.col("v")}, bucket_slots
        )
        got = {
            (r["k"]): (r["sum_v"], r["n_rows"])
            for r in final_rollup(part, ["k"], ["sum_v"]).collect()
        }
        assert got == direct, bucket_slots


def test_refresh_is_idempotent_and_batch_scoped(spark, tmp_path):
    """Replaying a batch's refresh recomputes the same buckets to the
    same values (no double counting), and refreshing one bucket never
    touches the others' partition directories."""
    path = "file://" + str(tmp_path / "rollup")
    ru = _mk_rollup(path, bucket_slots=10)
    landing = _landing(
        spark, [("a", 5, 1), ("a", 15, 2), ("b", 15, 5), ("a", 25, 4)]
    )
    ru.refresh(landing, [0, 1, 2])
    first = sorted(map(tuple, ru.final(spark).collect()))

    # replay the bucket-1 refresh twice — additive stores would double
    ru.refresh(landing, [1])
    ru.refresh(landing, [1])
    assert sorted(map(tuple, ru.final(spark).collect())) == first
    assert first == [("a", 7, 3), ("b", 5, 1)]

    # bucket-scoped: refreshing bucket 1 against a landing table whose
    # OTHER buckets changed must not pick up those changes
    landing2 = _landing(
        spark, [("a", 5, 100), ("a", 15, 2), ("b", 15, 5), ("a", 25, 4)]
    )
    ru.refresh(landing2, [1])
    assert sorted(map(tuple, ru.final(spark).collect())) == first


def test_refresh_deletes_emptied_buckets(spark, tmp_path):
    """A bucket whose every contributing row disappeared (reorg undo)
    must lose its partition directory — dynamic overwrite alone would
    retain the stale partials forever."""
    path = str(tmp_path / "rollup")
    ru = _mk_rollup("file://" + path, bucket_slots=10)
    landing = _landing(
        spark, [("a", 5, 1), ("a", 11, 2), ("a", 15, 8), ("a", 25, 4)]
    )
    ru.refresh(landing, [0, 1, 2])
    assert ru.stored_buckets(spark) == [0, 1, 2]
    assert os.path.isdir(os.path.join(path, f"{BUCKET_COL}=2"))

    # the reorg: slots > 12 undone in the landing table
    survivors = landing.where(F.col("slot") <= 12)
    ru.refresh_from(spark, survivors, lo_slot=13)
    assert ru.stored_buckets(spark) == [0, 1]
    assert not os.path.isdir(os.path.join(path, f"{BUCKET_COL}=2"))
    assert sorted(map(tuple, ru.final(spark).collect())) == [("a", 3, 2)]
    # bucket 1 straddles the cut (slots 10-19, cut at 13): its partial
    # must have been recomputed to the surviving rows only
    assert {
        (r["k"], r[BUCKET_COL], r["sum_v"])
        for r in ru.partials(spark).collect()
    } == {("a", 0, 1), ("a", 1, 2)}


def test_rollup_converges_through_reorg_stream(spark, tmp_path):
    """Whole-pipeline convergence, one level past the landing table: a
    micro-batched reorg stream maintains the landing table via
    rollback_aware_upsert AND a materialized per-height-decade rollup
    via sync_batch; after the stream drains, the rollup equals the
    one-shot batch rollup over the post-reorg chain. The replayed fork
    re-touches the orphaned buckets, so no explicit refresh_from is
    needed when replay covers the undone range."""
    from blockchain_data_engineering_spark.streaming.chain_sync import (
        ChainSyncProducer,
        MockChainSyncNode,
    )
    from blockchain_data_engineering_spark.streaming.rollback import (
        rollback_aware_upsert,
    )

    chain_a = generate_chain(n_blocks=16, seed=21)
    anchor = chain_a.blocks[11]["py/state"]
    fork = generate_chain(
        n_blocks=5,
        seed=97,
        start_height=anchor["height"] + 1,
        start_slot=anchor["slot"] + 7,
    )
    node = MockChainSyncNode(
        chain_a.lines,
        reorg={
            "after": 16,
            "point": {"slot": anchor["slot"], "id": anchor["id"]},
            "blocks": fork.lines,
        },
    ).start()
    land = str(tmp_path / "landing")
    ChainSyncProducer(
        node.host, node.port, land, rotate_every=3, emit_rollbacks=True
    ).run()
    node.close()

    table = str(tmp_path / "blocks_tbl")
    ru = IncrementalRollup(
        "file://" + str(tmp_path / "height_rollup"),
        key_cols=["decade"],
        slot_col="slot",
        measures={"sum_height": F.col("height")},
        bucket_slots=50,
    )

    def sink(batch_df, batch_id):
        def derived(rows):
            landing = batch_df.sparkSession.read.parquet(table)
            ru.sync_batch(
                landing.withColumn("decade", F.col("height") % 10),
                rows,
            )

        rollback_aware_upsert(batch_df, table, ["id"], sink_fn=derived)

    q = (
        SRC.ndjson_file_stream(spark, land, max_files_per_trigger=2)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    from blockchain_data_engineering_spark.domain import blocks as B

    post_reorg = B.parse_block_lines(
        spark.createDataFrame(
            [(l,) for l in chain_a.lines[:12] + fork.lines], ["value"]
        )
    ).withColumn("decade", F.col("height") % 10)
    expected = {
        (r["decade"], r["sum_height"], r["n_rows"])
        for r in post_reorg.groupBy("decade")
        .agg(
            F.sum("height").alias("sum_height"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    got = {tuple(r) for r in ru.final(spark).collect()}
    assert got == expected


def test_refresh_recovers_from_partial_write(spark, tmp_path):
    """Crash recovery by recompute: whatever state a died refresh left
    behind (a missing bucket partition, a bucket overwritten with
    partial data), simply re-running the SAME refresh converges the
    store — recompute-from-landing needs no journal. Simulate the two
    observable crash outcomes directly on the partition directories."""
    import shutil

    path = str(tmp_path / "rollup")
    ru = _mk_rollup("file://" + path, bucket_slots=10)
    landing = _landing(
        spark, [("a", 5, 1), ("a", 15, 2), ("b", 15, 5), ("a", 25, 4)]
    )
    ru.refresh(landing, [0, 1, 2])
    healthy = sorted(map(tuple, ru.final(spark).collect()))

    # crash outcome 1: a bucket partition vanished mid-swap
    shutil.rmtree(os.path.join(path, f"{BUCKET_COL}=1"))
    ru.refresh(landing, [0, 1, 2])
    assert sorted(map(tuple, ru.final(spark).collect())) == healthy

    # crash outcome 2: a bucket holds stale/partial rows (simulate by
    # refreshing it from a corrupted landing view, as a half-applied
    # batch would) — the next honest refresh must overwrite it whole
    corrupted = _landing(spark, [("a", 15, 999), ("zzz", 16, 1)])
    ru.refresh(corrupted, [1])
    assert sorted(map(tuple, ru.final(spark).collect())) != healthy
    ru.refresh(landing, [1])
    assert sorted(map(tuple, ru.final(spark).collect())) == healthy


def test_refresh_from_fixes_buckets_replay_never_touches(spark, tmp_path):
    """The staleness case sync_batch alone CANNOT fix: a reorg deletes
    landing rows in bucket B, but the replacement batch's rows all land
    in a different bucket — sync_batch refreshes only the new rows'
    buckets, leaving B's partials summing deleted rows forever. The
    on_rollback → refresh_from(lo_slot) path must converge it
    (streaming/incremental_agg.refresh_from; the reorg example wires
    exactly this)."""
    from blockchain_data_engineering_spark.sources.io import (
        delete_parquet_where,
        upsert_parquet,
    )
    from blockchain_data_engineering_spark.streaming.incremental_agg import (
        IncrementalRollup,
    )

    landing = "file://" + str(tmp_path / "landing")
    roll = IncrementalRollup(
        "file://" + str(tmp_path / "roll"),
        key_cols=["grp"],
        slot_col="slot",
        measures={"total": F.col("v")},
        bucket_slots=10,  # slots 0-9 → bucket 0, 30-39 → bucket 3
    )

    def batch(rows):
        df = spark.createDataFrame(rows, "id string, slot long, grp string, v long")
        upsert_parquet(df, landing, ["id"])
        roll.sync_batch(spark.read.parquet(landing), df)

    batch([("a", 5, "g", 1), ("b", 35, "g", 100), ("c", 38, "h", 7)])
    assert {
        tuple(r) for r in roll.final(spark).collect()
    } == {("g", 101, 2), ("h", 7, 1)}

    # reorg to slot 20: b and c (bucket 3) are orphaned...
    deleted = delete_parquet_where(spark, landing, F.col("slot") > 20)
    assert deleted == 2
    # ...and the replacement batch lands ONLY in bucket 0
    batch([("d", 6, "g", 2)])
    # sync_batch refreshed bucket 0 — bucket 3's partials are STALE
    stale = {tuple(r) for r in roll.final(spark).collect()}
    assert stale == {("g", 103, 3), ("h", 7, 1)}, stale

    # the hook path: refresh everything at/after the rollback point
    roll.refresh_from(spark, spark.read.parquet(landing), 20)
    assert {
        tuple(r) for r in roll.final(spark).collect()
    } == {("g", 3, 2)}
