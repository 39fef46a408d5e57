"""Checkpointed multi-sink streaming pipeline (SURVEY §2.9 T1-T4,
fixing hazards H1/H4).

The reference's foreachBatch body runs TWO separate sink actions off
one unpersisted lineage (volumes → Postgres, transfers → Neo4j;
src/etl_vol_transfers/main.py:211-222) — every action replays the
whole plan including uuid() keys and per-row REST calls. Here each
micro-batch is persisted ONCE, every sink writes from the same
materialized rows, ids are content hashes, and the query runs under a
checkpoint — restart-safe, idempotent, exactly-once into
transactional/MERGE sinks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from blockchain_data_engineering_spark.domain import blocks as B
from blockchain_data_engineering_spark.domain import netflow as N
from blockchain_data_engineering_spark.domain import transfers as TR
from blockchain_data_engineering_spark.domain import utxo as U
from blockchain_data_engineering_spark.domain import volumes as V

Sink = Callable[[DataFrame, int], Any]


def parquet_append_sink(path: str) -> Sink:
    """Append micro-batch output to parquet. With deterministic
    content-hash keys a replayed batch writes identical rows, so a
    downstream MERGE (or read-side dropDuplicates on the key) gives
    exactly-once semantics without transactional storage."""

    def write(df: DataFrame, batch_id: int) -> None:
        df.withColumn("_batch_id", F.lit(batch_id)).write.mode("append").parquet(path)

    return write


def run_vol_transfers_pipeline(
    block_lines: DataFrame,
    dim: DataFrame,
    utxo_outputs: DataFrame | Callable[[], DataFrame],
    vol_sink: Sink,
    transfer_sink: Sink,
    checkpoint_dir: str,
    available_now: bool = True,
    utxo_store_append: Sink | None = None,
) -> StreamingQuery:
    """The flagship reference pipeline (E1) as a checkpointed stream.

    block_lines:  streaming NDJSON lines.
    dim:          price×decimals dimension (static or re-read per batch
                  — H5 fix).
    utxo_outputs: historical outputs table for input resolution
                  (stream-static join replacing per-row REST, J5).
                  MUST be unique per (tx_hash, output_index) — the
                  bucketed upsert store guarantees that. Pass a
                  ZERO-ARG CALLABLE returning a fresh DataFrame to
                  re-read the store each micro-batch (a plain
                  DataFrame snapshots its file listing at creation, so
                  files appended later are invisible) — required for
                  live tailing where ``utxo_store_append`` grows the
                  store; a plain DataFrame is fine for bounded replays
                  over a complete history.
    utxo_store_append: optional sink receiving each batch's outputs
                  BEFORE resolution — wire it to the same table
                  ``utxo_outputs`` reads (parquet append + callable
                  re-read, or upsert_parquet_bucketed) to maintain
                  UTxO state across batches; without it an output
                  created in batch N but spent in batch N+1 is
                  unresolvable.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Persist the parsed batch FIRST: everything downstream (outputs,
        # inputs, coords, both sinks) reads it, and without the persist
        # each action re-scans the micro-batch source — the observe()
        # counter showed 4 scans per batch before this line (the same
        # recompute-per-action shape as reference hazard H1).
        parsed = B.parse_block_lines(batch_df).persist()
        try:
            outputs_b = B.tx_outputs_table(parsed)
            inputs_b = B.tx_inputs_table(parsed)
            if utxo_store_append is not None:
                # land this batch's outputs in the UTxO store FIRST so
                # cross-batch spends resolve (deterministic content
                # keys make replays idempotent under a MERGE store)
                utxo_store_append(outputs_b, batch_id)
            # Two-tier resolution: intra-batch spends against the
            # (tiny) batch outputs first, the remainder against
            # history. This replaces union+dropDuplicates over the
            # FULL history — which re-shuffled the whole archive every
            # micro-batch — with one batch-sized anti join; the
            # history join itself co-locates when the store is
            # bucketed by tx_hash (J5 layout). The anti join also
            # makes double-resolution impossible when the store
            # already contains this batch (replay).
            keys = ["spent_tx_hash", "spent_output_index"]
            res_batch = U.resolve_inputs(inputs_b, outputs_b)
            remaining = inputs_b.join(
                outputs_b.select(
                    F.col("tx_hash").alias("spent_tx_hash"),
                    F.col("output_index").alias("spent_output_index"),
                ),
                keys,
                "left_anti",
            )
            history = utxo_outputs() if callable(utxo_outputs) else utxo_outputs
            resolved = res_batch.unionByName(
                U.resolve_inputs(remaining, history)
            )
            transacted = N.transacted(
                U.input_units(resolved),
                B.output_units(outputs_b).drop("output_index"),
            )
            # ONE materialization, N sinks (H1 fix)
            transacted.persist()
            try:
                coords = parsed.select(
                    F.explode("transactions.id").alias("hash"), "height", "slot"
                )
                vol_sink(
                    V.volumes(transacted, dim, blocks_coords=coords), batch_id
                )
                transfer_sink(TR.transfer_edges(transacted, dim), batch_id)
            finally:
                transacted.unpersist()
        finally:
            parsed.unpersist()

    # A8/observe: per-micro-batch row counts surface in
    # StreamingQueryProgress.observedMetrics["source"] — the native
    # replacement for the reference's df.count() diagnostic
    # (src/etl_blockchain/main.py:32), costing one accumulator instead
    # of a second job.
    observed = block_lines.observe(
        "source", F.count(F.lit(1)).alias("n_lines")
    )
    writer = (
        observed.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
