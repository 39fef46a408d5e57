"""Streaming sources (SURVEY §2.1 S1-S2).

The reference's source chain is Ogmios websocket → jsonpickle NDJSON →
TCP socket → ``readStream.format("socket")``
(/root/reference/src/cardano_streamer/main.py:34-52,
src/etl_blockchain/main.py:11-17). A socket source is neither
replayable nor parallel — fine for a tutorial, wrong for production.

Here the canonical source is a *file/NDJSON replay* (replayable,
partitioned, checkpoint-friendly); socket and rate sources are kept
for live-tap parity and load generation. On a real cluster the same
shape reads from Kafka — swap ``format``/options only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINE_SCHEMA = T.StructType([T.StructField("value", T.StringType())])


def ndjson_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Replayable NDJSON block stream: one line per block document,
    exactly the socket payload shape."""
    reader = spark.readStream.schema(LINE_SCHEMA).format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def socket_stream(
    spark: SparkSession, host: str = "localhost", port: int = 9999
) -> DataFrame:
    """Live socket tap — parity with the reference's source
    (src/etl_vol_transfers/main.py:14-20, includeTimestamp)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .option("includeTimestamp", True)
        .load()
    )


def rate_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Synthetic load source for throughput testing."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


# --------------------------------------------------------------- kafka ---
# The production-shaped message-bus source. Spark's Kafka connector
# exposes a fixed record schema; everything downstream of the source
# binds to that schema, so the replayable file twin below lets every
# pipeline run (and be tested) byte-identically without a broker, and
# a prod deployment swaps ONE call.

KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Live Kafka source (requires the spark-sql-kafka connector on the
    classpath — not bundled in this environment; the file replay below
    is schema-identical for everything downstream)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def kafka_file_replay(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Replayable Kafka-record-shaped stream from a parquet directory
    written by :func:`write_kafka_replay` — the same 7-column schema
    ``format("kafka")`` produces, so sinks, parsers, and the
    (topic, partition, offset) idempotence key behave identically."""
    reader = spark.readStream.schema(KAFKA_RECORD_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def decode_kafka_lines(records: DataFrame) -> DataFrame:
    """Kafka records → the socket-payload line shape (`value` string)
    plus the provenance columns a replayed pipeline keys idempotence on
    ((topic, partition, offset) is unique per record)."""
    return records.select(
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
    )


def write_kafka_replay(
    lines: list[str],
    path: str,
    topic: str = "blocks",
    n_partitions: int = 4,
    n_files: int = 4,
) -> None:
    """Test helper: materialize block lines as Kafka-shaped parquet.
    Records round-robin across ``n_partitions`` with per-partition
    monotone offsets — exactly the invariant a real broker provides —
    split into ``n_files`` so ``maxFilesPerTrigger=1`` yields multiple
    micro-batches."""
    import os
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    offsets = [0] * n_partitions
    rows = []
    for i, line in enumerate(lines):
        part = i % n_partitions
        rows.append(
            {
                "key": str(part).encode(),
                "value": line.encode(),
                "topic": topic,
                "partition": part,
                "offset": offsets[part],
                "timestamp": datetime.fromtimestamp(1700000000 + i, tz=timezone.utc),
                "timestampType": 0,
            }
        )
        offsets[part] += 1
    schema = pa.schema(
        [
            ("key", pa.binary()),
            ("value", pa.binary()),
            ("topic", pa.string()),
            ("partition", pa.int32()),
            ("offset", pa.int64()),
            ("timestamp", pa.timestamp("us", tz="UTC")),
            ("timestampType", pa.int32()),
        ]
    )
    chunk = max(1, (len(rows) + n_files - 1) // n_files)
    for fi in range(0, len(rows), chunk):
        batch = rows[fi : fi + chunk]
        table = pa.Table.from_pylist(batch, schema=schema)
        pq.write_table(table, os.path.join(path, f"part-{fi // chunk:04d}.parquet"))


def write_ndjson_replay(lines: list[str], path: str, n_files: int = 4) -> None:
    """Test helper: split block lines into n files so the file stream
    delivers multiple micro-batches with maxFilesPerTrigger=1."""
    import os

    os.makedirs(path, exist_ok=True)
    chunk = max(1, (len(lines) + n_files - 1) // n_files)
    for i in range(0, len(lines), chunk):
        with open(os.path.join(path, f"part-{i // chunk:04d}.ndjson"), "w") as f:
            f.write("\n".join(lines[i : i + chunk]) + "\n")
