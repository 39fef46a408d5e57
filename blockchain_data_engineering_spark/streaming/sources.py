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


def write_ndjson_replay(lines: list[str], path: str, n_files: int = 4) -> None:
    """Test helper: split block lines into n files so the file stream
    delivers multiple micro-batches with maxFilesPerTrigger=1."""
    import os

    os.makedirs(path, exist_ok=True)
    chunk = max(1, (len(lines) + n_files - 1) // n_files)
    for i in range(0, len(lines), chunk):
        with open(os.path.join(path, f"part-{i // chunk:04d}.ndjson"), "w") as f:
            f.write("\n".join(lines[i : i + chunk]) + "\n")
