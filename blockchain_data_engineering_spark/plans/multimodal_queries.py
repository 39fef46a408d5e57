"""Multimodal-column queries (SURVEY §7.2 M5). The metadata path is
oracle-checked; the pandas-UDF feature/frame paths are genuinely
non-SQL-expressible (Arrow-batched Python) so they register as
rows-only checks — their numeric correctness is unit-tested against
NumPy goldens in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchain_data_engineering_spark.catalog import load_table, spread
from blockchain_data_engineering_spark.operators import multimodal as MM
from blockchain_data_engineering_spark.plans.registry import query


# ---------------------------------------------------------------------------
# Binary payload + typed metadata struct (flattened for the oracle):
# the columnar representation for opaque image/audio/video payloads.
# ---------------------------------------------------------------------------
@query(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id,
           'application/octet-stream'          AS mime,
           octet_length(encode(text))          AS n_bytes,
           md5(text)                           AS checksum
    FROM documents
    """,
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_bin = MM.attach_binary(docs)
    return with_bin.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    )


# ---------------------------------------------------------------------------
# Arrow-batched feature extraction (mapInPandas) — rows-only check; the
# byte-histogram math is unit-tested against NumPy.
# ---------------------------------------------------------------------------
@query("multimodal_feature_extract")
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return MM.extract_features(MM.attach_binary(docs))


# ---------------------------------------------------------------------------
# Frame sampling (mapInPandas) — rows-only check.
# ---------------------------------------------------------------------------
@query("multimodal_frame_sample")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    frames = MM.sample_frames(MM.attach_binary(docs))
    # binary frames don't hash portably across the driver's compare —
    # expose deterministic projections
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame").cast("long").alias("frame_bytes"),
        F.md5(F.base64("frame")).alias("frame_checksum"),
    )
