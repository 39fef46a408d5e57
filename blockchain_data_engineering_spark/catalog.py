"""Table catalog over the deterministic parquet test tables.

TESTDATA.md: ``region nation customer supplier part orders lineitem
events documents embeddings`` — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}``.

At cluster scale the same loaders point at partitioned parquet/Delta
table roots; nothing here assumes single files. Scans stay lazy so
Catalyst pushes filters and prunes columns into the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always be broadcast in joins against facts.
DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read nanos as long (legacy conf) and
    truncate to microseconds — the same precision DuckDB uses for its
    TIMESTAMP type, so oracle comparisons stay exact.

    The session timezone is pinned to UTC here (runtime-settable, also
    done in session.get_spark) because the verify driver supplies its
    own SparkSession: ``date_trunc``/windowing on TIMESTAMP columns is
    session-TZ-sensitive and the DuckDB oracle runs in UTC.
    """
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # right-size shuffles for the host (the driver's session ships
        # the 200 default — 6× the local core count in overhead at
        # test scale); AQE coalescing makes this safe at any size
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(spark.sparkContext.defaultParallelism),
        )
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition a scan to the session's default
    parallelism — use right after :func:`load_table` when the NEXT
    stage does heavy per-row compute (JSON parse, shingling,
    higher-order functions, pandas UDFs).

    Why: the test parquet files are written as a single row group, so
    Spark's scan yields ONE non-empty partition no matter what
    ``spark.sql.files.maxPartitionBytes`` says — a narrow CPU-bound
    pipeline then runs on one core out of 32. A ~10 MB round-robin
    shuffle buys full-width parallelism for everything downstream.

    At cluster scale the table root has thousands of files/row groups
    and the scan is already wide — drop the call (it would only add a
    shuffle and defeat scan-level filter pushdown for later filters,
    which is also why this is opt-in per query, not done inside
    ``load_table``)."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
